package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval — the sparse/lexical side of RAG next to the
  * [[Similarity]] ANN family (hybrid retrieval joins both result sets).
  * Okapi BM25 with the Lucene-standard smoothed idf:
  * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `score(q, d) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))`
  * over the DISTINCT terms of the query (qtf = 1 — the common search
  * engine behavior).
  *
  * Scale design — build once, query many:
  *  - [[buildIndex]] is the corpus-wide work: tokenize (shared word
  *    rule), ONE shuffle keyed on (doc, term) for tf, one doc-keyed
  *    aggregate for lengths, one term-keyed aggregate for df. The three
  *    frames ARE the inverted index — persist them as parquet
  *    (bucketed by term for the postings) and every later query batch
  *    skips the corpus entirely.
  *  - [[scores]] touches only the postings of the query's terms: the
  *    (tiny) query-term frame broadcast-joins into df and tf, so the
  *    shuffled data is the candidate postings, never the corpus. Scoring
  *    is one (query, doc) aggregate.
  *  - [[topK]] ranks with a per-query window over the scored candidates
  *    (WindowGroupLimit keeps the rank map-side), ties broken by doc id.
  *
  * Measured (`bench_ops_scale.json`, local[32], r12, disk-contended
  * window with 18.8s steal): build+write of the full index for 10M
  * 32-token docs (~320M tf rows) 218s — dominated by the one tf shuffle
  * + parquet write; a 100-query batch against the persisted index 28s
  * (one index-sized tf scan + postings join, the corpus untouched).
  */
object Retrieval {

  /** The inverted index: `tf(doc_id, term, tf)`, `dl(doc_id, dl)`,
    * `df(term, df)` plus the two corpus scalars. Plain frames —
    * persisting/bucketing them is ordinary parquet I/O. */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame, df: DataFrame,
      nDocs: Long, avgdl: Double)

  private def terms(textCol: String) =
    explode(split(lower(trim(col(textCol))), "\\s+")).as("term")

  /** Ad-hoc in-memory index build. `dl` and `df` derive from the tf
    * table (`dl = Σ tf` per doc — identical by definition), but the
    * frames stay LAZY: every downstream action re-tokenizes the corpus
    * through the lineage. Fine for one-shot use; for build-once /
    * query-many, [[buildAndWriteIndex]] is the production path — it pays
    * exactly one corpus pass and every later query batch reads the
    * (index-sized) parquet instead. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val tf = tfOf(docs, idCol, textCol)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val s = dl.agg(count(lit(1)), avg("dl")).collect()(0)
    val n = s.getLong(0)
    Bm25Index(tf, dl, df, n, if (n == 0) 0.0 else s.getDouble(1))
  }

  private def tfOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), terms(textCol))
      .where(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Build-once persisted index: the tf table is written as parquet in
    * the ONE corpus-wide pass, dl/df derive from the written parquet
    * (index-sized jobs, the corpus is never touched again), and the
    * corpus scalars land in a `meta.json` sidecar through the path's own
    * filesystem (the IVF+PQ-index lifecycle). Returns the loaded
    * index. */
  def buildAndWriteIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Bm25Index = {
    val spark = docs.sparkSession
    tfOf(docs, idCol, textCol).write.mode("overwrite").parquet(s"$path/tf")
    val tfP = spark.read.parquet(s"$path/tf")
    tfP.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$path/dl")
    tfP.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/df")
    val dlP = spark.read.parquet(s"$path/dl")
    val s = dlP.agg(count(lit(1)), avg("dl")).collect()(0)
    val n = s.getLong(0)
    val avgdl = if (n == 0) 0.0 else s.getDouble(1)
    graft.io.FsText.write(spark, s"$path/meta.json",
      s"""{"n_docs": $n, "avgdl": $avgdl}""")
    Bm25Index(tfP, dlP, spark.read.parquet(s"$path/df"), n, avgdl)
  }

  /** Reload a persisted index (no corpus access, no stats job). */
  def loadIndex(spark: SparkSession, path: String): Bm25Index = {
    val meta = graft.io.FsText.read(spark, s"$path/meta.json")
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no BM25 index meta at $path/meta.json"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(meta)
    Bm25Index(spark.read.parquet(s"$path/tf"),
      spark.read.parquet(s"$path/dl"), spark.read.parquet(s"$path/df"),
      root.get("n_docs").asLong, root.get("avgdl").asDouble)
  }

  /** BM25 scores for every (query, candidate) pair — candidates are the
    * docs sharing at least one term with the query. */
  def scores(index: Bm25Index, queries: DataFrame, qIdCol: String,
      qTextCol: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(index.nDocs > 0, "BM25 index is empty")
    val qterms = queries.where(col(qTextCol).isNotNull)
      .select(col(qIdCol).as("q_id"), terms(qTextCol))
      .where(col("term") =!= "").distinct()
    val idf = log(lit(1.0) +
      (lit(index.nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val qt = broadcast(qterms).join(index.df, Seq("term"))
      .select(col("q_id"), col("term"), idf.as("idf"))
    val norm = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / index.avgdl))
    broadcast(qt).join(index.tf, Seq("term"))
      .join(index.dl, Seq("doc_id"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("idf") * norm).as("score"))
  }

  /** Top-k docs per query, (score desc, doc_id asc)-ranked. */
  def topK(index: Bm25Index, queries: DataFrame, qIdCol: String,
      qTextCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scores(index, queries, qIdCol, qTextCol, k1, b)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** One-call convenience for ad-hoc use (index built inline). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topK(buildIndex(docs, idCol, textCol), queries, qIdCol, qTextCol, k, k1, b)

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: each input ranking
    * contributes `1/(rrfK + rank)` per (query, doc), missing docs
    * contribute nothing, and the fused ranking orders by the summed
    * score (doc-id tie-break). Rank-arithmetic only — score scales of
    * the inputs (BM25 vs cosine) never need calibrating, which is the
    * method's whole point. Each input must carry `(q_id, doc_id, rank)`
    * with rank ≥ 1 (the [[topK]] / ANN top-k output shape). One union +
    * one (query, doc) aggregate + one per-query window — no join of the
    * rankings against each other. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1 && rrfK >= 0, s"bad k=$k / rrfK=$rrfK")
    val contrib = rankings.map(_.select(col("q_id"), col("doc_id"),
      (lit(1.0) / (lit(rrfK.toDouble) + col("rank"))).as("c")))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    contrib.groupBy("q_id", "doc_id").agg(sum("c").as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
