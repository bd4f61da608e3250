package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end C4/RefinedWeb-style curation: the pipeline a real
  * training-data job runs, composed from the library's own stages in
  * their canonical order —
  *
  *   fix encoding (mojibake repair + NFKC) → HTML→text extraction →
  *   language-ID filter → heuristic quality filter → within-doc repeated-
  *   line removal → exact dedup (content hash, keep-lowest-id) → minhash
  *   near-dup removal → n-gram decontamination (optional) → token-budget
  *   sampling (optional)
  *
  * — and emits, next to the curated corpus, a per-stage survival stats
  * frame `(ord, stage, rows_out, tokens_out)`: the artifact a data team
  * actually reviews (where did the corpus shrink, and by how much).
  *
  * Scale shape: the three column stages (encoding, HTML, lines) are fused
  * zero-shuffle kernels; the filters are stateless projections; the only
  * wide operations are the ones dedup inherently needs (content-hash
  * shuffle, banded-minhash candidate join, gram-key join). Each stage
  * output is localCheckpoint-ed once — it is read exactly twice (its
  * stats aggregate + the next stage), so recomputing the whole prefix
  * chain per stage would be strictly worse; intermediate checkpoints are
  * unpersisted as soon as the next stage materializes. Stats cost one
  * count+token-sum aggregate per stage over that stage's output.
  */
object Pipeline {

  final case class Config(
      keepLangs: Set[String] = Set("en"),
      minQuality: Double = 0.7,
      minTokens: Int = 5,
      nearDupThreshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 64,
      shingleWidth: Int = 3,
      decontaminateNgram: Int = 13,
      budgetTokens: Long = 0L,
      seed: Long = 42L)

  /** Curated corpus + the per-stage stats frame. */
  final case class Result(docs: DataFrame, stats: DataFrame)

  def curate(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: Option[DataFrame] = None,
      cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    require(cfg.minTokens >= 0 && cfg.budgetTokens >= 0L, s"bad config $cfg")
    val stats = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Double)]()

    var cur = docs.where(col(textCol).isNotNull).localCheckpoint()
    def measure(stage: String, wallSec: Double): Unit = {
      val r = cur.agg(count(lit(1)),
        coalesce(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")), lit(0L)))
        .collect()(0)
      stats += ((stats.size, stage, r.getLong(0), r.getLong(1), wallSec))
    }
    def step(stage: String)(f: DataFrame => DataFrame): Unit = {
      val prev = cur
      val t0 = System.nanoTime()
      cur = f(prev).localCheckpoint() // eager: the stage materializes here
      measure(stage, (System.nanoTime() - t0) / 1e9)
      // prev's blocks free IMMEDIATELY once cur is materialized — holding
      // them to the end would stack every stage's full corpus in executor
      // storage at once (~9x the working set at the benched sizes).
      org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(prev)
        .foreach(_.unpersist(blocking = false))
    }
    measure("input", 0.0)

    step("fix_encoding")(df => df.withColumn(textCol,
      graft.functions.NormalizeKernel.nfkc(
        graft.functions.MojibakeKernel.fixMojibake(col(textCol)))))
    step("html_extract")(df => df
      .withColumn(textCol, graft.functions.HtmlKernel.htmlToText(col(textCol)))
      .where(trim(col(textCol)) =!= ""))
    step("langid_filter")(df => df.where(
      TextAnalysis.languageId(col(textCol)).isin(cfg.keepLangs.toSeq: _*)))
    step("quality_filter")(df => df.where(
      TextAnalysis.qualityScore(col(textCol)) >= cfg.minQuality &&
        TextAnalysis.tokenCount(col(textCol)) >= cfg.minTokens))
    step("line_dedup")(df => df
      .withColumn(textCol, TextAnalysis.removeRepeatedLines(col(textCol)))
      .where(trim(col(textCol)) =!= ""))
    // Content-hash exact dedup with the deterministic keep-lowest-id rule
    // (plain dropDuplicates keeps an arbitrary row; pipelines must be
    // replayable).
    step("exact_dedup")(df => Dedup.exactKeepFirst(
      df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp"))
    step("near_dedup")(df => Dedup.dropNearDupsMinHash(df, idCol, textCol,
      cfg.nearDupThreshold, cfg.numHashes, cfg.bands, cfg.shingleWidth))
    evalDocs.foreach { ev =>
      step("decontaminate")(df => Decontamination.decontaminate(df, ev,
        idCol, textCol, cfg.decontaminateNgram))
    }
    if (cfg.budgetTokens > 0L)
      step("token_budget")(df => Sampling.sampleTokenBudget(
        df.withColumn("__tok", TextAnalysis.tokenCount(col(textCol)).cast("long")),
        Seq(idCol), "__tok", cfg.budgetTokens, cfg.seed).drop("__tok"))

    import spark.implicits._
    Result(cur,
      stats.toSeq.toDF("ord", "stage", "rows_out", "tokens_out", "wall_sec"))
  }

  // ------------------------------------------------------ image pipeline

  final case class ImageConfig(
      maxDistance: Int = 10,
      pieces: Int = 4,
      maxCorpusImages: Long = 50000000L,
      targetW: Int = 64,
      targetH: Int = 64,
      resizeFormat: String = "png",
      batchSize: Int = 64)

  /** The multimodal sibling of [[curate]]: image-corpus curation as one
    * entry point —
    *
    *   decode + pHash (undecodable payloads dropped) → byte-exact dedup
    *   (content hash, keep-lowest-id) → perceptual near-dup removal
    *   (pHash Hamming pigeonhole — re-encodes/resizes of the same image
    *   collapse to the lowest id) → bilinear resize to the training shape
    *
    * with a per-stage `(ord, stage, rows_out, bytes_out, wall_sec)`
    * survival stats frame (bytes: payload volume surviving — the number
    * a storage budget watches; the resize row reports the RESIZED
    * volume). The decode/hash/resize stages ride the batched
    * `mapPartitions` codec shape (zero shuffle); near-dup removal is the
    * fused multi-probe MIH expression ([[Dedup.dropNearDupsPHash]] —
    * zero shuffle, exact, complete for any radius) up to
    * `maxCorpusImages` distinct hashes, and AUTO-SWITCHES to the
    * unbounded banded pigeonhole join past it (r14 — same keep-lowest-id
    * survivors, shuffle-bound instead of driver-bound, so a
    * billion-image corpus runs the same pipeline), so the only
    * always-wide operation is the content-hash dedup shuffle. Output
    * docs carry `phash` and the resized payload column. */
  def curateImages(docs: DataFrame, idCol: String, binCol: String,
      cfg: ImageConfig = ImageConfig()): Result = {
    val spark = docs.sparkSession
    val stats = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Double)]()
    var cur = docs.where(col(binCol).isNotNull).localCheckpoint()
    // bytes_out sums the stage's OWN payload column: the resize stage
    // reports the RESIZED volume (the number a storage budget watches),
    // not the source payload it still carries alongside (r14 — ADVICE).
    def measure(stage: String, wallSec: Double, bytesCol: String): Unit = {
      val r = cur.agg(count(lit(1)),
        coalesce(sum(length(col(bytesCol)).cast("long")), lit(0L))).collect()(0)
      stats += ((stats.size, stage, r.getLong(0), r.getLong(1), wallSec))
    }
    def step(stage: String, bytesCol: String = binCol)(f: DataFrame => DataFrame): Unit = {
      val prev = cur
      val t0 = System.nanoTime()
      cur = f(prev).localCheckpoint()
      measure(stage, (System.nanoTime() - t0) / 1e9, bytesCol)
      org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(prev)
        .foreach(_.unpersist(blocking = false))
    }
    measure("input", 0.0, binCol)
    step("decode_phash")(df =>
      Multimodal.pHashImages(df, binCol, cfg.batchSize)
        .where(col("phash").isNotNull))
    step("exact_dedup")(df => Dedup.exactKeepFirst(
      df.withColumn("__fp", xxhash64(col(binCol))), Seq("__fp"), idCol)
      .drop("__fp"))
    step("near_dedup")(df => Dedup.dropNearDupsPHash(df, idCol, "phash",
      cfg.maxDistance, cfg.pieces, cfg.maxCorpusImages))
    step("resize", bytesCol = "resized")(df =>
      Multimodal.resizeImages(df, binCol, cfg.targetW, cfg.targetH,
        cfg.resizeFormat, cfg.batchSize)
        .where(col("resized").isNotNull))
    import spark.implicits._
    Result(cur,
      stats.toSeq.toDF("ord", "stage", "rows_out", "bytes_out", "wall_sec"))
  }
}
