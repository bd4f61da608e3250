package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>` /
  * `array<double>`).
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query set,
  * score every corpus row against every query in one narrow pass (no
  * shuffle of the corpus), then one shuffle to rank per query. The LSH and
  * IVF variants are the scale path: bucket the corpus once, probe only
  * matching buckets.
  */
object Similarity {

  /** Dot product of two equal-length double arrays — zip_with + aggregate,
    * fully codegen'd. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Deterministic pseudo-random hyperplane component: a unit-free gaussian
    * stand-in derived from xxhash64(probe, plane, dim) mapped to (-0.5, 0.5).
    * Sign-of-projection LSH only needs symmetric zero-mean components. */
  private def planeComponent(probe: Column, plane: Column, dim: Column): Column =
    pmod(xxhash64(probe, plane, dim), lit(1000000L)).cast("double") / 1000000.0 - 0.5

  /** `probes` bucket keys for a vector: each key packs the signs of `planes`
    * pseudo-random projections. Deterministic — the same expression buckets
    * corpus and queries identically with zero coordination. */
  def hyperplaneKeys(vec: Column, planes: Int, probes: Int): Column =
    transform(sequence(lit(0), lit(probes - 1)), probe => {
      val signBits = transform(sequence(lit(0), lit(planes - 1)), plane => {
        val proj = aggregate(zip_with(vec,
          sequence(lit(0), size(vec) - 1).cast("array<double>"),
          (x, i) => x * planeComponent(probe, plane, i)), lit(0.0d), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      })
      concat(probe.cast("string"), lit("#"), array_join(signBits, ""))
    })

  /** Exact top-k cosine neighbors for every query vector.
    *
    * Plan: broadcast(queries) crossJoin corpus (narrow over the corpus — the
    * big side never shuffles for scoring) -> per-(query,corpus) cosine ->
    * one shuffle keyed by query id to rank -> k rows per query. Ties break
    * on neighbor id for determinism.
    *
    * @return (query_id, neighbor_id, cosine, rank) — self-matches excluded
    *         when the id columns collide in value.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).cast("array<double>").as("qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).cast("array<double>").as("cv"))
    val scored = c.crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-style approximate top-k: corpus rows are assigned to their nearest
    * of `nCentroids` centroid vectors (a deterministic sample of the corpus
    * itself, broadcast); each query probes the `nProbe` nearest centroids
    * and ranks only within those partitions. At 100 TB this turns a full
    * scan per query into a scan of nProbe/nCentroids of the data.
    *
    * Exact when nProbe >= nCentroids (probes everything). */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).cast("array<double>").as("cv"))

    // Deterministic centroid sample: the nCentroids corpus rows with the
    // smallest xxhash64(id) — stable, data-independent of layout.
    val centroids = c.withColumn("h", xxhash64(col("neighbor_id")))
      .orderBy("h").limit(nCentroids)
      .select(col("neighbor_id").as("centroid_id"), col("cv").as("centroid"))
    val cb = broadcast(centroids)

    def nearestCentroids(vec: Column, n: Int): DataFrame => DataFrame = { df =>
      val w = Window.partitionBy("__vecid").orderBy(col("__cdist").desc, col("centroid_id").asc)
      df.crossJoin(cb)
        .withColumn("__cdist", cosine(vec, col("centroid")))
        .withColumn("__crank", row_number().over(w))
        .where(col("__crank") <= n)
        .drop("centroid", "__cdist", "__crank")
    }

    val assigned = nearestCentroids(col("cv"), 1)(c.withColumn("__vecid", col("neighbor_id")))
      .drop("__vecid")
    val q = queries.select(col(queryId).as("query_id"),
      col(queryVec).cast("array<double>").as("qv"))
    val probed = nearestCentroids(col("qv"), nProbe)(q.withColumn("__vecid", col("query_id")))
      .drop("__vecid")

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    probed.join(assigned, Seq("centroid_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cosine"))
      .groupBy("query_id", "neighbor_id").agg(max("cosine").as("cosine"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
