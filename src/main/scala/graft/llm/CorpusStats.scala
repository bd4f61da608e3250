package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level set statistics from bottom-k (KMV) sketches — "how much
  * do these two corpora overlap?" answered without ever joining them.
  *
  * The sketch of a corpus is the k smallest DISTINCT xxhash64 shingle
  * fingerprints (the dedup family's standing hash regime). Sketches
  * merge by union+trim, so the Jaccard estimate for any corpus pair
  * costs two sketch builds that never meet in a shuffle: bottom-k of
  * A ∪ B equals bottom-k of (sketch(A) ∪ sketch(B)), and the fraction
  * of that merged sketch present in both sides estimates J with
  * standard error ~sqrt(J(1-J)/k) (~0.016 at k=1024, J=0.5).
  *
  * Scale shape: one narrow pass per corpus — each partition keeps its k
  * smallest distinct hashes in a bounded tree (`mapPartitions` is
  * justified: bounded per-partition state, like the packing operator),
  * the driver merges nPartitions·k longs. No shuffle of the gram
  * universe, which is exactly what the exact computation would do and
  * what a 100 TB corpus cannot afford. [[exactJaccard]] is the guarded
  * verification harness, not the scale path.
  */
object CorpusStats {

  /** Per-document distinct gram fingerprints, exploded. */
  private def gramFrame(df: DataFrame, textCol: String, width: Int): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.where(col(textCol).isNotNull)
      .select(explode(graft.functions.ShingleSketch.sketch(toks, width, 0)
        .getField("sh")).as("gram"))
  }

  /** The k smallest distinct gram hashes of the corpus. One narrow job:
    * per-partition bounded dedup + driver merge of ≤ partitions·k longs. */
  def bottomKSketch(df: DataFrame, textCol: String, width: Int = 3,
      k: Int = 1024): Array[Long] = {
    require(k >= 16, s"sketch size k must be >= 16, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val partial = gramFrame(df, textCol, width).as[Long].mapPartitions { it =>
      val heap = new java.util.TreeSet[java.lang.Long]()
      it.foreach { g =>
        if (heap.size < k) heap.add(g)
        else if (g < heap.last()) { heap.add(g); if (heap.size > k) heap.pollLast() }
      }
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.map(_.longValue())
    }.collect()
    partial.distinct.sorted.take(k)
  }

  /** KMV Jaccard estimate from two bottom-k sketches built with the same
    * k: |merged ∩ A ∩ B| / |merged|, merged = bottom-k of the sketch
    * union. Exact when both corpora carry ≤ k distinct grams (the
    * sketches ARE the sets). */
  def jaccardFromSketches(a: Array[Long], b: Array[Long], k: Int): Double = {
    require(a.length <= k && b.length <= k, "sketches exceed their declared k")
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet; val sb = b.toSet
    val merged = (sa ++ sb).toArray.sorted.take(k)
    val inBoth = merged.count(g => sa.contains(g) && sb.contains(g))
    inBoth.toDouble / merged.length
  }

  /** One-call overlap estimate between two corpora. */
  def overlapEstimate(a: DataFrame, b: DataFrame, textCol: String,
      width: Int = 3, k: Int = 1024): Double =
    jaccardFromSketches(bottomKSketch(a, textCol, width, k),
      bottomKSketch(b, textCol, width, k), k)

  /** Exact Jaccard between the two corpora's distinct gram sets — the
    * verification harness for the estimator (full distinct + join of the
    * gram universes; `maxGrams` refuses corpus-scale inputs the same way
    * the exact-cosine harness does). */
  def exactJaccard(a: DataFrame, b: DataFrame, textCol: String,
      width: Int = 3, maxGrams: Long = 50000000L): (Long, Long, Long) = {
    val ga = gramFrame(a, textCol, width).distinct()
    val gb = gramFrame(b, textCol, width).distinct()
    val na = ga.count(); val nb = gb.count()
    require(na + nb <= maxGrams,
      s"exactJaccard over ${na + nb} distinct grams exceeds maxGrams=$maxGrams " +
        "— this is the verification harness; use overlapEstimate at scale")
    val inter = ga.join(gb, Seq("gram"), "left_semi").count()
    (na, nb, inter)
  }
}
