package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering of an embedding column as a first-class curation
  * operator — topic discovery, diversity-balanced selection, and
  * per-cluster quotas over a training corpus (the cluster-then-sample
  * recipe of density/diversity-based data curation; the same Lloyd core
  * the ANN family trains with, here exposed with assignments, stats, and
  * a balanced-sampling composition).
  *
  * Scale design (all pieces inherited from the ANN family's contracts):
  *  - seeding is one TakeOrdered job ([[Similarity.sampleCentroids]]);
  *  - Lloyd refinement trains on a bounded deterministic sample
  *    ([[Similarity.refineCentroids]] `maxTrainRows`), so training wall
  *    is flat in corpus size;
  *  - assignment is the fused driver-literal argmin kernel
  *    ([[graft.functions.CentroidKernels.nearestIndex]]) — a narrow
  *    zero-shuffle projection over the full corpus;
  *  - per-cluster stats are one map-side-combined aggregate whose shuffle
  *    carries ≤ k rows per task;
  *  - balanced selection reuses [[Sampling.sampleNPerGroup]] (one window
  *    exchange, streaming rank).
  *
  * Determinism: seeding and sampling are hash-keyed; assignment of points
  * essentially equidistant between centroids can flip only with
  * floating-point summation order of training, which the bounded
  * materialized sample keeps fixed — reruns and repartitions of the SAME
  * session produce identical assignments.
  */
object Clustering {

  /** Farthest-first traversal seeding (Gonzalez 1985, the deterministic
    * cousin of k-means++): the first seed is the smallest-hash vector;
    * each next seed is the point FARTHEST from its nearest already-chosen
    * seed (ties on id). One TakeOrdered job per seed — k driver jobs, each
    * over the bounded training sample, never the corpus. For separated
    * clusters this provably places one seed per cluster, where plain
    * hash-sampling can drop two seeds into one blob and strand Lloyd in
    * a split-cluster local minimum. */
  def farthestFirstSeeds(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).where(col("v").isNotNull)
    val first = Similarity.sampleCentroids(pts, "id", "v", 1)
    require(first.nonEmpty, "empty corpus: no vectors to seed centroids from")
    val seeds = scala.collection.mutable.ArrayBuffer(first(0))
    while (seeds.length < k) {
      val mat = seeds.toArray
      val dist = squaredDistToCentroid(col("v"),
        graft.functions.CentroidKernels.nearestIndexL2(col("v"), mat), mat)
      val far = pts.orderBy(dist.desc, col("id").asc).limit(1)
        .select("v").collect()
      if (far.isEmpty) return seeds.toArray // fewer distinct points than k
      seeds += far(0).getSeq[Double](0).toArray
    }
    seeds.toArray
  }

  /** Train k centroids and assign every row: returns the input plus
    * `outCol` (int cluster id) and the trained centroid matrix.
    * Seeding is farthest-first over the bounded training sample;
    * assignment and Lloyd both use SQUARED EUCLIDEAN distance (the
    * k-means objective — the ANN family's cosine argmax would tie all
    * parallel vectors regardless of magnitude). */
  /** @param seedCentroids start from these centroids instead of running
    *        the k-1 farthest-first seeding jobs — the standard k-means
    *        seed-injection lever (r18): a caller training twice at
    *        different iteration counts over the same corpus (baseline vs
    *        refined) reuses the deterministic seeds instead of re-deriving
    *        them. Passing the matrix a previous `kMeans(..., iterations =
    *        0)` returned yields byte-identical seeding. */
  def kMeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int = 5, maxTrainRows: Long = 1000000L,
      outCol: String = "cluster_id",
      seedCentroids: Option[Array[Array[Double]]] = None)
      : (DataFrame, Array[Array[Double]]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(seedCentroids.forall(_.length == k),
      s"seedCentroids must hold exactly k=$k centroids, got " +
        s"${seedCentroids.map(_.length)}")
    // Rectangularity (r19, ADVICE r18): ragged seeds passed the count-only
    // check and surfaced later as kernel misbehavior / out-of-bounds writes
    // in the explode fallback. Dim-vs-data mismatch is caught by the dense
    // aggregate's own fixed-width require.
    seedCentroids.filter(_.nonEmpty).foreach { m =>
      val d0 = m(0).length
      require(m.forall(_.length == d0),
        s"seedCentroids must be rectangular (every centroid the same " +
          s"dimension); got lengths ${m.map(_.length).distinct.mkString(",")}")
    }
    val train = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as(vecCol))
    // Seed over the same bounded sample refinement trains on — the k
    // seeding jobs must not scan a 100 TB corpus either.
    def seedFrame = Similarity.boundedTrainFrame(train, vecCol, maxTrainRows)
      .getOrElse(train)
    val seed = seedCentroids.getOrElse(
      farthestFirstSeeds(seedFrame, "id", vecCol, k))
    val mat = refineL2(train, vecCol, seed, iterations, maxTrainRows)
    (assign(df, vecCol, mat, outCol), mat)
  }

  /** L2 Lloyd refinement — the [[Similarity.refineCentroids]] plan shape
    * (fused zero-shuffle assignment, posexplode + map-side-combined
    * per-(cell, dim) mean whose shuffle carries ≤ k·dim partial sums per
    * task, empty cells keep their centroid, bounded materialized training
    * sample) with the squared-Euclidean argmin kernel in place of the
    * cosine one. */
  private def refineL2(corpus: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], iterations: Int,
      maxTrainRows: Long): Array[Array[Double]] = {
    var mat = centroids
    val sampled =
      if (iterations > 0 && mat.nonEmpty)
        Similarity.boundedTrainFrame(corpus, vecCol, maxTrainRows)
      else None
    sampled.foreach(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val train = sampled.getOrElse(corpus)
      // Dense one-pass Lloyd step (r18) — the [[Similarity.refineCentroids]]
      // optimization verbatim: scatter-add sums + counts per cell in ONE
      // fused aggregate instead of posexploding every vector into dim rows
      // and shuffling (cell, pos) means each iteration. Same means modulo
      // floating-point association; explode plan kept past the dense bound.
      val nCells = mat.length
      val dim = if (nCells > 0) mat(0).length else 0
      val dense = graft.functions.GradAggKernels.enabled &&
      nCells > 0 && dim > 0 && mat.forall(_.length == dim) &&
        nCells.toLong * (dim + 1) <= graft.functions.GradAggKernels.MaxDenseSlots
      for (_ <- 0 until iterations if mat.nonEmpty) {
        val cell = graft.functions.CentroidKernels.nearestIndexL2(col(vecCol), mat)
        if (dense) {
          val sums = train
            .agg(graft.functions.GradAggKernels.kMeansSums(cell,
              col(vecCol).cast("array<double>"), nCells, dim).as("s"))
            .collect()(0).getSeq[Double](0)
          mat = mat.indices.map { c =>
            val base = c * (dim + 1)
            val count = sums(base + dim)
            if (count > 0.0) Array.tabulate(dim)(d => sums(base + d) / count)
            else mat(c)
          }.toArray
        } else {
          val means = train
            .select(cell.as("__cell"), posexplode(col(vecCol).cast("array<double>")))
            .groupBy("__cell", "pos").agg(avg("col").as("m"))
            .collect()
          val next = mat.map(_.clone())
          means.foreach { r =>
            if (!r.isNullAt(0)) {
              val c = r.getInt(0); val p = r.getInt(1)
              // Bounds guard (r19, ADVICE r18): wrong-dim rows must not
              // write out of bounds (the Similarity fallback's guard).
              if (c >= 0 && c < next.length && p < next(c).length)
                next(c)(p) = r.getDouble(2)
            }
          }
          mat = next
        }
      }
      mat
    } finally sampled.foreach(_.unpersist(blocking = false))
  }

  /** Assign rows to their nearest centroid (squared L2) — fused kernel,
    * zero shuffle, composes with any frame carrying the vector column
    * (the encode-new-batches path: cluster once, assign forever). */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]],
      outCol: String = "cluster_id"): DataFrame =
    df.withColumn(outCol, graft.functions.CentroidKernels.nearestIndexL2(
      col(vecCol), centroids))

  /** Squared L2 distance from `vec` to its assigned centroid, resolved
    * through a centroid-matrix literal — built-in higher-order functions,
    * no join. */
  def squaredDistToCentroid(vec: Column, clusterId: Column,
      centroids: Array[Array[Double]]): Column = {
    val matLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
    val cen = element_at(matLit, clusterId + 1)
    aggregate(zip_with(vec.cast("array<double>"), cen, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Per-cluster size and inertia (sum of squared distances to the
    * assigned centroid) — ONE aggregate, shuffle carries ≤ k rows per
    * task. The total inertia is the Lloyd objective; falling inertia
    * across `iterations` is the training sanity signal. */
  def clusterStats(assigned: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      clusterCol: String = "cluster_id"): DataFrame =
    assigned.groupBy(clusterCol).agg(
      count(lit(1)).as("n"),
      sum(squaredDistToCentroid(col(vecCol), col(clusterCol), centroids))
        .as("inertia"))

  /** Cluster-balanced selection: up to `perCluster` rows from every
    * cluster, deterministic ([[Sampling.sampleNPerGroup]] — one window
    * exchange). The diversity-quota step of cluster-based curation. */
  def balancedSample(assigned: DataFrame, keyCols: Seq[String],
      perCluster: Int, clusterCol: String = "cluster_id"): DataFrame =
    Sampling.sampleNPerGroup(assigned, keyCols, Seq(clusterCol), perCluster)
}
