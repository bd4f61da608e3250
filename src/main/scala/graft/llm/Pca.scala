package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step in front of LSH / clustering / ANN indexing (project 768-d crawl
  * embeddings to 64-d before banding, or 64-d to 8-d for cheap coarse
  * quantizers).
  *
  * Scale design: fitting is ONE narrow pass — a `treeAggregate` of the
  * count / sum-vector / Gram-matrix triple (O(d²) state at every tree
  * level, no shuffle of the vectors, the [[CorpusStats.heavyHitters]]
  * shape), after which the d×d covariance eigenproblem is driver-trivial
  * (cyclic Jacobi, d ≤ a few hundred by assumption — for larger d use
  * random projection instead). Projection of the full corpus is a fused
  * zero-shuffle kernel pass ([[graft.functions.VectorKernels.pcaProject]])
  * with the mean and component matrix riding as a codegen reference
  * object. Measured (`bench_ops_scale.json`, local[32], r12): fit 2.5s
  * over 10M 64-dim vectors (~4M vecs/s, one pass); projection 18.8M
  * vecs/s marginal.
  *
  * Determinism: Gram sums are float-summation-order sensitive across
  * partitionings (~1e-14 relative), so eigenvectors are stable but not
  * bit-pinned — gates pin tolerance bands and exact structural facts
  * (orthonormality, Pythagoras), the Lloyd/logreg precedent. Component
  * signs are canonicalized (largest-|coordinate| positive, earliest index
  * on ties) so reruns agree to float noise rather than ±flips.
  */
object Pca {

  /** Fitted model: population mean, top-k components (row-major k×d,
    * orthonormal rows, variance-descending), ALL d eigenvalues
    * (descending — so `eigenvalues.sum` is the covariance trace and
    * `eigenvalues.take(k).sum / eigenvalues.sum` the explained-variance
    * fraction). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
    def explainedVariance: Double = {
      val t = eigenvalues.sum
      if (t <= 0) 0.0 else eigenvalues.take(k).sum / t
    }
  }

  /** One-pass moment accumulator: n, Σx, Σxxᵀ (full d×d, row-major). */
  private final class Moments(val d: Int) extends Serializable {
    var n: Long = 0L
    val s: Array[Double] = new Array[Double](d)
    val g: Array[Double] = new Array[Double](d * d)
    def add(x: Array[Double]): this.type = {
      require(x.length == d, s"vector of dim ${x.length}, expected $d")
      n += 1
      var i = 0
      while (i < d) {
        s(i) += x(i)
        val row = i * d
        var j = 0
        while (j < d) { g(row + j) += x(i) * x(j); j += 1 }
        i += 1
      }
      this
    }
    def merge(o: Moments): this.type = {
      n += o.n
      var i = 0
      while (i < d) { s(i) += o.s(i); i += 1 }
      i = 0
      while (i < d * d) { g(i) += o.g(i); i += 1 }
      this
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (row-major
    * d×d). Returns (eigenvalues, eigenvectors as rows), descending, with
    * canonical signs. Classic textbook algorithm (Golub & Van Loan §8.5);
    * d is small by contract so O(d³) per sweep is nothing. */
  private[graft] def jacobiEigen(a0: Array[Double], d: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val a = a0.clone()
    val v = Array.tabulate(d * d)(i => if (i / d == i % d) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2 * a(i * d + j) * a(i * d + j); j += 1 }
        i += 1
      }
      s
    }
    val fro = {
      var s = 0.0; var i = 0
      while (i < d * d) { s += a(i) * a(i); i += 1 }
      s
    }
    var sweep = 0
    while (off() > 1e-22 * math.max(fro, 1e-300) && sweep < 100) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 1e-300) {
            val app = a(p * d + p); val aqq = a(q * d + q)
            val theta = (aqq - app) / (2 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i * d + p); val aiq = a(i * d + q)
              a(i * d + p) = c * aip - s * aiq
              a(i * d + q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p * d + i); val aqi = a(q * d + i)
              a(p * d + i) = c * api - s * aqi
              a(q * d + i) = s * api + c * aqi
              val vpi = v(p * d + i); val vqi = v(q * d + i)
              v(p * d + i) = c * vpi - s * vqi
              v(q * d + i) = s * vpi + c * vqi
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i * d + i))
    val evals = order.map(i => a(i * d + i)).toArray
    val evecs = order.map { i =>
      val row = v.slice(i * d, i * d + d)
      // Canonical sign: largest-|coordinate| positive, earliest on ties.
      var best = 0
      var j = 1
      while (j < d) {
        if (math.abs(row(j)) > math.abs(row(best))) best = j
        j += 1
      }
      if (row(best) < 0) row.map(-_) else row
    }.toArray
    (evals, evecs)
  }

  /** Fit a k-component PCA on the vector column — one treeAggregate pass
    * over the corpus plus a driver-side d×d eigenproblem. `maxTrainRows`
    * bounds the pass with a deterministic sample (the ANN-training
    * contract); 0 = use every row. */
  def fit(df: DataFrame, vecCol: String, k: Int,
      maxTrainRows: Long = 0L): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val base0 = df.where(col(vecCol).isNotNull)
    val base =
      if (maxTrainRows <= 0) base0
      else Sampling.sampleN(base0, Seq(vecCol), maxTrainRows.toInt, seed = 7L)
    val vecs = base.select(col(vecCol).cast("array<double>")).as[Array[Double]]
    val probe = vecs.take(1)
    require(probe.nonEmpty,
      s"PCA needs at least one non-null '$vecCol' vector, got an empty input")
    val d = probe(0).length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val m = vecs.rdd.treeAggregate(new Moments(d))(
      (acc, x) => acc.add(x), (a, b) => a.merge(b), depth = 2)
    require(m.n >= 2, s"PCA needs at least 2 vectors, got ${m.n}")
    val mean = m.s.map(_ / m.n)
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        cov(i * d + j) = m.g(i * d + j) / m.n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov, d)
    Model(mean, evecs.take(k), evals)
  }

  /** Project the vector column onto the model's components — one fused
    * zero-shuffle pass, `array<double>` of length k. */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "pc"): DataFrame =
    df.withColumn(outCol,
      graft.functions.VectorKernels.pcaProject(col(vecCol),
        model.mean, model.components))

  /** Projection as a column (for composition inside selects). */
  def project(vec: Column, model: Model): Column =
    graft.functions.VectorKernels.pcaProject(vec, model.mean, model.components)
}
