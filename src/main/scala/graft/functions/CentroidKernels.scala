package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Fused nearest-centroid assignment for IVF-style vector search.
  *
  * The IVF index needs every corpus row tagged with its nearest centroid.
  * The relational spelling — crossJoin against a broadcast centroid frame,
  * then `row_number` over a window keyed per source row — fans the corpus
  * out nCentroids× and pushes every fanned copy through an Exchange+Sort
  * just to take an argmax. At 100 TB that window shuffle IS the job. But
  * the centroid set is tiny and driver-known (a deterministic sample, or
  * the output of a couple of Lloyd iterations), so the assignment is really
  * a per-row pure function: embed the centroid matrix in a custom
  * expression and compute the argmax (or the top-n for query probing) in
  * one compiled pass — zero shuffle, zero fan-out, corpus stays narrow.
  *
  * Scoring contract (matches the relational form it replaces):
  * cosine(v, c) = dot/(|v|*|c|), 0.0 when either norm is 0. Ties and NaNs
  * resolve to the LOWEST centroid index (strict `>` replacement while
  * scanning in index order; NaN never beats a real score). A null vector,
  * a vector with null elements, or a dimension mismatch with the centroids
  * yields null (callers treat such rows as unassignable, exactly like the
  * pair-kernel null contract in [[VectorKernels]]).
  */
object CentroidKernels {

  /** Immutable centroid matrix with precomputed norms; shipped to executors
    * once per plan as a codegen reference object. */
  final class CentroidSet(val mat: Array[Array[Double]]) extends Serializable {
    val norms: Array[Double] = mat.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }

    /** Indices of the `n` nearest centroids by cosine, best first; ties to
      * the lower index. Null on null-element / ragged input; empty array
      * when the set itself is empty. */
    def topIndices(vec: ArrayData, n: Int): ArrayData = {
      val dim = vec.numElements()
      val k = math.min(n, mat.length)
      if (k <= 0) return new GenericArrayData(Array.empty[Any])
      var i = 0
      var vn = 0.0
      while (i < dim) {
        if (vec.isNullAt(i)) return null
        val x = vec.getDouble(i); vn += x * x
        i += 1
      }
      val vnorm = math.sqrt(vn)
      // Insertion-select into parallel arrays: k is tiny (1..nProbe).
      val bestScore = Array.fill(k)(Double.NegativeInfinity)
      val bestIdx = Array.fill(k)(-1)
      var c = 0
      while (c < mat.length) {
        val cv = mat(c)
        if (cv.length != dim) return null
        var s = 0.0; var j = 0
        while (j < dim) { s += vec.getDouble(j) * cv(j); j += 1 }
        val denom = vnorm * norms(c)
        val score = if (denom == 0.0) 0.0 else s / denom
        // Strict > keeps the first (lowest-index) among equals, and NaN
        // (NaN > x is false) never displaces a real score.
        var pos = k
        while (pos > 0 && score > bestScore(pos - 1)) pos -= 1
        if (pos < k) {
          var m = k - 1
          while (m > pos) { bestScore(m) = bestScore(m - 1); bestIdx(m) = bestIdx(m - 1); m -= 1 }
          bestScore(pos) = score; bestIdx(pos) = c
        }
        c += 1
      }
      // An all-NaN score row (any NaN element NaNs every dot product) fills
      // no slot: NaN never displaces -Infinity under strict >. Leftover -1
      // sentinels would flow into the probe equi-join and spuriously pair
      // NaN corpus rows with NaN queries on centroid_idx = -1 — such rows
      // are unassignable, so honor the kernel's null contract instead.
      var m2 = 0
      while (m2 < k) { if (bestIdx(m2) < 0) return null; m2 += 1 }
      new GenericArrayData(bestIdx)
    }

    /** Maximum cosine against the matrix (java.lang.Double), with the same
      * null/NaN contract as [[topIndices]]: null on null-element or ragged
      * input, an all-NaN row yields null, zero norms score 0.0. Empty
      * matrix → null (no reference to compare against). */
    def maxCosine(vec: ArrayData): Any = {
      if (mat.isEmpty) return null
      val dim = vec.numElements()
      var i = 0
      var vn = 0.0
      while (i < dim) {
        if (vec.isNullAt(i)) return null
        val x = vec.getDouble(i); vn += x * x
        i += 1
      }
      val vnorm = math.sqrt(vn)
      var best = Double.NegativeInfinity
      var c = 0
      while (c < mat.length) {
        val cv = mat(c)
        if (cv.length != dim) return null
        var s = 0.0; var j = 0
        while (j < dim) { s += vec.getDouble(j) * cv(j); j += 1 }
        val denom = vnorm * norms(c)
        val score = if (denom == 0.0) 0.0 else s / denom
        if (score > best) best = score
        c += 1
      }
      if (best == Double.NegativeInfinity) null else java.lang.Double.valueOf(best)
    }

    /** Index of the nearest centroid by SQUARED EUCLIDEAN distance — the
      * Lloyd/k-means objective ([[graft.llm.Clustering]]), where the
      * cosine argmax is wrong for unnormalized vectors (any two parallel
      * vectors tie at cosine 1 regardless of magnitude). Computed as
      * argmin(|c|² − 2·v·c): |v|² is constant per row, and the centroid
      * norms are precomputed. Ties and NaNs resolve to the LOWEST index
      * (strict `<` replacement; NaN never beats a real distance); null on
      * null-element / ragged input; null when the set is empty. */
    def nearestL2(vec: ArrayData): Any = {
      if (mat.isEmpty) return null
      val dim = vec.numElements()
      var i = 0
      while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
      var best = Double.PositiveInfinity
      var bestIdx = -1
      var c = 0
      while (c < mat.length) {
        val cv = mat(c)
        if (cv.length != dim) return null
        var s = 0.0; var j = 0
        while (j < dim) { s += vec.getDouble(j) * cv(j); j += 1 }
        val d = norms(c) * norms(c) - 2.0 * s
        if (d < best) { best = d; bestIdx = c }
        c += 1
      }
      if (bestIdx < 0) null else java.lang.Integer.valueOf(bestIdx)
    }
  }

  /** `topIndices` as a Catalyst expression. Holds the matrix as Seq-of-Seq
    * so case-class equality (plan canonicalization, codegen cache keys)
    * compares values, not array references. */
  case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], n: Int)
      extends UnaryExpression {
    override def prettyName: String = "graft_nearest_centroids"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"centroids[${centroids.length}]", n)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val set = new CentroidSet(centroids.map(_.toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      set.topIndices(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidSet", set,
        "graft.functions.CentroidKernels.CentroidSet")
      nullSafeCodeGen(ctx, ev, arr => s"""
        ${ev.value} = $ref.topIndices($arr, $n);
        ${ev.isNull} = (${ev.value} == null);""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: array of the `n` nearest centroid indices (best first) for
    * an `array<double>` vector column. */
  def nearestIndices(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftSql.column(NearestCentroids(
      GraftSql.expression(vec.cast("array<double>")), centroids.map(_.toSeq).toSeq, n))

  /** The single nearest centroid index (argmax cosine). */
  def nearestIndex(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(nearestIndices(vec, centroids, 1), 1)

  /** `nearestL2` as a Catalyst expression — the squared-Euclidean argmin
    * twin of [[NearestCentroids]] for k-means clustering. */
  case class NearestCentroidL2(child: Expression, centroids: Seq[Seq[Double]])
      extends UnaryExpression {
    override def prettyName: String = "graft_nearest_centroid_l2"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"centroids[${centroids.length}]")
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    @transient private lazy val set = new CentroidSet(centroids.map(_.toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      set.nearestL2(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidSetL2", set,
        "graft.functions.CentroidKernels.CentroidSet")
      val tmp = ctx.freshName("l2Idx")
      nullSafeCodeGen(ctx, ev, arr => s"""
        java.lang.Integer $tmp = (java.lang.Integer) $ref.nearestL2($arr);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.intValue(); }""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The single nearest centroid index by squared Euclidean distance. */
  def nearestIndexL2(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftSql.column(NearestCentroidL2(
      GraftSql.expression(vec.cast("array<double>")), centroids.map(_.toSeq).toSeq))

  // ---------------------------------------------------------- max cosine

  /** `maxCosine` as a Catalyst expression: the maximum cosine of the row
    * vector against the embedded matrix, in one compiled pass — the
    * membership-probe twin of the argmax (semantic decontamination asks
    * "is anything in the reference set closer than θ", not "which one").
    * Same scoring and null contract as [[NearestCentroids]] (zero norms
    * score 0.0, NaN never wins, null/ragged input → null). */
  case class MaxCosineAgainst(child: Expression, matrix: Seq[Seq[Double]])
      extends UnaryExpression {
    override def prettyName: String = "graft_max_cosine"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"matrix[${matrix.length}]")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    @transient private lazy val set = new CentroidSet(matrix.map(_.toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      set.maxCosine(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidSet", set,
        "graft.functions.CentroidKernels.CentroidSet")
      nullSafeCodeGen(ctx, ev, arr => s"""
        Object r = $ref.maxCosine($arr);
        ${ev.isNull} = (r == null);
        if (!${ev.isNull}) ${ev.value} = ((Double) r).doubleValue();""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: max cosine of an `array<double>` vector column against a
    * driver-known matrix. */
  def maxCosine(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftSql.column(MaxCosineAgainst(
      GraftSql.expression(vec.cast("array<double>")), matrix.map(_.toSeq).toSeq))
}
