package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Dense-buffer training aggregates (r18 optimization round).
  *
  * Both the logistic-regression trainer ([[graft.llm.QualityClassifier]])
  * and the Lloyd centroid refinement ([[graft.llm.Similarity]]) previously
  * computed their per-iteration statistics by EXPLODING each row into one
  * row per (feature | dimension) and hash-aggregating the fan-out — a
  * rows × width intermediate and a two-stage shuffle per gradient step,
  * paid `iterations` times per training call (guide §2.3 "aggregate before
  * you shuffle" / §2.4 "remove shuffles outright"). Because the reduced
  * statistic is a FIXED-SIZE dense vector known at plan time (dim + 2
  * gradient slots; nCells × (dim+1) centroid sums), the whole iteration
  * folds into ONE [[TypedImperativeAggregate]]: each task scatter-adds
  * into a local dense buffer, partials merge pairwise, and the driver
  * collects a single array row — no explode, no per-key shuffle, one
  * stage fewer per iteration.
  *
  * Scale guard: a dense buffer is only the right plan while it is small
  * (buffers ride the aggregation path per task and the final merge is
  * single-reducer). Callers fall back to the explode + hash-aggregate
  * shape past [[GradAggKernels.MaxDenseSlots]] slots — the board/bench
  * configurations (dim ≤ 2^18, nCells ≤ 4096) sit far below it, while a
  * 65536-cell × 1024-dim refinement correctly keeps the shuffle plan.
  *
  * Determinism: identical to the hash-aggregate path's contract — sums
  * commute only up to floating-point association, and both shapes fix the
  * order only per partition. The trainers' documented stability story
  * ("weights stable to ~1e-15, gates pin tolerance bands") is unchanged.
  */
object GradAggKernels {

  /** Max dense slots (doubles) before callers should keep the
    * explode + hash-aggregate plan: 2^22 doubles = 32 MB per task buffer. */
  val MaxDenseSlots: Long = 1L << 22

  private def doublesToBytes(a: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    bb.asDoubleBuffer().put(a)
    bb.array()
  }

  private def bytesToDoubles(b: Array[Byte]): Array[Double] = {
    val out = new Array[Double](b.length / 8)
    java.nio.ByteBuffer.wrap(b).asDoubleBuffer().get(out)
    out
  }

  /** Full-batch logistic-regression gradient step, fused: for each row
    * with sparse features `f = struct(indices, values)` and label `y`,
    * computes `p = sigmoid(w·x + b)` against the driver-known weights and
    * scatter-adds `v_k · (p − y)` into slot k, `(p − y)` into slot dim
    * (bias gradient) and the log-loss into slot dim+1. Output:
    * `array<double>` of length dim + 2 — the exact sums the explode +
    * groupBy("i").sum plan produced, in one pass with no fan-out.
    *
    * Rows with null/malformed features or null labels contribute nothing
    * (the explode plan's null-sum behavior). */
  case class LogRegGradAgg(
      features: Expression,
      label: Expression,
      weights: Seq[Double],
      bias: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Double]]
      with BinaryLike[Expression] {

    private val dim = weights.length
    require(dim > 0 && dim + 2 <= MaxDenseSlots,
      s"logreg dense gradient needs 0 < dim + 2 <= $MaxDenseSlots, got $dim")

    @transient private lazy val w: Array[Double] = weights.toArray

    override def prettyName: String = "graft_logreg_grad"
    override def left: Expression = features
    override def right: Expression = label
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      (features.dataType, label.dataType) match {
        case (s: StructType, DoubleType) if s.length == 2 &&
          s(0).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.isInstanceOf[ArrayType] => TypeCheckResult.TypeCheckSuccess
        case (f, l) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (struct(indices,values), double), got " +
            s"(${f.simpleString}, ${l.simpleString})")
      }

    override def createAggregationBuffer(): Array[Double] =
      new Array[Double](dim + 2)

    override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
      val f = features.eval(input)
      val y = label.eval(input)
      if (f == null || y == null) return buf
      val row = f.asInstanceOf[InternalRow]
      if (row.isNullAt(0) || row.isNullAt(1)) return buf
      val idx = row.getArray(0)
      val vals = row.getArray(1)
      val n = idx.numElements()
      if (vals.numElements() != n) return buf
      // First pass: the dot product (malformed indices → skip the row,
      // matching the scorer's null contract).
      var z = bias
      var i = 0
      while (i < n) {
        if (idx.isNullAt(i) || vals.isNullAt(i)) return buf
        val k = idx.getInt(i)
        if (k < 0 || k >= dim) return buf
        z += w(k) * vals.getDouble(i)
        i += 1
      }
      val p = 1.0 / (1.0 + math.exp(-z))
      val yv = y.asInstanceOf[Double]
      val r = p - yv
      val eps = 1e-12
      val ll = -(yv * math.log(math.max(p, eps)) +
        (1.0 - yv) * math.log(math.max(1.0 - p, eps)))
      i = 0
      while (i < n) {
        buf(idx.getInt(i)) += vals.getDouble(i) * r
        i += 1
      }
      buf(dim) += r
      buf(dim + 1) += ll
      buf
    }

    override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Double]): Any =
      new GenericArrayData(buf.map(Double.box(_): Any))

    override def serialize(buf: Array[Double]): Array[Byte] = doublesToBytes(buf)
    override def deserialize(b: Array[Byte]): Array[Double] = bytesToDoubles(b)

    override def withNewMutableAggBufferOffset(o: Int): LogRegGradAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): LogRegGradAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): LogRegGradAgg =
      copy(features = l, label = r)
  }

  /** One Lloyd step, fused: for each row with cell assignment `cell` and
    * vector `vec` (array<double> of length `dim`), scatter-adds the vector
    * into the cell's sum slots and bumps the cell's count. Output:
    * `array<double>` of length nCells × (dim+1), laid out per cell as
    * [dim sums, count] — the driver divides to get the per-cell means the
    * posexplode + avg plan produced. Null/short vectors and out-of-range
    * cells contribute nothing. */
  case class KMeansSumAgg(
      cell: Expression,
      vec: Expression,
      nCells: Int,
      dim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Double]]
      with BinaryLike[Expression] {

    require(nCells > 0 && dim > 0 && nCells.toLong * (dim + 1) <= MaxDenseSlots,
      s"kmeans dense sums need nCells*(dim+1) <= $MaxDenseSlots, " +
        s"got $nCells x ($dim+1)")

    override def prettyName: String = "graft_kmeans_sums"
    override def left: Expression = cell
    override def right: Expression = vec
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      (cell.dataType, vec.dataType) match {
        case (IntegerType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
        case (c, v) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (int, array<double>), got " +
            s"(${c.simpleString}, ${v.simpleString})")
      }

    override def createAggregationBuffer(): Array[Double] =
      new Array[Double](nCells * (dim + 1))

    override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
      val c = cell.eval(input)
      val v = vec.eval(input)
      if (c == null || v == null) return buf
      val ci = c.asInstanceOf[Int]
      if (ci < 0 || ci >= nCells) return buf
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(arr.numElements(), dim)
      val base = ci * (dim + 1)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf(base + i) += arr.getDouble(i)
        i += 1
      }
      buf(base + dim) += 1.0
      buf
    }

    override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Double]): Any =
      new GenericArrayData(buf.map(Double.box(_): Any))

    override def serialize(buf: Array[Double]): Array[Byte] = doublesToBytes(buf)
    override def deserialize(b: Array[Byte]): Array[Double] = bytesToDoubles(b)

    override def withNewMutableAggBufferOffset(o: Int): KMeansSumAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KMeansSumAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): KMeansSumAgg =
      copy(cell = l, vec = r)
  }

  /** Column API: fused logistic-regression gradient/loss sums. */
  def logRegGrad(features: Column, label: Column,
      weights: Array[Double], bias: Double): Column =
    GraftSql.column(LogRegGradAgg(GraftSql.expression(features),
      GraftSql.expression(label), weights.toSeq, bias).toAggregateExpression())

  /** Column API: fused per-cell vector sums + counts for one Lloyd step. */
  def kMeansSums(cell: Column, vec: Column, nCells: Int, dim: Int): Column =
    GraftSql.column(KMeansSumAgg(GraftSql.expression(cell),
      GraftSql.expression(vec), nCells, dim).toAggregateExpression())
}
