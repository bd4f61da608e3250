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
  * gradient slots; nCells × (dim+1) centroid sums; m × ksub × (subdim+1)
  * codeword sums), the whole iteration folds into one dense scatter-add
  * pass: the Lloyd/PQ steps as ONE [[TypedImperativeAggregate]] (each task
  * scatter-adds into a local buffer, partials merge pairwise, the driver
  * collects a single array row), the logistic-regression step as a
  * partition-local RDD walk over the training checkpoint
  * ([[logRegGradUpdate]] — its loop runs 20-60 iterations, so it also
  * skips the per-step Catalyst/AQE planning a Dataset.agg would re-pay).
  * No explode, no per-key shuffle, one stage fewer per iteration.
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

  /** Measurement hatch: `-Dgraft.denseAgg=off` forces every caller back to
    * the explode + hash-aggregate plan (A/B comparisons of the two shapes
    * in one binary). Default on. */
  def enabled: Boolean = !sys.props.get("graft.denseAgg").contains("off")

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

  /** Full-batch logistic-regression gradient step, per row: computes
    * `p = sigmoid(w·x + b)` for a checkpointed training row laid out as
    * (f struct(indices array<int>, values array<double>), y double) and
    * scatter-adds `v_k · (p − y)` into slot k of `buf`, `(p − y)` into
    * slot dim (bias gradient) and the log-loss into slot dim+1 — the
    * exact sums the old explode + groupBy("i").sum plan produced, driven
    * from a partition-local RDD pass ([[graft.llm.QualityClassifier]]).
    * Rows with null/malformed features or null labels contribute nothing
    * (the explode plan's null-sum behavior). */
  def logRegGradUpdate(buf: Array[Double], input: InternalRow,
      w: Array[Double], bias: Double): Unit = {
    val dim = w.length
    if (input.isNullAt(0) || input.isNullAt(1)) return
    val row = input.getStruct(0, 2)
    if (row.isNullAt(0) || row.isNullAt(1)) return
    val idx = row.getArray(0)
    val vals = row.getArray(1)
    val n = idx.numElements()
    if (vals.numElements() != n) return
    // First pass: the dot product (malformed indices → skip the row,
    // matching the scorer's null contract).
    var z = bias
    var i = 0
    while (i < n) {
      if (idx.isNullAt(i) || vals.isNullAt(i)) return
      val k = idx.getInt(i)
      if (k < 0 || k >= dim) return
      z += w(k) * vals.getDouble(i)
      i += 1
    }
    val p = 1.0 / (1.0 + math.exp(-z))
    val yv = input.getDouble(1)
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
  }

  /** One Lloyd step, fused: for each row with cell assignment `cell` and
    * vector `vec` (array<double> of length `dim`), scatter-adds the vector
    * into the cell's sum slots and bumps the cell's count. Output:
    * `array<double>` of length nCells × (dim+1), laid out per cell as
    * [dim sums, count] — the driver divides to get the per-cell means the
    * posexplode + avg plan produced. Null/empty vectors and out-of-range
    * cells contribute nothing (explode-plan parity: they emit no rows
    * there, so a cell fed only such rows keeps its previous centroid in
    * BOTH shapes — r19, was a silent dense/explode divergence). Ragged
    * vectors (0 < length ≠ dim, or null elements) throw: the explode
    * plan's per-(cell, pos) averages give partial positions their own
    * denominators, which a single per-cell count cannot reproduce — the
    * dense path REQUIRES fixed-width vectors rather than silently
    * disagreeing (VERDICT r18 #3). */
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
      val n = arr.numElements()
      if (n == 0) return buf // "no vector": no rows in the explode plan either
      if (n != dim) throw new IllegalArgumentException(
        s"$prettyName: vector length $n != dim $dim — the dense Lloyd step " +
          "requires fixed-width vectors (the explode plan credits partial " +
          "positions with their own denominators, which a per-cell count " +
          "cannot reproduce); filter or pad ragged vectors upstream")
      val base = ci * (dim + 1)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at position $i — fixed-width vectors " +
            "must be fully populated")
        buf(base + i) += arr.getDouble(i)
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

  /** One PQ Lloyd step, fused: for each row with vector `vec`
    * (array<double>, length m × subdim) and per-subspace code assignment
    * `codes` (array<int>, length m), scatter-adds each subvector into its
    * (subspace, codeword) sum slots and bumps that cell's count. Output:
    * `array<double>` of length m × ksub × (subdim+1), laid out per
    * (subspace s, code c) at (s·ksub + c)·(subdim+1) as [subdim sums,
    * count] — the driver divides for the per-codeword means the double
    * posexplode + (sub, code, pos) avg plan produced. Null/empty
    * vectors/codes and out-of-range codes contribute nothing (explode
    * parity: no rows there either, so an unfed codeword keeps its previous
    * value in both shapes). Ragged inputs (codes length ≠ m, vector length
    * ≠ m·subdim, null elements) throw — the explode plan's per-(sub, code,
    * pos) averages give partial slices their own denominators, which a
    * per-codeword count cannot reproduce, so the dense path REQUIRES
    * fixed-width inputs rather than silently disagreeing (VERDICT r18 #3,
    * r19). */
  case class PqSumAgg(
      vec: Expression,
      codes: Expression,
      m: Int,
      ksub: Int,
      subdim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Double]]
      with BinaryLike[Expression] {

    require(m > 0 && ksub > 0 && subdim > 0 &&
      m.toLong * ksub * (subdim + 1) <= MaxDenseSlots,
      s"pq dense sums need m*ksub*(subdim+1) <= $MaxDenseSlots, " +
        s"got $m x $ksub x ($subdim+1)")

    override def prettyName: String = "graft_pq_sums"
    override def left: Expression = vec
    override def right: Expression = codes
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      (vec.dataType, codes.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (v, c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<double>, array<int>), got " +
            s"(${v.simpleString}, ${c.simpleString})")
      }

    override def createAggregationBuffer(): Array[Double] =
      new Array[Double](m * ksub * (subdim + 1))

    override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
      val v = vec.eval(input)
      val c = codes.eval(input)
      if (v == null || c == null) return buf
      val varr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val carr = c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val nm = carr.numElements()
      val nv = varr.numElements()
      if (nm == 0 || nv == 0) return buf // "no vector/codes": explode parity
      if (nm != m || nv != m * subdim) throw new IllegalArgumentException(
        s"$prettyName: codes length $nm / vector length $nv do not match " +
          s"m=$m x subdim=$subdim — the dense PQ step requires fixed-width " +
          "inputs (partial slices would get wrong denominators vs the " +
          "explode plan); filter or pad ragged rows upstream")
      var s = 0
      while (s < m) {
        if (carr.isNullAt(s)) throw new IllegalArgumentException(
          s"$prettyName: null code at subspace $s — fixed-width codes must " +
            "be fully populated")
        val code = carr.getInt(s)
        if (code >= 0 && code < ksub) {
          val base = (s * ksub + code) * (subdim + 1)
          val off = s * subdim
          var d = 0
          while (d < subdim) {
            if (varr.isNullAt(off + d)) throw new IllegalArgumentException(
              s"$prettyName: null element at position ${off + d} — " +
                "fixed-width vectors must be fully populated")
            buf(base + d) += varr.getDouble(off + d)
            d += 1
          }
          buf(base + subdim) += 1.0
        }
        s += 1
      }
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

    override def withNewMutableAggBufferOffset(o: Int): PqSumAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): PqSumAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): PqSumAgg =
      copy(vec = l, codes = r)
  }

  /** Column API: fused per-cell vector sums + counts for one Lloyd step. */
  def kMeansSums(cell: Column, vec: Column, nCells: Int, dim: Int): Column =
    GraftSql.column(KMeansSumAgg(GraftSql.expression(cell),
      GraftSql.expression(vec), nCells, dim).toAggregateExpression())

  /** Column API: fused per-(subspace, codeword) sums + counts for one PQ
    * Lloyd step. */
  def pqSums(vec: Column, codes: Column, m: Int, ksub: Int, subdim: Int): Column =
    GraftSql.column(PqSumAgg(GraftSql.expression(vec),
      GraftSql.expression(codes), m, ksub, subdim).toAggregateExpression())
}
