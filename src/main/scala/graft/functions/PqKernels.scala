package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Fused product-quantization (PQ) encode/decode kernels.
  *
  * PQ splits a d-dimensional vector into `m` contiguous subspaces of
  * d/m dimensions each and replaces every subvector with the index of its
  * nearest codeword (L2) from a per-subspace codebook of `ksub` entries.
  * Storage per vector drops from d floats to m small integers — at
  * d=64, m=8 that is 32× vs float32 — which at 100 TB is the difference
  * between an embedding column that fits in cluster memory and one that
  * doesn't. The codebook is tiny and driver-known (trained by
  * [[graft.llm.Similarity.pqTrain]]), so both encode and decode are pure
  * per-row functions: embedded reference object, one compiled pass, zero
  * shuffle, corpus stays narrow — the same design as
  * [[CentroidKernels]]' IVF assignment.
  *
  * Metric contract: assignment is argmin SQUARED L2 DISTANCE per
  * subspace (the PQ standard — reconstruction must preserve magnitude,
  * which cosine assignment would discard). Ties and NaNs resolve to the
  * LOWEST codeword index (strict `<` replacement scanning in index
  * order; NaN distances never beat a real one). A null vector, a vector
  * with null elements, or a length not equal to m×subdim yields null —
  * the [[VectorKernels]] null contract.
  *
  * Reference behaviors this generalizes: the reference's data
  * distribution machinery has no ANN surface; PQ here serves the
  * beyond-reference similarity pipeline (SURVEY §2 extension list).
  */
object PqKernels {

  /** Immutable m × ksub × subdim codebook, shipped to executors once per
    * plan as a codegen reference object. */
  final class Codebook(val books: Array[Array[Array[Double]]]) extends Serializable {
    val m: Int = books.length
    val subdim: Int = if (m == 0 || books(0).isEmpty) 0 else books(0)(0).length
    val dim: Int = m * subdim
    /** Flattened-LUT offset of subspace s (per-subspace ksub may differ). */
    private val off: Array[Int] = {
      val o = new Array[Int](m + 1)
      var s = 0
      while (s < m) { o(s + 1) = o(s) + books(s).length; s += 1 }
      o
    }
    /** ||codeword||^2 per (subspace, code) — query-INDEPENDENT, so the
      * reconstructed-vector norm side of ADC costs m table lookups and
      * never ships with the query. */
    private val cwNorm2: Array[Array[Double]] = books.map(_.map { cw =>
      var n2 = 0.0
      var j = 0
      while (j < cw.length) { n2 += cw(j) * cw(j); j += 1 }
      n2
    })

    /** Per-query ADC lookup table: flattened sum(off) x 1 array where
      * entry off(s)+c = dot(query_subvector(s), codeword(s,c)). O(dim *
      * ksub) once per QUERY; scoring a candidate then costs O(m) lookups
      * instead of an O(dim) decode+dot (classic asymmetric-distance
      * computation, Jégou et al., IEEE TPAMI 2011). */
    def lut(q: ArrayData): ArrayData = {
      if (q.numElements() != dim || dim == 0) return null
      var i = 0
      while (i < dim) { if (q.isNullAt(i)) return null; i += 1 }
      val out = new Array[Any](off(m))
      var s = 0
      while (s < m) {
        val book = books(s)
        val base = s * subdim
        var c = 0
        while (c < book.length) {
          val cw = book(c)
          var d = 0.0
          var j = 0
          while (j < subdim) { d += q.getDouble(base + j) * cw(j); j += 1 }
          out(off(s) + c) = d
          c += 1
        }
        s += 1
      }
      new GenericArrayData(out)
    }

    /** ADC score of one candidate: sum of m LUT entries over the
      * candidate's codes, normalized by the reconstructed norm —
      * `dot(q, decode(codes)) / ||decode(codes)||`. Dividing by the query
      * norm outside yields exactly the decode-path cosine (up to FP
      * grouping of the per-subspace partial sums). Returns 0.0 for a
      * zero-norm reconstruction (the cosine kernels' contract), null for
      * malformed codes or a mismatched LUT. */
    def adcScore(codes: ArrayData, lutArr: ArrayData): java.lang.Double = {
      if (codes.numElements() != m || lutArr.numElements() != off(m) || dim == 0)
        return null
      var dotSum = 0.0
      var n2 = 0.0
      var s = 0
      while (s < m) {
        if (codes.isNullAt(s)) return null
        val c = codes.getInt(s)
        if (c < 0 || c >= books(s).length) return null
        dotSum += lutArr.getDouble(off(s) + c)
        n2 += cwNorm2(s)(c)
        s += 1
      }
      if (n2 == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dotSum / math.sqrt(n2))
    }

    /** PQ codes (argmin L2 per subspace) for a full vector. */
    def encode(vec: ArrayData): ArrayData = {
      if (vec.numElements() != dim || dim == 0) return null
      var i = 0
      while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
      val codes = new Array[Any](m)
      var s = 0
      while (s < m) {
        val book = books(s)
        val base = s * subdim
        var best = Double.PositiveInfinity
        var bestIdx = -1
        var c = 0
        while (c < book.length) {
          val cw = book(c)
          var d2 = 0.0
          var j = 0
          while (j < subdim) {
            val diff = vec.getDouble(base + j) - cw(j)
            d2 += diff * diff
            j += 1
          }
          // Strict < keeps the first (lowest-index) among equals; NaN
          // (NaN < x is false) never displaces a real distance.
          if (d2 < best) { best = d2; bestIdx = c }
          c += 1
        }
        if (bestIdx < 0) return null // all-NaN distances: unassignable row
        codes(s) = bestIdx
        s += 1
      }
      new GenericArrayData(codes)
    }

    /** Reconstructed vector (concatenated codewords) from PQ codes. */
    def decode(codes: ArrayData): ArrayData = {
      if (codes.numElements() != m || dim == 0) return null
      val out = new Array[Any](dim)
      var s = 0
      while (s < m) {
        if (codes.isNullAt(s)) return null
        val c = codes.getInt(s)
        if (c < 0 || c >= books(s).length) return null
        val cw = books(s)(c)
        var j = 0
        while (j < subdim) { out(s * subdim + j) = cw(j); j += 1 }
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  /** `encode` as a Catalyst expression. Codebook held as Seq-of-Seq-of-Seq
    * so plan canonicalization compares values, not array references. */
  case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    override def prettyName: String = "graft_pq_encode"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"codebook[${codebook.length}]")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val book =
      new Codebook(codebook.map(_.map(_.toArray).toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      book.encode(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCodebook", book, "graft.functions.PqKernels.Codebook")
      nullSafeCodeGen(ctx, ev, arr => s"""
        ${ev.value} = $ref.encode($arr);
        ${ev.isNull} = (${ev.value} == null);""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `decode` as a Catalyst expression. */
  case class PqDecode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    override def prettyName: String = "graft_pq_decode"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"codebook[${codebook.length}]")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val book =
      new Codebook(codebook.map(_.map(_.toArray).toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<int>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      book.decode(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCodebook", book, "graft.functions.PqKernels.Codebook")
      nullSafeCodeGen(ctx, ev, arr => s"""
        ${ev.value} = $ref.decode($arr);
        ${ev.isNull} = (${ev.value} == null);""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-query ADC LUT as a Catalyst expression — computed ONCE per query
    * row (the small, broadcast side), never per candidate. */
  case class PqLut(child: Expression, codebook: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    override def prettyName: String = "graft_pq_lut"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"codebook[${codebook.length}]")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val book =
      new Codebook(codebook.map(_.map(_.toArray).toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      book.lut(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCodebook", book, "graft.functions.PqKernels.Codebook")
      nullSafeCodeGen(ctx, ev, arr => s"""
        ${ev.value} = $ref.lut($arr);
        ${ev.isNull} = (${ev.value} == null);""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** O(m) ADC candidate scoring against a per-query LUT — the hot loop of
    * a PQ index probe: m table lookups + adds, no decode, no allocation. */
  case class PqAdc(left: Expression, right: Expression,
      codebook: Seq[Seq[Seq[Double]]])
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def prettyName: String = "graft_pq_adc"
    // Table params must never render whole into plan strings (r18/r19
    // stringArgs sweep — this was the one kernel still missing it).
    override protected def stringArgs: Iterator[Any] =
      Iterator(left, right,
        s"codebook[${codebook.length}x${codebook.headOption.map(_.length).getOrElse(0)}]")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    @transient private lazy val book =
      new Codebook(codebook.map(_.map(_.toArray).toArray).toArray)

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<int> codes, array<double> lut), " +
            s"got (${l.simpleString}, ${r.simpleString})")
      }

    override def nullSafeEval(codes: Any, lutArr: Any): Any =
      book.adcScore(codes.asInstanceOf[ArrayData], lutArr.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCodebook", book, "graft.functions.PqKernels.Codebook")
      val tmp = ctx.freshName("adc")
      nullSafeCodeGen(ctx, ev, (codes, lutArr) => s"""
        java.lang.Double $tmp = $ref.adcScore($codes, $lutArr);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }""")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  private def asSeq(books: Array[Array[Array[Double]]]): Seq[Seq[Seq[Double]]] =
    books.map(_.map(_.toSeq).toSeq).toSeq

  /** Column API: PQ codes (array<int>, length m) for an `array<double>`
    * vector column against a driver-known codebook. */
  def encode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqEncode(GraftSql.expression(vec.cast("array<double>")), asSeq(books)))

  /** Column API: reconstructed `array<double>` vector from PQ codes. */
  def decode(codes: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqDecode(GraftSql.expression(codes.cast("array<int>")), asSeq(books)))

  /** Column API: per-query flattened ADC lookup table (length sum of
    * per-subspace ksub) for an `array<double>` query vector. */
  def lut(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqLut(GraftSql.expression(vec.cast("array<double>")), asSeq(books)))

  /** Column API: ADC score `dot(q, decode(codes)) / ||decode(codes)||` of
    * a candidate's codes against a per-query LUT — divide by the query
    * norm for the full cosine. */
  def adcScore(codes: Column, lutCol: Column,
      books: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqAdc(GraftSql.expression(codes.cast("array<int>")),
      GraftSql.expression(lutCol.cast("array<double>")), asSeq(books)))
}
