package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector kernels (custom `Expression`s with `doGenCode`).
  *
  * The similarity operators need per-PAIR dot products; the two built-in
  * routes both lose there: higher-order functions (`aggregate`/`zip_with`)
  * are CodegenFallback and interpret the lambda per evaluation, and the
  * dimension-unrolled `element_at` chain (Similarity.dot) is codegen'd but
  * costs `dim` expression nodes — per-element null/bounds checks at
  * runtime, plan bloat and codegen-size pressure at compile time, plus a
  * driver-side `dimOf` probe job just to know how far to unroll. A custom
  * BinaryExpression is the textbook fix: one plan node, one fused primitive
  * loop over both `ArrayData`, dimension read from the data itself.
  *
  * Numeric contract (bit-compatibility with the unrolled forms, which the
  * pinned sketch oracles depend on): ascending-index accumulation, one
  * accumulator per sum — `a(0)*b(0) + a(1)*b(1) + ...` exactly like the
  * left-fold `reduce(_ + _)` chain. [[CosineSimilarity]] keeps the exact
  * unrolled formula `dot / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` — NOT the
  * algebraically-equal-but-FP-different `dot / sqrt(sa*sb)` — and returns
  * 0.0 for zero norms.
  *
  * Null contract: null input array -> null; null element -> null;
  * mismatched lengths -> null (the unrolled form would read past the
  * shorter array and null-propagate; the explicit rule is strictly safer
  * and identical for uniform-dimension corpora).
  */
object VectorKernels {

  private def loopCode(a: String, b: String, ev: ExprCode, ctx: CodegenContext,
      finish: (String, String, String, String) => String): String = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val sd = ctx.freshName("sd")
    val sa = ctx.freshName("sa")
    val sb = ctx.freshName("sb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val tmp = ctx.freshName("tmp")
    s"""
       |final int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  double $sd = 0.0, $sa = 0.0, $sb = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
       |    final double $x = $a.getDouble($i);
       |    final double $y = $b.getDouble($i);
       |    $sd += $x * $y; $sa += $x * $x; $sb += $y * $y;
       |  }
       |  if (!${ev.isNull}) { ${finish(sd, sa, sb, tmp)} }
       |}
     """.stripMargin
  }

  abstract class VectorBinary extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

    /** (dot, normSqA, normSqB) -> result; nulls already handled. */
    protected def finishEval(sd: Double, sa: Double, sb: Double): Double
    protected def finishCode(ev: ExprCode): (String, String, String, String) => String

    override def nullSafeEval(av: Any, bv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]
      val b = bv.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var sd = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = a.getDouble(i); val y = b.getDouble(i)
        sd += x * y; sa += x * x; sb += y * y
        i += 1
      }
      finishEval(sd, sa, sb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => loopCode(a, b, ev, ctx, finishCode(ev)))
  }

  /** dot(a, b) — sum of pairwise products. */
  case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
    override def prettyName: String = "graft_dot"
    override protected def finishEval(sd: Double, sa: Double, sb: Double): Double = sd
    override protected def finishCode(ev: ExprCode): (String, String, String, String) => String =
      (sd, _, _, _) => s"${ev.value} = $sd;"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cosine(a, b) in one pass — dot and both norms from a single loop
    * (the unrolled form walks each array twice more for the norms). */
  case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinary {
    override def prettyName: String = "graft_cosine"
    override protected def finishEval(sd: Double, sa: Double, sb: Double): Double = {
      val denom = math.sqrt(sa) * math.sqrt(sb)
      if (denom == 0.0) 0.0 else sd / denom
    }
    override protected def finishCode(ev: ExprCode): (String, String, String, String) => String =
      (sd, sa, sb, tmp) => {
        s"""final double $tmp = java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb);
           |${ev.value} = ($tmp == 0.0) ? 0.0 : $sd / $tmp;""".stripMargin
      }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ------------------------------------------------------------ Column API

  private def c(e: Expression): Column = GraftSql.column(e)
  // The API casts inputs to array<double> (float/int arrays upcast) so the
  // expression itself can insist on exact types.
  private def e(col: Column): Expression = GraftSql.expression(col.cast("array<double>"))

  /** Native dot product over two `array<double>` columns (floats upcast). */
  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  /** Native squared-norm / norm. */
  def normSq(a: Column): Column = dot(a, a)
  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Native fused cosine similarity (0.0 for zero-norm inputs). */
  def cosine(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  // -------------------------------------------------------- PCA projection

  /** Mean + row-major component matrix, shipped once per plan as a
    * codegen reference object (the [[CentroidKernels]] pattern). */
  final class ProjMatrix(val mean: Array[Double], val comps: Array[Double],
      val k: Int) extends Serializable {
    val d: Int = mean.length
    require(comps.length == k * d, s"component matrix ${comps.length} != $k x $d")
    /** out_j = Σ_i comps(j,i) · (x_i - mean_i); null on dim mismatch or
      * any null element (the file-wide kernel null contract — a null
      * coordinate must not silently project as 0.0). */
    def project(x: ArrayData): ArrayData = {
      if (x.numElements() != d) return null
      val cx = new Array[Double](d)
      var i = 0
      while (i < d) {
        if (x.isNullAt(i)) return null
        cx(i) = x.getDouble(i) - mean(i)
        i += 1
      }
      val out = new Array[Any](k)
      var j = 0
      while (j < k) {
        val row = j * d
        var s = 0.0
        i = 0
        while (i < d) { s += comps(row + i) * cx(i); i += 1 }
        out(j) = s
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  case class PcaProject(child: Expression, meanSeq: Seq[Double],
      compSeq: Seq[Double], k: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def prettyName: String = "graft_pca_project"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"mean[${meanSeq.length}]", s"components[${compSeq.length}]", k)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val mat =
      new ProjMatrix(meanSeq.toArray, compSeq.toArray, k)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      mat.project(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pcaProjMatrix", mat,
        "graft.functions.VectorKernels.ProjMatrix")
      val tmp = ctx.freshName("pcaOut")
      nullSafeCodeGen(ctx, ev, arr => s"""
        org.apache.spark.sql.catalyst.util.ArrayData $tmp = $ref.project($arr);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp; }""")
    }

    override protected def withNewChildInternal(ch: Expression): Expression =
      copy(child = ch)
  }

  /** Fused PCA projection: `array<double>` of length k (floats upcast on
    * input; dim-mismatched rows null out). */
  def pcaProject(vec: Column, mean: Array[Double],
      components: Array[Array[Double]]): Column =
    c(PcaProject(e(vec), mean.toSeq, components.flatten.toSeq,
      components.length))
}
