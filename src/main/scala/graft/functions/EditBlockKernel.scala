package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Segment blocking for bounded edit-distance joins (the PassJoin
  * pigeonhole: Li, Deng, Feng, "PASS-JOIN: a partition-based method for
  * similarity joins", VLDB 2011). A string of length L splits into
  * `d+1` even segments; if `ed(s, t) <= d` then t contains at least one
  * of s's segments VERBATIM, starting within ±d of its position in s
  * (each edit shifts alignment by at most one). So an equi-join of
  * segment keys against substring probe keys finds EVERY candidate pair,
  * and a single `levenshtein(_, _, d)` pass verifies the survivors —
  * no all-pairs comparison anywhere.
  *
  * Key emission is bounded per row: `d+1` segment keys; probe keys are
  * `(d+1) lengths × (d+1) segments × (2d+1) starts` worst case (~45 at
  * d = 2). Strings shorter than `d+1` code points land in one shared
  * `("", -1, L)` block (they are within distance d of anything of
  * length ≤ 2d only, which the probe side mirrors).
  *
  * All offsets/lengths are CODE POINTS — the unit Spark's `levenshtein`
  * counts edits in; segmenting by UTF-16 chars would let a surrogate
  * pair widen the alignment shift past the ±d window.
  */
object EditBlockKernel {

  private val keyType: ArrayType = ArrayType(StructType(Seq(
    StructField("seg", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("ls", IntegerType, nullable = false))), containsNull = false)

  /** Even partition of length `l` into `m` parts: the first `l % m`
    * parts get one extra code point. Returns (start, len) of part i. */
  private def part(l: Int, m: Int, i: Int): (Int, Int) = {
    val base = l / m
    val rem = l % m
    val start = i * base + math.min(i, rem)
    val len = base + (if (i < rem) 1 else 0)
    (start, len)
  }

  private def cps(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(n) = cp; n += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def sub(cp: Array[Int], from: Int, len: Int): UTF8String =
    UTF8String.fromString(new String(cp, from, len))

  /** The d+1 segment keys of one string (the "shorter" join role). */
  def segEval(text: UTF8String, d: Int): ArrayData = {
    val cp = cps(text)
    val l = cp.length
    val m = d + 1
    if (l < m)
      return new GenericArrayData(Array[Any](
        InternalRow(UTF8String.EMPTY_UTF8, -1, l)))
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val (st, ln) = part(l, m, i)
      out(i) = InternalRow(sub(cp, st, ln), i, l)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The substring probe keys of one string (the "longer" join role):
    * for every candidate shorter length `ls` in [L-d, L], every segment
    * index, every start within the ±d window. */
  def probeEval(text: UTF8String, d: Int): ArrayData = {
    val cp = cps(text)
    val l = cp.length
    val m = d + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // Short block: partner strings of length < m.
    if (l <= 2 * d) {
      var ls = math.max(0, l - d)
      val hi = math.min(d, l)
      while (ls <= hi) {
        out += InternalRow(UTF8String.EMPTY_UTF8, -1, ls)
        ls += 1
      }
    }
    // Distinct keys per row: neighboring starts often yield the same
    // substring (runs of one character), which would only duplicate
    // join output.
    val seen = new java.util.HashSet[String]()
    var ls = math.max(m, l - d)
    while (ls <= l) {
      var i = 0
      while (i < m) {
        val (p, ln) = part(ls, m, i)
        var st = math.max(0, p - d)
        val hiSt = math.min(l - ln, p + d)
        while (st <= hiSt) {
          val s = sub(cp, st, ln)
          if (seen.add(s"$i:$ls:$s"))
            out += InternalRow(s, i, ls)
          st += 1
        }
        i += 1
      }
      ls += 1
    }
    new GenericArrayData(out.toArray)
  }

  abstract class EditKeyExpr extends UnaryExpression {
    def d: Int
    override def dataType: DataType = keyType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  }

  case class EditSegKeys(child: Expression, d: Int) extends EditKeyExpr {
    override def prettyName: String = "graft_edit_seg_keys"
    override def nullSafeEval(input: Any): Any =
      segEval(input.asInstanceOf[UTF8String], d)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.EditBlockKernel.segEval($str, $d);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class EditProbeKeys(child: Expression, d: Int) extends EditKeyExpr {
    override def prettyName: String = "graft_edit_probe_keys"
    override def nullSafeEval(input: Any): Any =
      probeEval(input.asInstanceOf[UTF8String], d)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.EditBlockKernel.probeEval($str, $d);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def segKeys(text: Column, d: Int): Column =
    GraftSql.column(EditSegKeys(GraftSql.expression(text), d))

  def probeKeys(text: Column, d: Int): Column =
    GraftSql.column(EditProbeKeys(GraftSql.expression(text), d))
}
