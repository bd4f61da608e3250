package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for DSIR-style importance resampling
  * ([[graft.llm.Dsir]]; Xie et al., "Data Selection for Language Models
  * via Importance Resampling", NeurIPS 2023): select raw-corpus documents
  * whose hashed-n-gram distribution resembles a small high-quality target
  * corpus, by importance weight log p_target(x) − p_raw(x) under
  * bag-of-hashed-n-grams multinomials.
  *
  * Two expressions, both single-pass and codegen'd, sharing the
  * [[LogRegKernels]] token contract (`split(trim(lower(text)), "\s+")`,
  * empty tokens dropped) and [[LogRegKernels.hashToBucket]] (FNV-1a,
  * order-seeded basis) so classifier features and DSIR buckets agree on
  * what an n-gram is:
  *
  *  - [[NgramBuckets]]: text → `array<int>` of one bucket id per n-gram
  *    OCCURRENCE (orders 1..n), in reading order. Feeding a corpus-level
  *    `explode → groupBy(bucket).count` gives the multinomial counts with
  *    a shuffle bounded by `dim` after map-side combine — never
  *    corpus-sized.
  *  - [[DsirLogWeight]]: text → Σ over occurrences of
  *    `logRatio(bucket)`, the per-document importance log-weight, with
  *    the dim-sized log-ratio table shipped once per plan as a codegen
  *    reference object (the [[LogRegKernels.WeightTable]] pattern).
  *    Scoring 100 TB is a narrow zero-shuffle map.
  *
  * Null contract ([[VectorKernels]] convention): null text → null. Empty
  * text → empty bucket array / 0.0 log-weight (an empty document is
  * equally likely under both distributions).
  */
object DsirKernels {

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Tokens under the repo-wide contract, empties dropped. */
  def tokensOf(text: UTF8String): Array[String] = {
    val toks0 = WsPattern.split(text.trim().toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) n += 1; i += 1 }
    val toks = new Array[String](n)
    i = 0; var j = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }
    toks
  }

  /** All n-gram occurrence buckets (orders 1..ngrams) of `text`. */
  def computeBuckets(text: UTF8String, dim: Int, ngrams: Int): GenericArrayData = {
    val toks = tokensOf(text)
    val nTok = toks.length
    var total = 0
    var order = 1
    while (order <= ngrams) {
      total += math.max(nTok - order + 1, 0)
      order += 1
    }
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder
    var p = 0
    order = 1
    while (order <= ngrams) {
      var w = 0
      while (w + order <= nTok) {
        sb.setLength(0)
        var k = 0
        while (k < order) {
          if (k > 0) sb.append(' ')
          sb.append(toks(w + k))
          k += 1
        }
        out(p) = Int.box(LogRegKernels.hashToBucket(sb.toString, order, dim))
        p += 1
        w += 1
      }
      order += 1
    }
    new GenericArrayData(out)
  }

  case class NgramBuckets(child: Expression, dim: Int, ngrams: Int)
      extends UnaryExpression {
    require(dim > 0, s"bucket dim must be positive, got $dim")
    require(ngrams >= 1, s"ngram order must be >= 1, got $ngrams")
    override def prettyName: String = "graft_ngram_buckets"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      computeBuckets(input.asInstanceOf[UTF8String], dim, ngrams)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.DsirKernels.computeBuckets($str, $dim, $ngrams);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Immutable dim-sized log p_target/p_raw table + the hashing config it
    * was built under, shipped to executors once per plan. */
  final class LogRatioTable(val logRatios: Array[Double], val ngrams: Int)
      extends Serializable {
    require(logRatios.nonEmpty, "log-ratio table must be non-empty")
    val dim: Int = logRatios.length

    /** Σ logRatio(bucket) over all n-gram occurrences of `text`. */
    def logWeight(text: UTF8String): Double = {
      val toks = tokensOf(text)
      val nTok = toks.length
      val sb = new java.lang.StringBuilder
      var sum = 0.0
      var order = 1
      while (order <= ngrams) {
        var w = 0
        while (w + order <= nTok) {
          sb.setLength(0)
          var k = 0
          while (k < order) {
            if (k > 0) sb.append(' ')
            sb.append(toks(w + k))
            k += 1
          }
          sum += logRatios(LogRegKernels.hashToBucket(sb.toString, order, dim))
          w += 1
        }
        order += 1
      }
      sum
    }
  }

  case class DsirLogWeight(child: Expression, table: LogRatioTable)
      extends UnaryExpression {
    override def prettyName: String = "graft_dsir_logweight"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.logWeight(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dsirTable", table,
        "graft.functions.DsirKernels.LogRatioTable")
      nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.logWeight($str);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: one bucket id per n-gram occurrence. */
  def ngramBuckets(text: Column, dim: Int, ngrams: Int): Column =
    GraftSql.column(NgramBuckets(GraftSql.expression(text), dim, ngrams))

  /** Column API: the per-document importance log-weight against a
    * driver-known log-ratio table. */
  def dsirLogWeight(text: Column, table: LogRatioTable): Column =
    GraftSql.column(DsirLogWeight(GraftSql.expression(text), table))
}
