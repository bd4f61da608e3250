package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID kernel: one pass over the document instead of the
  * relational spelling's >=10 full-text regex traversals (5 script-class
  * `regexp_replace` passes + a 20-word lookaround-alternation scan per
  * language — measured ~2-3x slower at corpus scale than even the
  * interpreted higher-order form it had replaced).
  *
  * Semantics are bit-identical to [[graft.llm.TextAnalysis.languageId]]'s
  * Column form (kept as the parity reference and pinned in the oracle):
  *  - script ratios count code points of the space-trimmed text in the
  *    Han / Kana / Hangul / Cyrillic / Arabic BMP ranges, over
  *    max(totalCodePoints, 1); thresholds zh>0.25, ja>0.1, ko>0.25,
  *    ru>0.25, ar>0.25 checked in that order;
  *  - otherwise the argmax of per-language stopword hits over tokens of
  *    lowercase(trim(text)) split on ASCII-\s runs (exactly Java `\s+`),
  *    scanning languages alphabetically with strict-greater replacement
  *    (ties go to the alphabetically first), "und" unless the best score
  *    reaches minHits;
  *  - null text yields "und" (the Column form's when-chain falls through
  *    to the fold's initial value on null).
  *
  * One deliberate divergence: EMPTY or whitespace-only text returns "und".
  * The Column form misclassified such docs as "zh" — its
  * `greatest(length, 1)` zero-division clamp turns the Han ratio into
  * (1 - 0) / 1 = 1 when the trimmed text has length 0. The kernel keeps
  * the clamp for the denominator but counts zero Han code points, so the
  * ratio is 0 and empty docs fall through to "und" (Round6Spec pins both
  * behaviors).
  *
  * One hash probe per token via a stopword -> language-bitmask table;
  * lowercasing uses the same UTF8String.toLowerCase as Spark's `lower`.
  */
object LangIdKernel {

  /** Languages in scan (alphabetical) order. */
  val Langs: IndexedSeq[String] = graft.llm.TextAnalysis.Stopwords.keys.toIndexedSeq.sorted

  private val UND = UTF8String.fromString("und")
  private val langBytes: Array[UTF8String] = Langs.map(UTF8String.fromString).toArray

  /** stopword -> bitmask of language indices (words may belong to several
    * languages — "la" is fr+es, "des" is de+fr). */
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Langs.zipWithIndex.foreach { case (lang, i) =>
      graft.llm.TextAnalysis.Stopwords(lang).foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def predict(text: UTF8String, minHits: Int): UTF8String = {
    if (text == null) return UND
    val trimmed = text.trim() // space-only trim, same as Spark's trim()
    val s = trimmed.toString

    var total = 0
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var arab = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      if (cp >= 0x4E00 && cp <= 0x9FFF) han += 1
      else if (cp >= 0x3040 && cp <= 0x30FF) kana += 1
      else if (cp >= 0xAC00 && cp <= 0xD7AF) hangul += 1
      else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
      else if (cp >= 0x0600 && cp <= 0x06FF) arab += 1
    }
    val chars = math.max(total, 1).toDouble
    if (han / chars > 0.25) return UTF8String.fromString("zh")
    if (kana / chars > 0.1) return UTF8String.fromString("ja")
    if (hangul / chars > 0.25) return UTF8String.fromString("ko")
    if (cyr / chars > 0.25) return UTF8String.fromString("ru")
    if (arab / chars > 0.25) return UTF8String.fromString("ar")

    val lower = trimmed.toLowerCase.toString // same lowercase as Spark lower()
    val counts = new Array[Int](Langs.length)
    var start = 0
    val n = lower.length
    while (start < n) {
      while (start < n && isAsciiSpace(lower.charAt(start))) start += 1
      var end = start
      while (end < n && !isAsciiSpace(lower.charAt(end))) end += 1
      if (end > start) {
        val mask = wordMask.get(lower.substring(start, end))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = Integer.numberOfTrailingZeros(m)
            counts(b) += 1
            m &= m - 1
          }
        }
      }
      start = end
    }
    var best = -1
    var bestScore = minHits - 1
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bestScore) { best = l; bestScore = counts(l) }
      l += 1
    }
    if (best < 0) UND else langBytes(best)
  }

  case class LanguageId(child: Expression, minHits: Int) extends UnaryExpression {
    override def prettyName: String = "graft_langid"
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      predict(input.asInstanceOf[UTF8String], minHits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.LangIdKernel.predict($str, $minHits);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API. Null text maps to "und" like the Column form (the kernel
    * is wrapped in coalesce because UnaryExpression null-propagates). */
  def languageId(text: Column, minHits: Int = 1): Column =
    coalesce(GraftSql.column(LanguageId(GraftSql.expression(text), minHits)), lit("und"))
}
