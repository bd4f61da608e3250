package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the crawl-cleaning step that undoes the single most
  * common encoding corruption on the web (the core fix of the public
  * `ftfy` tool): UTF-8 bytes mis-decoded as cp1252/Latin-1 and
  * re-encoded, so "é" (UTF-8 `C3 A9`) surfaces as "Ã©". The repair
  * re-encodes each char back to its cp1252 byte and strictly re-decodes
  * the byte string as UTF-8; the fix is applied ONLY when the whole
  * string survives that round-trip (valid UTF-8, shorter than the
  * input) — anything else returns the input unchanged, so the operator
  * is a no-op on clean text and total on arbitrary input.
  *
  * Single-pass, codegen'd, zero shuffle — the [[HtmlKernel]] contract.
  * A cheap pre-gate (does any char look like a UTF-8 lead byte
  * mis-decoded, i.e. U+00C2-U+00F4 or a cp1252 punctuation ghost?)
  * skips the repair attempt entirely for ordinary text, so the
  * common-case cost is one scan.
  *
  * Deliberately ONE round: double-mojibake ("Ã©" corrupted twice)
  * repairs to single-mojibake, not to the original — iterating to a
  * fixed point risks false repairs on legitimate text, the conservative
  * choice ftfy itself defaults away from at this layer.
  *
  * Null → null; empty → empty.
  */
object MojibakeKernel {

  /** cp1252 char → byte for the 0x80-0x9F graphical range (the bytes
    * where cp1252 differs from Latin-1); chars ≤ 0xFF map to themselves,
    * everything else is unmappable (-1). */
  private val Cp1252Inverse: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    val range = Array(
      0x20AC, -1, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017D, -1,
      -1, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, -1, 0x017E, 0x0178)
    var b = 0
    while (b < 32) {
      if (range(b) >= 0) m.put(range(b).toChar, Integer.valueOf(0x80 + b))
      b += 1
    }
    m
  }

  private def charToByte(c: Char): Int = {
    if (c <= 0x7F) c
    // 0x80-0x9F raw C1 controls: the LATIN-1-decoded variant of the same
    // corruption (a cp1252 decoder turns the five undefined bytes into
    // U+FFFD — lossy, unrepairable — but a Latin-1 decoder keeps them
    // all as C1 chars, which no legitimate text contains).
    else if (c <= 0xFF) c
    else {
      val v = Cp1252Inverse.get(Character.valueOf(c))
      if (v == null) -1 else v.intValue()
    }
  }

  /** True when `c` could be a UTF-8 lead/continuation byte surfaced as a
    * char — without at least one of these the string cannot be mojibake
    * and the repair attempt is skipped. */
  private def suspicious(c: Char): Boolean =
    (c >= 0xC2 && c <= 0xF4) || (c >= 0x80 && c <= 0x9F) ||
      Cp1252Inverse.containsKey(Character.valueOf(c))

  /** Strict UTF-8 decode of `bytes[0, n)`; null on any invalid sequence
    * (overlong forms and surrogates rejected). */
  private def strictDecodeUtf8(bytes: Array[Byte], n: Int): String = {
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else if (b0 < 0xC2) return null // continuation or overlong lead
      else if (b0 < 0xE0) {
        if (i + 1 >= n) return null
        val b1 = bytes(i + 1) & 0xFF
        if ((b1 & 0xC0) != 0x80) return null
        sb.append((((b0 & 0x1F) << 6) | (b1 & 0x3F)).toChar)
        i += 2
      } else if (b0 < 0xF0) {
        if (i + 2 >= n) return null
        val b1 = bytes(i + 1) & 0xFF; val b2 = bytes(i + 2) & 0xFF
        if ((b1 & 0xC0) != 0x80 || (b2 & 0xC0) != 0x80) return null
        val cp = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return null
        sb.append(cp.toChar)
        i += 3
      } else if (b0 < 0xF5) {
        if (i + 3 >= n) return null
        val b1 = bytes(i + 1) & 0xFF; val b2 = bytes(i + 2) & 0xFF
        val b3 = bytes(i + 3) & 0xFF
        if ((b1 & 0xC0) != 0x80 || (b2 & 0xC0) != 0x80 || (b3 & 0xC0) != 0x80)
          return null
        val cp = ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) |
          ((b2 & 0x3F) << 6) | (b3 & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return null
        sb.appendCodePoint(cp)
        i += 4
      } else return null
    }
    sb.toString
  }

  /** The repair: returns the fixed string, or `s` unchanged when the
    * round-trip does not strictly succeed. */
  def fix(s: String): String = {
    val len = s.length
    var hasSuspicious = false
    var i = 0
    while (i < len && !hasSuspicious) {
      if (suspicious(s.charAt(i))) hasSuspicious = true
      i += 1
    }
    if (!hasSuspicious) return s
    val bytes = new Array[Byte](len)
    i = 0
    while (i < len) {
      val b = charToByte(s.charAt(i))
      if (b < 0) return s // a char no cp1252 text could contain
      bytes(i) = b.toByte
      i += 1
    }
    val decoded = strictDecodeUtf8(bytes, len)
    // Strictly shorter = at least one multi-byte sequence collapsed; an
    // equal-length "repair" means the input was plain ASCII/Latin text
    // that merely contains accented chars — leave it alone.
    if (decoded == null || decoded.length >= len) s else decoded
  }

  def fixEval(text: UTF8String): UTF8String =
    UTF8String.fromString(fix(text.toString))

  case class FixMojibake(child: Expression) extends UnaryExpression {
    override def prettyName: String = "graft_fix_mojibake"
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      fixEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.MojibakeKernel.fixEval($str);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: repaired text (input unchanged when not mojibake). */
  def fixMojibake(text: Column): Column =
    GraftSql.column(FixMojibake(GraftSql.expression(text)))
}
