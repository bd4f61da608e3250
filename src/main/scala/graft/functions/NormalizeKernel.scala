package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels — the canonicalization step in front of
  * hashing/dedup/tokenization (fullwidth forms, ligatures, compatibility
  * characters, NBSP variants all collapse before fingerprints are
  * computed, or visually-identical documents hash apart).
  *
  * [[NfkcNormalize]] is `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of UAX #15) behind the [[MojibakeKernel]] kernel shape:
  * single-pass codegen'd projection, zero shuffle, with the
  * `isNormalized` fast path keeping already-clean text (the common case —
  * all ASCII, most NFC web text) at one scan and zero allocation.
  *
  * [[foldForDedup]] is the composed canonical form the dedup family
  * expects: NFKC → lowercase → whitespace runs collapsed to one space →
  * trim. Idempotent by construction (each stage is), so re-folding folded
  * text is a no-op — the property the gate pins corpus-wide.
  */
object NormalizeKernel {

  /** NFKC-normalize one string (fast path: already-normalized input is
    * returned as-is without re-encoding). */
  def nfkcEval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  case class NfkcNormalize(child: Expression) extends UnaryExpression {
    override def prettyName: String = "graft_nfkc"
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      nfkcEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.NormalizeKernel.nfkcEval($str);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Column API: NFKC normalization. */
  def nfkc(text: Column): Column =
    GraftSql.column(NfkcNormalize(GraftSql.expression(text)))

  /** Canonical dedup folding: NFKC → lower → collapse whitespace → trim.
    * Feed this to content hashes / shingles so compatibility variants of
    * the same text dedup together. */
  def foldForDedup(text: Column): Column = {
    import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
    trim(regexp_replace(lower(nfkc(text)), "\\s+", " "))
  }
}
