package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused WordPiece kernels ([[graft.llm.WordPiece]] — the BERT subword
  * family: Wu et al., "Google's Neural Machine Translation System", 2016;
  * Devlin et al., BERT, 2019). Continuation pieces carry the `##` marker;
  * encoding is greedy longest-match-first per word, and a word with any
  * unmatchable position becomes a single `[UNK]` token (the published
  * BERT rule, all-or-nothing per word).
  *
  * Both kernels are per-row pure functions with the vocabulary / merge
  * table shipped once per plan as a codegen reference object — the
  * [[BpeKernels]] / [[UnigramKernels]] design. No shuffle, no driver
  * involvement, whole-stage-codegen friendly.
  */
object WordPieceKernels {

  /** The BERT out-of-vocabulary token. */
  val UnkToken = "[UNK]"

  /** Piece vocabulary for greedy encoding. `pieces` hold word-initial
    * forms bare and continuation forms with the `##` prefix. */
  final class VocabTable(val pieces: Array[String], val maxWordChars: Int)
      extends Serializable {
    private val set = {
      val s = new java.util.HashSet[String](pieces.length * 2)
      pieces.foreach(s.add)
      s
    }
    /** Longest piece CONTENT length (marker excluded) — the greedy scan's
      * upper window. */
    val maxContentLen: Int = {
      var m = 0
      pieces.foreach { p =>
        val n = if (p.startsWith("##")) p.length - 2 else p.length
        if (n > m) m = n
      }
      math.max(m, 1)
    }

    def contains(s: String): Boolean = set.contains(s)

    /** Greedy longest-match-first segmentation of one word; null means
      * unsegmentable (caller emits [UNK]). Words longer than
      * `maxWordChars` CODE POINTS are [UNK] without scanning (the BERT
      * max_input_chars_per_word rule — code points, the same unit
      * training's single-symbol alphabet and the gate's `length()` use;
      * UTF-16 units would spuriously [UNK] astral-plane words and break
      * the pinned no-UNK-on-training-corpus invariant). Match windows
      * also step by code points so a surrogate pair is never split. */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      // Code-point start offsets (UTF-16 index of each code point).
      val nCp = word.codePointCount(0, word.length)
      if (nCp > maxWordChars) return null
      val off = new Array[Int](nCp + 1)
      var u = 0
      var c = 0
      while (u < word.length) {
        off(c) = u
        u += Character.charCount(word.codePointAt(u))
        c += 1
      }
      off(nCp) = word.length
      val out = new scala.collection.mutable.ArrayBuffer[String](4)
      var i = 0
      while (i < nCp) {
        var j = math.min(nCp, i + maxContentLen)
        var hit: String = null
        while (j > i && hit == null) {
          val sub = word.substring(off(i), off(j))
          val cand = if (i == 0) sub else "##" + sub
          if (set.contains(cand)) hit = cand else j -= 1
        }
        if (hit == null) return null
        out += hit
        i = j
      }
      out.toArray
    }

    /** All pieces of the whole text, word by word (the shared word rule:
      * lowercased whitespace tokens). */
    def encode(text: UTF8String): ArrayData = {
      val toks = WordPieceKernels.WsPattern
        .split(text.trim().toLowerCase.toString, -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) {
          val pieces = encodeWord(toks(i))
          if (pieces == null) out += UTF8String.fromString(UnkToken)
          else pieces.foreach(p => out += UTF8String.fromString(p))
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  private[functions] val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** WordPiece merge table: fusing drops the right side's `##` marker
    * (`"h" + "##e" -> "he"`, `"##l" + "##o" -> "##lo"`), so a symbol
    * always spells marker + covered content — concatenating a word's
    * symbols with markers stripped (beyond the first) reproduces the
    * word, the roundtrip invariant. Merges fold in rank order,
    * left-to-right, non-overlapping — the [[BpeKernels.MergeTable]]
    * contract with the WordPiece fuse rule. */
  final class WpMergeTable(val merges: Array[(String, String)])
      extends Serializable {
    def fuse(l: String, r: String): String =
      if (r.startsWith("##")) l + r.substring(2) else l + r

    def applyAll(syms: scala.collection.mutable.ArrayBuffer[String])
        : scala.collection.mutable.ArrayBuffer[String] = {
      var cur = syms
      var m = 0
      while (m < merges.length && cur.length > 1) {
        val (l, r) = merges(m)
        var i = 0
        var changed = false
        while (i < cur.length - 1 && !changed) {
          if (cur(i) == l && cur(i + 1) == r) changed = true else i += 1
        }
        if (changed) {
          val next = new scala.collection.mutable.ArrayBuffer[String](cur.length)
          var j = 0
          while (j < cur.length) {
            if (j < cur.length - 1 && cur(j) == l && cur(j + 1) == r) {
              next += fuse(l, r); j += 2
            } else { next += cur(j); j += 1 }
          }
          cur = next
        }
        m += 1
      }
      cur
    }

    def applyToSyms(syms: ArrayData): ArrayData = {
      val n = syms.numElements()
      val buf = new scala.collection.mutable.ArrayBuffer[String](n)
      var i = 0
      while (i < n) { buf += syms.getUTF8String(i).toString; i += 1 }
      val out = applyAll(buf)
      new GenericArrayData(out.map(s => UTF8String.fromString(s): Any).toArray)
    }
  }

  /** Apply a merge batch to a symbol array column (the trainer's
    * vocabulary-table rewrite step). */
  case class WpApply(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def prettyName: String = "graft_wp_apply"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"merges[${merges.length}]")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val table = new WpMergeTable(merges.toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.applyToSyms(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpMergeTable", table,
        "graft.functions.WordPieceKernels.WpMergeTable")
      nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.applyToSyms($arr);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Greedy longest-match WordPiece encode of a TEXT column. */
  case class WordPieceEncode(child: Expression, pieceSeq: Seq[String],
      maxWordChars: Int) extends UnaryExpression {
    override def prettyName: String = "graft_wordpiece_encode"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"pieces[${pieceSeq.length}]", maxWordChars)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val table =
      new VocabTable(pieceSeq.toArray, maxWordChars)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.encode(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpVocabTable", table,
        "graft.functions.WordPieceKernels.VocabTable")
      nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.encode($str);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: fold a merge batch over a symbol-array column. */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    GraftSql.column(WpApply(GraftSql.expression(syms), merges))

  /** Column API: WordPiece piece array (`array<string>`) for a text
    * column. */
  def encode(text: Column, pieces: Seq[String], maxWordChars: Int = 200): Column =
    GraftSql.column(WordPieceEncode(GraftSql.expression(text), pieces, maxWordChars))
}
