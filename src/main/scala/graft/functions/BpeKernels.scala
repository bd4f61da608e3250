package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE merge application / text encoding.
  *
  * A learned merge table is tiny and driver-known (the output of
  * [[graft.llm.Bpe.train]]), so applying it is a pure per-row function —
  * the [[CentroidKernels]] design: embed the table as a codegen reference
  * object and fold the merges in rank order in one compiled pass. The
  * relational spelling (an `aggregate` lambda per merge per word) is
  * interpreted per ELEMENT and would pay numMerges interpreted folds per
  * word — ruinous on a corpus-scale encode pass.
  *
  * Merge contract (deterministic, train/encode consistent): merges apply
  * in rank order; each merge rewrites the symbol sequence left-to-right,
  * non-overlapping (after "a"+"a" fuses, the fused "aa" does not
  * immediately re-fuse with the next "a"). Concatenating a word's tokens
  * always reproduces the word — merging never drops characters, which is
  * the roundtrip invariant the oracle pins.
  */
object BpeKernels {

  /** GPT-2-style byte<->unicode bijection (public: openai/gpt-2
    * encoder.py `bytes_to_unicode`): printable bytes '!'..'~', '¡'..'¬',
    * '®'..'ÿ' map to themselves; the remaining 68 bytes map to U+0100.. in
    * byte order. Every UTF-8 byte becomes exactly ONE visible BMP char,
    * so byte-level symbols stay printable strings and the mapping inverts
    * losslessly. */
  val byteToChar: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }
  private val charToByte: Array[Int] = {
    val arr = Array.fill(512)(-1) // byteToChar range is < U+0200
    var b = 0
    while (b < 256) { arr(byteToChar(b).toInt) = b; b += 1 }
    arr
  }

  /** Rank-ordered merge table. `byteLevel = true` initializes words as
    * their UTF-8 bytes mapped through [[byteToChar]] (256-symbol base
    * alphabet, GPT-2 style) instead of code points — encode is then total
    * on arbitrary text: an unseen character still decomposes into known
    * byte symbols. */
  final class MergeTable(val merges: Array[(String, String)],
      val byteLevel: Boolean = false) extends Serializable {

    /** Fold all merges, in rank order, over one word's symbol list. */
    def applyAll(syms: scala.collection.mutable.ArrayBuffer[String])
        : scala.collection.mutable.ArrayBuffer[String] = {
      var cur = syms
      var m = 0
      while (m < merges.length && cur.length > 1) {
        val (l, r) = merges(m)
        var i = 0
        var changed = false
        // Scan once to avoid allocating when the merge doesn't apply.
        while (i < cur.length - 1 && !changed) {
          if (cur(i) == l && cur(i + 1) == r) changed = true else i += 1
        }
        if (changed) {
          val next = new scala.collection.mutable.ArrayBuffer[String](cur.length)
          var j = 0
          while (j < cur.length) {
            if (j < cur.length - 1 && cur(j) == l && cur(j + 1) == r) {
              next += l + r; j += 2
            } else { next += cur(j); j += 1 }
          }
          cur = next
        }
        m += 1
      }
      cur
    }

    private def chars(word: String): scala.collection.mutable.ArrayBuffer[String] =
      if (byteLevel) {
        val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val buf = new scala.collection.mutable.ArrayBuffer[String](bytes.length)
        var i = 0
        while (i < bytes.length) {
          buf += String.valueOf(byteToChar(bytes(i) & 0xFF))
          i += 1
        }
        buf
      } else {
        val buf = new scala.collection.mutable.ArrayBuffer[String](word.length)
        var i = 0
        while (i < word.length) {
          // Surrogate-pair aware: one symbol per code point.
          val cp = word.codePointAt(i)
          val n = Character.charCount(cp)
          buf += word.substring(i, i + n)
          i += n
        }
        buf
      }

    /** Initial (pre-merge) symbol array for ONE word — the trainer's
      * vocabulary-table init, mode-consistent with [[encode]]. */
    def initSyms(word: UTF8String): ArrayData = {
      val buf = chars(word.toString)
      new GenericArrayData(buf.map(s => UTF8String.fromString(s): Any).toArray)
    }

    /** Invert [[byteToChar]] over a token/concat string back to text.
      * Chars outside the mapping (never produced by a byte-level encode)
      * pass through as their own UTF-8 bytes. */
    def byteDecode(s: UTF8String): UTF8String = {
      val str = s.toString
      val out = new java.io.ByteArrayOutputStream(str.length)
      var i = 0
      while (i < str.length) {
        val c = str.charAt(i)
        val b = if (c < 512) charToByte(c.toInt) else -1
        if (b >= 0) { out.write(b); i += 1 }
        else {
          // Passthrough by CODE POINT: a surrogate pair must travel as one
          // character, not two lone surrogates (each of which would UTF-8
          // encode to '?').
          val cp = str.codePointAt(i)
          val n = Character.charCount(cp)
          out.write(str.substring(i, i + n)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          i += n
        }
      }
      UTF8String.fromBytes(out.toByteArray)
    }

    /** Encode full text: lowercase+trim, split on whitespace, per word
      * char-split then fold the merges; tokens concatenate across words in
      * order. Null-safe at the expression layer. */
    /** Bit-compatible with Spark's `lower()` (UTF8String.toLowerCase):
      * pure-ASCII strings take a locale-free ASCII path; anything else
      * falls back to `String.toLowerCase()` under the DEFAULT locale,
      * exactly like UTF8String.toLowerCaseSlow. Neither branch may be
      * replaced with a fixed-locale toLowerCase: Locale.ROOT on the slow
      * path diverges from Spark on tr/az JVMs, and default-locale on the
      * ASCII path would turn ASCII 'I' into 'ı' where Spark keeps 'i'. */
    private def sparkLower(s: String): String = {
      var i = 0
      var ascii = true
      while (i < s.length && ascii) {
        if (s.charAt(i) >= 0x80) ascii = false
        i += 1
      }
      if (ascii) {
        val arr = s.toCharArray
        var j = 0
        while (j < arr.length) {
          val c = arr(j)
          if (c >= 'A' && c <= 'Z') arr(j) = (c + 32).toChar
          j += 1
        }
        new String(arr)
      } else s.toLowerCase
    }

    /** Spark-exact trim: SQL `trim()` strips SPACES (0x20) only, while
      * Java's String.trim strips every char <= U+0020 — a leading control
      * char would tokenize differently here than in the trainer's SQL
      * pipeline (and flip the frozen roundtrip oracle). */
    private def sparkTrim(s: String): String = {
      var lo = 0
      var hi = s.length
      while (lo < hi && s.charAt(lo) == ' ') lo += 1
      while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
      s.substring(lo, hi)
    }

    def encode(text: UTF8String): ArrayData = {
      val s = sparkLower(sparkTrim(text.toString))
      if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
      val words = s.split("\\s+")
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var w = 0
      while (w < words.length) {
        if (words(w).nonEmpty) {
          val toks = applyAll(chars(words(w)))
          var t = 0
          while (t < toks.length) { out += UTF8String.fromString(toks(t)); t += 1 }
        }
        w += 1
      }
      new GenericArrayData(out.toArray)
    }

    /** Fold the merges over an existing symbol array (training's
      * incremental apply: the table holds just the newest merge). Null
      * elements yield null (the [[VectorKernels]] contract). */
    def applyToSyms(syms: ArrayData): ArrayData = {
      val n = syms.numElements()
      val buf = new scala.collection.mutable.ArrayBuffer[String](n)
      var i = 0
      while (i < n) {
        if (syms.isNullAt(i)) return null
        buf += syms.getUTF8String(i).toString
        i += 1
      }
      val out = applyAll(buf)
      new GenericArrayData(out.map(s => UTF8String.fromString(s): Any).toArray)
    }
  }

  /** Whole-text BPE encode as a Catalyst expression. */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)],
      byteLevel: Boolean = false) extends UnaryExpression {
    override def prettyName: String = "graft_bpe_encode"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"merges[${merges.length}]", byteLevel)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val table = new MergeTable(merges.toArray, byteLevel)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.encode(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeMerges", table, "graft.functions.BpeKernels.MergeTable")
      nullSafeCodeGen(ctx, ev, s => s"""
        ${ev.value} = $ref.encode($s);
        ${ev.isNull} = (${ev.value} == null);""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Merge-fold over a symbol array as a Catalyst expression (training's
    * incremental apply). */
  case class BpeApply(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def prettyName: String = "graft_bpe_apply"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"merges[${merges.length}]")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val table = new MergeTable(merges.toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.applyToSyms(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeMerges", table, "graft.functions.BpeKernels.MergeTable")
      nullSafeCodeGen(ctx, ev, arr => s"""
        ${ev.value} = $ref.applyToSyms($arr);
        ${ev.isNull} = (${ev.value} == null);""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-word initial symbol array (the trainer's vocabulary init) as a
    * Catalyst expression — code-point split, or byte-level GPT-2 symbols. */
  case class BpeInit(child: Expression, byteLevel: Boolean)
      extends UnaryExpression {
    override def prettyName: String = "graft_bpe_init"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val table = new MergeTable(Array.empty, byteLevel)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.initSyms(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeInit", table, "graft.functions.BpeKernels.MergeTable")
      nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.initSyms($s);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Invert the byte-level symbol mapping over a string (token concat ->
    * original text) as a Catalyst expression — the roundtrip oracle's
    * decode side. */
  case class BpeByteDecode(child: Expression) extends UnaryExpression {
    override def prettyName: String = "graft_bpe_byte_decode"
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    @transient private lazy val table = new MergeTable(Array.empty, byteLevel = true)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.byteDecode(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeDecode", table, "graft.functions.BpeKernels.MergeTable")
      nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.byteDecode($s);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: BPE token array for a string column. */
  def encode(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    GraftSql.column(BpeEncode(GraftSql.expression(text), merges, byteLevel))

  /** Column API: fold `merges` (in order) over an array<string> symbol column. */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    GraftSql.column(BpeApply(GraftSql.expression(syms), merges))

  /** Column API: initial per-word symbol array. */
  def initSyms(word: Column, byteLevel: Boolean): Column =
    GraftSql.column(BpeInit(GraftSql.expression(word), byteLevel))

  /** Column API: byte-level symbol decode (inverse of the byte mapping). */
  def byteDecode(s: Column): Column =
    GraftSql.column(BpeByteDecode(GraftSql.expression(s)))
}
