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

/** Fused lattice kernels for the unigram-LM tokenizer
  * ([[graft.llm.UnigramLm]] — the SentencePiece unigram model, Kudo,
  * ACL 2018): every piece has an independent log-probability, a word's
  * likelihood marginalizes over ALL segmentations, and encoding picks the
  * max-probability one.
  *
  * Both kernels run per DISTINCT WORD (E-step) or per row (encode) with
  * the piece vocabulary shipped once per plan as a codegen reference
  * object — the [[PqKernels.Codebook]] pattern. Per-word cost is
  * O(len × maxPieceLen) lattice edges; no shuffle, no driver involvement.
  *
  *  - [[UnigramExpected]]: word → `array<struct<id int, c double>>` of
  *    posterior expected piece counts (forward-backward in log space)
  *    PLUS one sentinel entry `id = -1` whose `c` is the word's total
  *    log-likelihood `log P(word)` — so one exploded hash-aggregate
  *    drives both the M-step numerators and the EM objective trace.
  *  - [[UnigramEncode]]: text → `array<string>` best-segmentation pieces
  *    (Viterbi per whitespace word, same word rule as the BPE trainer:
  *    `split(trim(lower(text)), "\s+")`). Characters outside the
  *    vocabulary surface as single-char pieces with a flat penalty
  *    (encode is TOTAL on arbitrary text; the penalty keeps known pieces
  *    preferred).
  *
  * Null text → null. A word with no in-vocab segmentation contributes
  * nothing to the E-step (its posterior is undefined — the trainer's
  * seed rule of force-keeping every single character makes this
  * unreachable on training data).
  */
object UnigramKernels {

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val NegInf = Double.NegativeInfinity
  /** Flat per-character penalty for out-of-vocabulary characters in
    * Viterbi (well below any trained piece's log-prob). */
  val UnkLogP: Double = -30.0

  /** Piece vocabulary: parallel piece/logp arrays + a hash index. */
  final class PieceTable(val pieces: Array[String], val logps: Array[Double])
      extends Serializable {
    require(pieces.length == logps.length,
      s"pieces/logps length mismatch: ${pieces.length} vs ${logps.length}")
    val maxLen: Int = if (pieces.isEmpty) 0 else pieces.map(_.length).max
    private val index = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
      m
    }
    def idOf(s: String): Int = {
      val v = index.get(s)
      if (v == null) -1 else v.intValue()
    }

    private def logsumexp(a: Double, b: Double): Double =
      if (a == NegInf) b
      else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))

    /** Forward-backward posterior expected counts over one word's
      * segmentation lattice; appends the `(-1, log P(word))` sentinel.
      * Returns null rows = word unsegmentable under this vocab. */
    def expectedCounts(word: String): Array[(Int, Double)] = {
      val L = word.length
      if (L == 0) return Array((-1, 0.0))
      // Edge cache: edgeId(j)(k) = piece id of word[j, j+k+1), -1 if absent.
      val alpha = new Array[Double](L + 1)
      val beta = new Array[Double](L + 1)
      java.util.Arrays.fill(alpha, NegInf); alpha(0) = 0.0
      java.util.Arrays.fill(beta, NegInf); beta(L) = 0.0
      val edgeIds = new Array[Array[Int]](L)
      var j = 0
      while (j < L) {
        val lim = math.min(maxLen, L - j)
        val row = new Array[Int](lim)
        var k = 0
        while (k < lim) {
          row(k) = idOf(word.substring(j, j + k + 1))
          k += 1
        }
        edgeIds(j) = row
        j += 1
      }
      var i = 1
      while (i <= L) {
        var s = math.max(0, i - maxLen)
        while (s < i) {
          val id = edgeIds(s)(i - s - 1)
          if (id >= 0 && alpha(s) != NegInf)
            alpha(i) = logsumexp(alpha(i), alpha(s) + logps(id))
          s += 1
        }
        i += 1
      }
      if (alpha(L) == NegInf) return null
      j = L - 1
      while (j >= 0) {
        val lim = math.min(maxLen, L - j)
        var k = 0
        while (k < lim) {
          val id = edgeIds(j)(k)
          if (id >= 0 && beta(j + k + 1) != NegInf)
            beta(j) = logsumexp(beta(j), logps(id) + beta(j + k + 1))
          k += 1
        }
        j -= 1
      }
      val acc = new java.util.HashMap[Integer, java.lang.Double]()
      j = 0
      while (j < L) {
        val lim = math.min(maxLen, L - j)
        var k = 0
        while (k < lim) {
          val id = edgeIds(j)(k)
          if (id >= 0 && alpha(j) != NegInf && beta(j + k + 1) != NegInf) {
            val post = math.exp(alpha(j) + logps(id) + beta(j + k + 1) - alpha(L))
            if (post > 0) {
              val key = Integer.valueOf(id)
              val prev = acc.get(key)
              acc.put(key, if (prev == null) post else prev + post)
            }
          }
          k += 1
        }
        j += 1
      }
      val out = new Array[(Int, Double)](acc.size() + 1)
      val it = acc.entrySet().iterator()
      var n = 0
      while (it.hasNext) {
        val e = it.next()
        out(n) = (e.getKey.intValue(), e.getValue.doubleValue())
        n += 1
      }
      // Sentinel: the word's log-likelihood, for the EM objective trace.
      out(n) = (-1, alpha(L))
      // Deterministic output order (HashMap iteration is not).
      scala.util.Sorting.stableSort(out,
        (a: (Int, Double), b: (Int, Double)) => a._1 < b._1)
      out
    }

    /** Viterbi best segmentation of one word; OOV characters become
      * single-char pieces at [[UnkLogP]]. Ties resolve to the LONGEST
      * final piece (strict `>` scanning piece starts in ascending order,
      * so the last — longest-reaching — equal-score edge wins via `>=`
      * ... we use strictly-greater with descending start scan for a fixed
      * rule: see loop). */
    def viterbi(word: String): Array[String] = {
      val L = word.length
      if (L == 0) return Array.empty
      val best = new Array[Double](L + 1)
      val back = new Array[Int](L + 1) // start index of the winning piece
      java.util.Arrays.fill(best, NegInf); best(0) = 0.0
      java.util.Arrays.fill(back, -1)
      var i = 1
      while (i <= L) {
        // Ascending start = descending piece length; strict '>' therefore
        // prefers the LONGEST piece among equal scores. OOV single char
        // is the fallback edge.
        var s = math.max(0, i - math.max(maxLen, 1))
        while (s < i) {
          val piece = word.substring(s, i)
          val id = idOf(piece)
          val lp =
            if (id >= 0) logps(id)
            else if (i - s == 1) UnkLogP
            else NegInf
          if (lp != NegInf && best(s) != NegInf && best(s) + lp > best(i)) {
            best(i) = best(s) + lp
            back(i) = s
          }
          s += 1
        }
        i += 1
      }
      var cuts = List(L)
      var p = L
      while (p > 0) { p = back(p); cuts = p :: cuts }
      cuts.zip(cuts.tail).map { case (a, b) => word.substring(a, b) }.toArray
    }

    /** All pieces of the whole text, word by word. */
    def encode(text: UTF8String): ArrayData = {
      val toks = WsPattern.split(text.trim().toLowerCase.toString, -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty)
          viterbi(toks(i)).foreach(p => out += UTF8String.fromString(p))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  private val expectedType: ArrayType = ArrayType(StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("c", DoubleType, nullable = false))), containsNull = false)

  case class UnigramExpected(child: Expression, pieceSeq: Seq[String],
      logpSeq: Seq[Double]) extends UnaryExpression {
    override def prettyName: String = "graft_unigram_expected"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"pieces[${pieceSeq.length}]", s"logp[${logpSeq.length}]")
    override def dataType: DataType = expectedType
    override def nullable: Boolean = true

    @transient private lazy val table =
      new PieceTable(pieceSeq.toArray, logpSeq.toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      UnigramKernels.expectedEval(table, input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        "graft.functions.UnigramKernels.PieceTable")
      val tmp = ctx.freshName("uniExp")
      nullSafeCodeGen(ctx, ev, str => s"""
        org.apache.spark.sql.catalyst.util.ArrayData $tmp =
          graft.functions.UnigramKernels.expectedEval($ref, $str);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp; }""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Eval bridge shared by interpreted + generated paths. */
  def expectedEval(table: PieceTable, word: UTF8String): ArrayData = {
    val pairs = table.expectedCounts(word.toString)
    if (pairs == null) null
    else new GenericArrayData(
      pairs.map(p => InternalRow(p._1, p._2): Any))
  }

  case class UnigramEncode(child: Expression, pieceSeq: Seq[String],
      logpSeq: Seq[Double]) extends UnaryExpression {
    override def prettyName: String = "graft_unigram_encode"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"pieces[${pieceSeq.length}]", s"logp[${logpSeq.length}]")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    @transient private lazy val table =
      new PieceTable(pieceSeq.toArray, logpSeq.toArray)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      table.encode(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        "graft.functions.UnigramKernels.PieceTable")
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = $ref.encode($str);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: posterior expected piece counts + loglik sentinel for a
    * WORD column (E-step; run over the distinct-word table). */
  def expected(word: Column, pieces: Array[String], logps: Array[Double]): Column =
    GraftSql.column(UnigramExpected(GraftSql.expression(word),
      pieces.toSeq, logps.toSeq))

  /** Column API: Viterbi piece array (`array<string>`) for a TEXT column. */
  def encode(text: Column, pieces: Array[String], logps: Array[Double]): Column =
    GraftSql.column(UnigramEncode(GraftSql.expression(text),
      pieces.toSeq, logps.toSeq))
}
