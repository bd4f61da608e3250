package graft.columns

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.seed.Seeds

/** Ipsum-lorem text generation as pure Column expressions.
  *
  * The reference builds this with numpy masked arrays inside a pandas UDF
  * (dbldatagen/text_generators.py:996-1257). Here candidate words are hash
  * picks — four per xxhash64 draw via base-63 digit extraction — and
  * paragraph/sentence/word counts come from bounded hash draws; assembly is
  * array/slice/array_join — fully codegen'd. Expression size is bounded by
  * maxP*maxS*maxW (validated <= 6000).
  */
object ILTextCompiler {

  val LoremWords: Seq[String] = Seq(
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing", "elit",
    "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore", "et",
    "dolore", "magna", "aliqua", "enim", "ad", "minim", "veniam", "quis",
    "nostrud", "exercitation", "ullamco", "laboris", "nisi", "aliquip", "ex", "ea",
    "commodo", "consequat", "duis", "aute", "irure", "in", "reprehenderit",
    "voluptate", "velit", "esse", "cillum", "eu", "fugiat", "nulla", "pariatur",
    "excepteur", "sint", "occaecat", "cupidatat", "non", "proident", "sunt",
    "culpa", "qui", "officia", "deserunt", "mollit", "anim", "id", "est",
    "laborum")

  private def boundedCount(lo: Int, hi: Int, seed: Long, id: Column): Column =
    if (hi <= lo) lit(lo)
    else (pmod(Seeds.cellSeed(seed, id), lit((hi - lo + 1).toLong)) + lit(lo.toLong)).cast(IntegerType)

  /** Word picks extracted per 64-bit draw: one xxhash64 yields WordsPerDraw
    * base-63 digits (63^4 < 2^24, so the digit arithmetic is exact in long
    * AND in the double division below). Batching cuts the dominant cost of
    * wide configs — the per-word xxhash64 call and its ~200 bytes of
    * generated code — by 4x; the leftover per-word work is a division, a
    * pmod and an array lookup. */
  private val WordsPerDraw = 4

  def compile(paragraphs: (Int, Int), sentences: (Int, Int), words: (Int, Int),
      columnSeed: Long, id: Column): Column = {
    val (pLo, pHi) = paragraphs; val (sLo, sHi) = sentences; val (wLo, wHi) = words
    require(pLo >= 1 && sLo >= 1 && wLo >= 1 && pHi >= pLo && sHi >= sLo && wHi >= wLo,
      "ILText bounds must be >= 1 and ordered")
    require(pHi.toLong * sHi * wHi <= 6000,
      s"ILText maxParagraphs*maxSentences*maxWords = ${pHi * sHi * wHi} exceeds 6000 (plan-size guard)")

    val wordArr = typedLit(LoremWords)
    val n = LoremWords.length.toLong

    def sentence(seed: Long): Column = {
      val nDraws = (wHi + WordsPerDraw - 1) / WordsPerDraw
      val picks = (0 until nDraws).flatMap { g =>
        // One hash per WordsPerDraw words; the shared draw Column is a
        // common subexpression, so codegen evaluates it once per group.
        val draw = pmod(Seeds.cellSeed(Seeds.subSeed(seed, g), id),
          lit(math.pow(n.toDouble, WordsPerDraw.toDouble).toLong))
        (0 until WordsPerDraw).map { j =>
          val divisor = math.pow(n.toDouble, j.toDouble).toLong
          // (draw / 63^j) % 63 — positive longs < 2^24, so the double
          // division + truncating cast IS integer division here.
          val idx = pmod((draw / lit(divisor)).cast("long"), lit(n)).cast(IntegerType)
          element_at(wordArr, idx + lit(1))
        }
      }.take(wHi)
      val nWords = boundedCount(wLo, wHi, seed ^ 0x77, id)
      val s = array_join(slice(array(picks: _*), lit(1), nWords), " ")
      // Capitalize first letter, terminate with '.'
      concat(upper(s.substr(lit(1), lit(1))), s.substr(lit(2), length(s)), lit("."))
    }

    def paragraph(seed: Long): Column = {
      val sents = (0 until sHi).map(k => sentence(Seeds.subSeed(seed, k)))
      val nSents = boundedCount(sLo, sHi, seed ^ 0x7777, id)
      array_join(slice(array(sents: _*), lit(1), nSents), " ")
    }

    val paras = (0 until pHi).map(k => paragraph(Seeds.subSeed(columnSeed, 100 + k)))
    val nParas = boundedCount(pLo, pHi, columnSeed ^ 0x777777, id)
    array_join(slice(array(paras: _*), lit(1), nParas), "\n\n")
  }
}
