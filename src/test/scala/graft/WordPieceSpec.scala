package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordPieceKernels
import graft.llm.WordPiece

/** Distributed WordPiece training (likelihood-scored merges) + fused
  * greedy longest-match encode. The training corpus is the classic BPE
  * teaching example (low/lower/newest/widest), whose WordPiece merge
  * sequence differs from BPE's count-ranked one — scores divide by
  * symbol frequencies, so frequent pairs of RARE symbols win first. All
  * expected values below are hand-computed from the weighted pair and
  * symbol counts. */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest").toDF("text")

  test("train: hand-computed likelihood-scored merge sequence") {
    // Word counts: low x5, lower x2, newest x6, widest x3.
    // Symbol counts: l=7 ##o=7 ##w=13 ##e=17 ##r=2 n=6 ##s=9 ##t=9 w=3
    // ##i=3 ##d=3. Top scores: (w,##i)=3/9 ties (##i,##d)=3/9 -> left
    // asc picks ("##i","##d"); then (w,##id)=3/9; then (l,##o)=7/49;
    // then (##s,##t)=9/81.
    val m = WordPiece.train(corpus, "text", numMerges = 4)
    assert(m.merges.map(g => (g.rank, g.left, g.right, g.count)) === Seq(
      (0, "##i", "##d", 3L), (1, "w", "##id", 3L),
      (2, "l", "##o", 7L), (3, "##s", "##t", 9L)))
    assert(m.merges.map(_.fused) === Seq("##id", "wid", "lo", "##st"))
    // Prefix stability: a shorter training run is a prefix.
    val m2 = WordPiece.train(corpus, "text", numMerges = 2)
    assert(m2.merges === m.merges.take(2))
    // Vocabulary: sorted alphabet first, then fused pieces in merge order.
    val alphabet = Seq("##d", "##e", "##i", "##o", "##r", "##s", "##t",
      "##w", "l", "n", "w")
    assert(m.vocab === alphabet ++ Seq("##id", "wid", "lo", "##st"))
  }

  test("train: symbol-disjoint sweeps skip conflicting candidates") {
    // Sweep 0 at sweepSize=2: ("##i","##d") accepted; (w,##i) conflicts
    // on ##i and is skipped; (l,##o) is the next disjoint candidate.
    val m = WordPiece.train(corpus, "text", numMerges = 2, sweepSize = 2)
    assert(m.merges.map(g => (g.left, g.right, g.sweep)) === Seq(
      ("##i", "##d", 0), ("l", "##o", 0)))
  }

  test("encode: greedy longest-match, continuation markers, roundtrip") {
    val m = WordPiece.train(corpus, "text", numMerges = 4)
    val df = Seq((1L, "widest"), (2L, "low"), (3L, "low lower widest"),
      (4L, "  LOW\tnewest  "), (5L, ""), (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = WordPiece.encode(df, "text", m).orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getSeq[String](2).toSeq)
    // "wid" (longest at pos 0) beats w/##id piecewise.
    assert(got(0) === Seq("wid", "##e", "##st"))
    assert(got(1) === Seq("lo", "##w"))
    assert(got(2) === Seq("lo", "##w", "lo", "##w", "##e", "##r",
      "wid", "##e", "##st"))
    // Word rule: lowercased whitespace tokens.
    assert(got(3) === Seq("lo", "##w", "n", "##e", "##w", "##e", "##st"))
    assert(got(4) === Seq.empty)
    assert(got(5) === null)
  }

  test("encode: [UNK] on out-of-alphabet chars and over-long words") {
    val m = WordPiece.train(corpus, "text", numMerges = 4)
    val df = Seq((1L, "zap"), (2L, "low zap low")).toDF("id", "text")
    val got = WordPiece.encode(df, "text", m).orderBy("id").collect()
      .map(_.getSeq[String](2).toSeq)
    assert(got(0) === Seq(WordPieceKernels.UnkToken))
    // All-or-nothing is per WORD, not per text.
    assert(got(1) === Seq("lo", "##w", WordPieceKernels.UnkToken, "lo", "##w"))
    val short = m.copy(maxWordChars = 2)
    val g2 = WordPiece.encode(Seq((1L, "low")).toDF("id", "text"), "text", short)
      .collect()(0).getSeq[String](2).toSeq
    assert(g2 === Seq(WordPieceKernels.UnkToken))
  }

  test("save/load: model roundtrips and encodes identically") {
    val m = WordPiece.train(corpus, "text", numMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_spec")
    try {
      val path = dir.resolve("model.json").toString
      WordPiece.save(spark, m, path)
      val m2 = WordPiece.load(spark, path)
      assert(m2 === m)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("fuse rule: continuation marker survives left, drops right") {
    val t = new WordPieceKernels.WpMergeTable(Array(("##l", "##o")))
    assert(t.fuse("##l", "##o") === "##lo")
    assert(t.fuse("h", "##e") === "he")
  }
}
