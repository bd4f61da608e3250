package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.UnigramKernels
import graft.llm.UnigramLm

/** Unigram-LM tokenizer: lattice math (hand-checked forward-backward),
  * Viterbi contract, EM training invariants, persistence. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("forward-backward posterior matches the hand computation on {a,b,ab}") {
    val pieces = Array("a", "b", "ab")
    val pa = 0.5; val pb = 0.3; val pab = 0.2
    val t = new UnigramKernels.PieceTable(pieces, Array(pa, pb, pab).map(math.log))
    val out = t.expectedCounts("ab").toMap
    // P(word) = p(ab) + p(a)p(b); posterior of [ab] = p(ab)/P.
    val pWord = pab + pa * pb
    assert(math.abs(out(-1) - math.log(pWord)) < 1e-12)
    assert(math.abs(out(2) - pab / pWord) < 1e-12)
    assert(math.abs(out(0) - pa * pb / pWord) < 1e-12)
    assert(math.abs(out(1) - pa * pb / pWord) < 1e-12)
    // Unsegmentable word -> null (no 'c' piece).
    assert(t.expectedCounts("ac") === null)
    // Empty word -> just the sentinel with loglik 0.
    assert(t.expectedCounts("").toMap === Map(-1 -> 0.0))
  }

  test("viterbi: best path, longest-piece tie-break, OOV fallback") {
    val t = new UnigramKernels.PieceTable(
      Array("a", "b", "ab"), Array(0.4, 0.4, 0.19).map(math.log))
    // p(a)p(b) = 0.16 < p(ab) = 0.19 -> single piece wins.
    assert(t.viterbi("ab").toSeq === Seq("ab"))
    val t2 = new UnigramKernels.PieceTable(
      Array("a", "b", "ab"), Array(0.4, 0.5, 0.2).map(math.log))
    // p(a)p(b) = 0.20 = p(ab): exact tie -> LONGEST piece wins.
    assert(t2.viterbi("ab").toSeq === Seq("ab"))
    // OOV char becomes its own piece.
    assert(t.viterbi("axb").toSeq === Seq("a", "x", "b"))
    // Whole-text encode splits words like the BPE rule.
    val enc = Seq(Tuple1("AB  ab\tab")).toDF("text")
      .select(UnigramKernels.encode(col("text"),
        Array("a", "b", "ab"), Array(0.4, 0.4, 0.19).map(math.log)))
      .collect().head.getSeq[String](0)
    assert(enc === Seq("ab", "ab", "ab"))
  }

  test("training: alphabet coverage, normalization, within-stage EM monotonicity") {
    val docs = Seq(
      "spark data spark table", "data table data spark",
      "spark spark table scan", "scan data table spark",
      "table scan scan data").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 20,
      maxPieceLen = 6, seedMultiplier = 4)

    val vocab = m.pieces.map(_.piece).toSet
    // Every corpus character survives.
    val chars = "sparkdatblecn".map(_.toString).toSet
    assert(chars.subsetOf(vocab), s"missing chars: ${chars -- vocab}")
    assert(m.pieces.size <= 20 || vocab.count(_.length == 1) > 20)
    // logsumexp(logps) == 0 (normalized distribution).
    val z = {
      val mx = m.pieces.map(_.logp).max
      mx + math.log(m.pieces.map(p => math.exp(p.logp - mx)).sum)
    }
    assert(math.abs(z) < 1e-9, s"vocab not normalized: logZ=$z")
    // EM monotone within each 2-pass stage (relative tolerance: the
    // 1e-9 count floor in the M-step makes it MLE-up-to-epsilon).
    m.llTrace.grouped(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9 * (1 + math.abs(a)),
        s"EM decreased: $a -> $b")
      case _ => ()
    }
    assert(m.llTrace.last < 0) // a real likelihood

    // Frequent whole words become pieces (the point of the model).
    assert(vocab.contains("spark") || vocab.contains("park"),
      s"no multi-char piece for the most frequent word in $vocab")

    // Encode roundtrips: pieces concatenate back to the word stream.
    val enc = UnigramLm.encode(docs, "text", m)
    val bad = enc.select(col("text"), concat_ws("", col("unigram_tokens")).as("j"))
      .where(col("j") =!= regexp_replace(lower(trim(col("text"))), "\\s+", ""))
      .count()
    assert(bad === 0)
  }

  test("save/load roundtrip preserves the model and its encodings") {
    val docs = Seq((1L, "aa ab ba aa")).toDF("id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 6, maxPieceLen = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram_model")
    val path = dir.resolve("model.json").toString
    try {
      UnigramLm.save(spark, m, path)
      val m2 = UnigramLm.load(spark, path)
      assert(m2.pieces === m.pieces)
      assert(m2.llTrace === m.llTrace)
      val e1 = UnigramLm.encode(docs, "text", m).select("unigram_tokens")
        .collect().head.getSeq[String](0)
      val e2 = UnigramLm.encode(docs, "text", m2).select("unigram_tokens")
        .collect().head.getSeq[String](0)
      assert(e1 === e2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
