package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeKernels
import graft.llm.Bpe

/** Distributed BPE training + fused encode kernel. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train: hand-checkable merge sequence, tie-break, early stop") {
    val docs = Seq("aa ab", "aa aa").toDF("text")
    // Word counts: aa x3, ab x1. Pair counts: (a,a)=3, (a,b)=1.
    val m1 = Bpe.train(docs, "text", numMerges = 5, minPairCount = 2)
    assert(m1.map(m => (m.rank, m.left, m.right, m.count)) === Seq((0, "a", "a", 3L)))
    val m2 = Bpe.train(docs, "text", numMerges = 5, minPairCount = 1)
    assert(m2.map(m => (m.left, m.right, m.count)) === Seq(("a", "a", 3L), ("a", "b", 1L)))

    // Tie-break on (left asc, right asc) at equal counts: "ab ba" has
    // (a,b)=1 and (b,a)=1 -> (a,b) wins rank 0.
    val tie = Bpe.train(Seq("ab ba").toDF("text"), "text", 1, minPairCount = 1)
    assert(tie.head.left === "a" && tie.head.right === "b")
  }

  test("encode kernel: left-to-right non-overlap, roundtrip, whitespace, nulls") {
    val merges = Seq(Bpe.Merge(0, "a", "a", 3), Bpe.Merge(1, "a", "b", 1))
    val df = Seq(
      (1L, "aab"), (2L, "aaa"), (3L, "abab"), (4L, "  Aa\tab  "),
      (5L, ""), (6L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val enc = Bpe.encode(df, "text", merges)
    val got = enc.orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getSeq[String](2).toSeq)
    assert(got(0) === Seq("aa", "b"))
    // Non-overlapping left-to-right: aaa -> [aa, a], the fused token does
    // not re-fuse with the trailing a.
    assert(got(1) === Seq("aa", "a"))
    assert(got(2) === Seq("ab", "ab"))
    // Lowercased + whitespace split: "Aa" and "ab" are separate words.
    assert(got(3) === Seq("aa", "ab"))
    assert(got(4) === Seq.empty)
    assert(got(5) === null)
  }

  test("real corpus: counts non-increasing, roundtrip holds corpus-wide, compression") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 20)
    assert(merges.nonEmpty && merges.length <= 20)
    assert(merges.map(_.rank) === merges.indices)
    // The chosen pair count never increases with rank.
    assert(merges.sliding(2).forall {
      case Seq(a, b) => b.count <= a.count
      case _ => true
    })
    val enc = Bpe.encode(docs, "text", merges)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))

    // Encoding is a narrow fused-kernel projection (parquet scan -> project).
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE encode must stay narrow:\n$plan")
    assert(plan.contains("graft_bpe_encode"))

    val agg = enc.agg(
      sum(when(concat_ws("", col("bpe_tokens")) === col("stripped"), 0L)
        .otherwise(1L)).as("bad_roundtrip"),
      sum(size(col("bpe_tokens"))).as("n_tokens"),
      sum(length(col("stripped"))).as("n_chars")).head
    assert(agg.getLong(0) === 0L, "token concat must reproduce the stripped text")
    assert(agg.getLong(1) < agg.getLong(2), "20 merges must compress the corpus")

    // Vocabulary bound: every emitted token is a char or a learned merge.
    val vocab = enc.select(explode(col("bpe_tokens")).as("t")).where(length(col("t")) > 1)
      .distinct().collect().map(_.getString(0)).toSet
    val learned = merges.map(m => m.left + m.right).toSet
    assert(vocab.subsetOf(learned), s"multi-char tokens beyond learned merges: ${vocab -- learned}")
  }
}
