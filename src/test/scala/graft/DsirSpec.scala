package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DsirKernels, LogRegKernels}
import graft.llm.Dsir

class DsirSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("dsir-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ngram buckets enumerate every occurrence in reading order") {
    import spark.implicits._
    val dim = 1 << 10
    val row = Seq("the Quick  fox").toDF("t")
      .select(DsirKernels.ngramBuckets(col("t"), dim, 2).as("b"))
      .collect()(0).getSeq[Int](0)
    // 3 unigrams + 2 bigrams, lowercased, whitespace-collapsed.
    val expected = Seq(
      LogRegKernels.hashToBucket("the", 1, dim),
      LogRegKernels.hashToBucket("quick", 1, dim),
      LogRegKernels.hashToBucket("fox", 1, dim),
      LogRegKernels.hashToBucket("the quick", 2, dim),
      LogRegKernels.hashToBucket("quick fox", 2, dim))
    assert(row == expected)
    // Null text -> null; empty text -> empty array.
    val nulls = Seq[(Integer, String)]((1, null), (2, ""), (3, "  ")).toDF("i", "t")
      .select(col("i"), DsirKernels.ngramBuckets(col("t"), dim, 2).as("b"))
      .orderBy("i").collect()
    assert(nulls(0).isNullAt(1))
    assert(nulls(1).getSeq[Int](1).isEmpty)
    assert(nulls(2).getSeq[Int](1).isEmpty)
  }

  test("log-weight kernel equals the hand sum over occurrence buckets") {
    import spark.implicits._
    val dim = 64
    val ratios = Array.tabulate(dim)(i => (i % 7) * 0.25 - 0.5)
    val table = new DsirKernels.LogRatioTable(ratios, 2)
    val text = "a b a"
    val expected = Seq(
      ("a", 1), ("b", 1), ("a", 1), ("a b", 2), ("b a", 2))
      .map { case (g, o) => ratios(LogRegKernels.hashToBucket(g, o, dim)) }.sum
    val got = Seq(text).toDF("t")
      .select(DsirKernels.dsirLogWeight(col("t"), table).as("w"))
      .collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
    // Empty text scores exactly 0; null scores null.
    val edge = Seq[(Integer, String)]((1, ""), (2, null)).toDF("i", "t")
      .select(col("i"), DsirKernels.dsirLogWeight(col("t"), table).as("w"))
      .orderBy("i").collect()
    assert(edge(0).getDouble(1) == 0.0)
    assert(edge(1).isNullAt(1))
  }

  test("bucket log-probs normalize and reflect corpus counts") {
    import spark.implicits._
    val dim = 32
    val df = Seq("x x x", "y").toDF("t")
    val lp = Dsir.bucketLogProbs(df, "t", dim, ngrams = 1, alpha = 1.0)
    assert(lp.length == dim)
    val z = lp.map(math.exp).sum
    assert(math.abs(z - 1.0) < 1e-12, s"sum ${z}")
    val bx = LogRegKernels.hashToBucket("x", 1, dim)
    val by = LogRegKernels.hashToBucket("y", 1, dim)
    // (3+1)/(4+32) vs (1+1)/(4+32).
    assert(math.abs(math.exp(lp(bx)) - 4.0 / 36.0) < 1e-12)
    assert(math.abs(math.exp(lp(by)) - 2.0 / 36.0) < 1e-12)
  }

  test("resampling enriches documents that look like the target") {
    import spark.implicits._
    // Raw: 200 docs, half about "cats" (the target domain), half "rust".
    val raw = (0 until 200).map { i =>
      val marker = if (i % 2 == 0) "cat purr whiskers" else "rust solder gear"
      (i.toLong, s"doc $i common words here $marker $marker")
    }.toDF("id", "text")
    val target = (0 until 20).map(i =>
      (i.toLong, "cat purr whiskers cat purr the cat sat")).toDF("id", "text")

    val picked = Dsir.resampleN(raw, target, "text", Seq("id"), n = 40,
      dim = 1 << 12, ngrams = 2)
    val rows = picked.collect()
    assert(rows.length == 40)
    val catFrac = rows.count(_.getString(1).contains("cat")).toDouble / rows.length
    // Raw is 50% cat docs; the cat-likeness weights must dominate.
    assert(catFrac >= 0.9, s"expected strong enrichment, got $catFrac")
    // Selected rows carry their log-weight, and cat docs outweigh rust docs.
    val wCat = rows.filter(_.getString(1).contains("cat")).map(_.getDouble(2))
    assert(wCat.forall(w => !w.isNaN && !w.isInfinite))

    // Deterministic: a rerun (and a repartitioned rerun) picks the same set.
    val again = Dsir.resampleN(raw.repartition(7), target, "text",
      Seq("id"), n = 40, dim = 1 << 12, ngrams = 2).collect()
    assert(rows.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
  }

  test("gumbelTopK rejects empty keys, drops null weights, caps at n") {
    import spark.implicits._
    val df = Seq((1L, java.lang.Double.valueOf(1.0)),
      (2L, null.asInstanceOf[java.lang.Double]),
      (3L, java.lang.Double.valueOf(0.5))).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Dsir.gumbelTopK(df, Nil, "w", 1)
    }
    val all = Dsir.gumbelTopK(df, Seq("id"), "w", 10).collect()
    assert(all.map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
