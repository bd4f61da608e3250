package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

class TokenBudgetSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("token-budget-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus = {
    import spark.implicits._
    (0 until 500).map(i => (i.toLong, 1L + (i * 37 % 100))).toDF("id", "n_tok")
  }

  /** The prefix-stop oracle computed by hand over the same hash order. */
  private def oracle(budget: Long): (Set[Long], Long) = {
    val rows = corpus.withColumn("u",
      Sampling.hashFraction(Seq(col("id")), 42L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._3, r._1))
    var cum = 0L
    val sel = Set.newBuilder[Long]
    var stopped = false
    rows.foreach { case (id, t, _) =>
      if (!stopped) {
        if (cum + t > budget) stopped = true
        else { cum += t; sel += id }
      }
    }
    (sel.result(), cum)
  }

  test("selection equals the hand prefix-stop oracle and respects the budget") {
    for (budget <- Seq(0L, 500L, 5000L, 12000L)) {
      val got = Sampling.sampleTokenBudget(corpus, Seq("id"), "n_tok", budget)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val (expIds, expTok) = oracle(budget)
      assert(got.map(_._1).toSet == expIds, s"budget $budget")
      assert(got.map(_._2).sum == expTok && expTok <= budget, s"budget $budget")
    }
  }

  test("whole corpus when the budget covers it; monotone in budget; repartition-stable") {
    val total = corpus.agg(sum("n_tok")).collect()(0).getLong(0)
    assert(Sampling.sampleTokenBudget(corpus, Seq("id"), "n_tok", total).count() == 500L)
    val small = Sampling.sampleTokenBudget(corpus, Seq("id"), "n_tok", 3000L)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.sampleTokenBudget(corpus, Seq("id"), "n_tok", 9000L)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big) && small.size < big.size)
    val re = Sampling.sampleTokenBudget(corpus.repartition(7), Seq("id"),
      "n_tok", 9000L).collect().map(_.getLong(0)).toSet
    assert(re == big)
  }

  test("few buckets still give the exact prefix; nulls dropped; negatives fail") {
    import spark.implicits._
    val got = Sampling.sampleTokenBudget(corpus, Seq("id"), "n_tok", 5000L,
      buckets = 3).collect().map(_.getLong(0)).toSet
    assert(got == oracle(5000L)._1)
    val withNull = corpus.union(
      Seq((9999L, null.asInstanceOf[java.lang.Long])).toDF("id", "n_tok")
        .select(col("id"), col("n_tok").cast("long")))
    val sel = Sampling.sampleTokenBudget(withNull, Seq("id"), "n_tok", 5000L)
      .collect().map(_.getLong(0)).toSet
    assert(!sel.contains(9999L) && sel == oracle(5000L)._1)
    val neg = Seq((1L, -5L)).toDF("id", "n_tok")
    intercept[Exception] {
      Sampling.sampleTokenBudget(neg, Seq("id"), "n_tok", 10L).collect()
    }
  }

  test("mixByTokenBudget tags sources and budgets each independently") {
    import spark.implicits._
    val a = (0 until 100).map(i => (i.toLong, 10L)).toDF("id", "n_tok")
    val b = (0 until 100).map(i => (i.toLong + 1000, 10L)).toDF("id", "n_tok")
    val mixed = Sampling.mixByTokenBudget(
      Seq(("a", a, 200L), ("b", b, 500L)), Seq("id"), "n_tok")
    val counts = mixed.groupBy("mix_source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 200L && counts("b") == 500L)
  }
}
