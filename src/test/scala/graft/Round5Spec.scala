package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Generator
import graft.io.PlanJson
import graft.llm.Similarity
import graft.spec._

/** Round-5 component tests: the generic-id / fail-fast contract of the
  * exact cosine harness (ADVICE r4 #1 and #4), and the legacy random=True
  * column mode (the last missing SURVEY §2.2 row). */
class Round5Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randomPlan(method: RandomSeedMethod) = DataGenPlan(Seq(TableSpec(
    "t", 5000, Seq(
      ColumnSpec("pk", "bigint", ColumnStrategy.Sequence(0, 1)),
      ColumnSpec("r", "bigint", ColumnStrategy.Range(0, 999, Some(BigDecimal(1))))
        .copy(random = true)),
    partitions = Some(4))), 7L, method)

  test("random mode: arbitrary seed method differs across builds") {
    def vals = Generator.generate(spark, randomPlan(RandomSeedMethod.Arbitrary))("t")
      .orderBy("pk").collect().map(_.getLong(1)).toSeq
    assert(vals != vals, "two rand() builds agreeing on all 5000 rows is a seed collision")
  }

  test("random mode: fixed seed method is repeatable and in-bounds") {
    def vals = Generator.generate(spark, randomPlan(RandomSeedMethod.Fixed))("t")
      .orderBy("pk").collect().map(_.getLong(1)).toSeq
    val a = vals
    assert(a === vals)
    assert(a.forall(v => v >= 0 && v <= 999))
    assert(a.distinct.length > 500, "5000 draws over 1000 values must spread")
  }

  test("random mode: distribution shaping still applies to random columns") {
    // A Zipf random column must still favor low indexes: value 0's share
    // dwarfs a mid-lattice value's share.
    val plan = DataGenPlan(Seq(TableSpec("t", 20000, Seq(
      ColumnSpec("z", "bigint", ColumnStrategy.Range(0, 99, Some(BigDecimal(1)),
        distribution = Distribution.Zipf(1.5))).copy(random = true)),
      partitions = Some(4))), 7L)
    val counts = Generator.generate(spark, plan)("t")
      .groupBy("z").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(0L, 0L) > 10 * counts.getOrElse(50L, 0L).max(1))
  }

  test("random mode and seed method round-trip through plan JSON") {
    val plan = randomPlan(RandomSeedMethod.Fixed)
    val back = PlanJson.loadJson(PlanJson.saveJson(plan))
    assert(back === plan)
    val defaulted = PlanJson.loadJson(PlanJson.saveJson(randomPlan(RandomSeedMethod.HashFieldName)))
    assert(defaulted.randomSeedMethod === RandomSeedMethod.HashFieldName)
    assert(defaulted.tables.head.columns.map(_.random) === Seq(false, true))
  }

  test("exactCosinePairs: string ids pair lexicographically and survive intact") {
    val df = Seq(
      ("doc-b", Array(1.0, 0.0)),
      ("doc-a", Array(1.0, 0.0)),
      ("doc-c", Array(0.0, 1.0))).toDF("doc_id", "emb")
    val got = Dedup5TestUtil.sortedPairs(
      Similarity.exactCosinePairs(df, "doc_id", "emb", threshold = 0.99))
    assert(got === Seq(("doc-a", "doc-b", 1.0)))
  }

  test("exactCosinePairs: long ids unchanged (regression vs the cast-based path)") {
    val df = Seq(
      (3L, Array(1.0, 1.0)),
      (1L, Array(1.0, 0.0)),
      (2L, Array(2.0, 0.0))).toDF("id", "emb")
    val got = Similarity.exactCosinePairs(df, "id", "emb", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(math.abs(got.head._3 - 1.0) < 1e-12)
    // id_a < id_b strictly — no self pairs, no reversed duplicates.
    assert(got.forall(p => p._1 < p._2))
  }

  test("exactCosinePairs: duplicate ids fail fast instead of emitting ambiguous pairs") {
    val df = Seq((1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("id", "emb")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactCosinePairs(df, "id", "emb", threshold = 0.0)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("exactCosinePairs: ragged vector dimensions fail fast, not truncated dot") {
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0, 0.0))).toDF("id", "emb")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactCosinePairs(df, "id", "emb", threshold = 0.0)
    }
    assert(e.getMessage.contains("dimension"))
  }

  test("exactCosinePairs: row guard still rejects oversized corpora") {
    val df = (1L to 10L).map(i => (i, Array(i.toDouble))).toDF("id", "emb")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactCosinePairs(df, "id", "emb", threshold = 0.0, maxRows = 5)
    }
    assert(e.getMessage.contains("maxRows"))
  }
}

private object Dedup5TestUtil {
  def sortedPairs(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
}
