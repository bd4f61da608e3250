package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analyzer.DataAnalyzer

/** Round-8 component tests: analyzer summary null semantics + the split
  * exact-distinct aggregation pass. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("summarizeToDF emits real nulls, never the string \"null\"") {
    // Spark's format_string renders a null argument as the literal text
    // "null" (printf semantics) — regression guard for the r7 quartile cells
    // on non-numeric and all-null columns.
    val df = Seq(
      (1L, Some(2.0), "a"),
      (2L, None: Option[Double], "b"),
      (3L, None: Option[Double], "c")
    ).toDF("k", "allmost_null", "s")
      .withColumn("all_null", lit(null).cast("double"))
    for (exact <- Seq(true, false)) {
      val rows = DataAnalyzer.summarizeToDF(df, exact = exact).collect()
      rows.foreach { r =>
        (1 until r.length).foreach { i =>
          assert(r.get(i) != "null",
            s"measure ${r.getString(0)} col $i leaked the string \"null\" (exact=$exact)")
        }
      }
      // String column has no quartiles/mean/stddev: must be real nulls.
      val meas = rows.map(r => r.getString(0) -> r).toMap
      for (m <- Seq("mean", "stddev", "p25", "p50", "p75")) {
        assert(meas(m).isNullAt(3), s"$m(s) should be null (exact=$exact)")
        assert(meas(m).isNullAt(4), s"$m(all_null) should be null (exact=$exact)")
      }
    }
  }

  test("exact and approx summarize agree on exact-computable measures") {
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("m"), concat(lit("v"), col("id") % 3).as("s"))
    val ex = DataAnalyzer.summarizeToDF(df, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    // distinct_count comes from the dedicated second pass in exact mode.
    assert(ex("distinct_count").getString(1) == "1000")
    assert(ex("distinct_count").getString(2) == "7")
    assert(ex("distinct_count").getString(3) == "3")
    assert(ex("count").getString(1) == "1000")
    assert(ex("p50").getString(2) == "3.000000")
    assert(ex("mean").getString(1) == "499.500000")
  }
}
