package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 component tests: mixCorpora epoch replication via explode,
  * the runaway-weight guard, and the decontamination gram-count guard. */
class Round9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mixCorpora replicates full epochs by explode, not plan branches") {
    import graft.llm.Sampling
    val a = (0L until 100L).map(i => (i, "a")).toDF("id", "payload")
    // Weight 50.0: 50 full epochs must come from ONE generator branch.
    val mixed = Sampling.mixCorpora(Seq(("a", a, 50.0)), Seq("id"), seed = 7)
    val nUnions = "Union".r.findAllIn(
      mixed.queryExecution.optimizedPlan.toString).length
    assert(nUnions <= 1, s"expected a single branch, plan had $nUnions unions")
    val counts = mixed.groupBy("mix_epoch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0L until 50L).toSet)
    assert(counts.values.forall(_ == 100L), s"every epoch must be a full copy: $counts")
  }

  test("mixCorpora rejects weights above maxEpochs with the knob named") {
    import graft.llm.Sampling
    val tiny = (0L until 3L).map(i => (i, "x")).toDF("id", "payload")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixCorpora(Seq(("x", tiny, 20000.0)), Seq("id"))
    }
    assert(e.getMessage.contains("maxEpochs"), e.getMessage)
    // Raising the knob makes the same call legal.
    val ok = Sampling.mixCorpora(Seq(("x", tiny, 20000.0)), Seq("id"),
      maxEpochs = 1e6)
    assert(ok.count() === 3L * 20000L)
  }
}
