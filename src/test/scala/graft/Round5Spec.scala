package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Round-5 component tests: the generic-id / fail-fast contract of the
  * exact cosine harness (ADVICE r4 #1 and #4). */
class Round5Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

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
