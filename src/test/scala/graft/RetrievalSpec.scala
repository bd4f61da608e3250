package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Retrieval

/** BM25 retrieval: hand-computed scores on a three-doc corpus, ranking
  * semantics, and the index frames' contents. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"), (2L, "a c"), (3L, "b b b c")).toDF("id", "text")

  test("buildIndex: tf/dl/df/avgdl exactly") {
    val idx = Retrieval.buildIndex(docs, "id", "text")
    assert(idx.nDocs === 3L)
    assert(idx.avgdl === 3.0)
    val tf = idx.tf.collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(tf === Map((1L, "a") -> 2L, (1L, "b") -> 1L, (2L, "a") -> 1L,
      (2L, "c") -> 1L, (3L, "b") -> 3L, (3L, "c") -> 1L))
    val df = idx.df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(df === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("scores: hand-computed BM25 (k1=1.2, b=0.75)") {
    // idf(t) = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6) for every term here.
    // Query "a c":
    //   d1 (a: tf=2, dl=3): 2*2.2/(2 + 1.2*1.0)         = 1.375
    //   d2 (a,c: tf=1, dl=2): 2 * 2.2/(1 + 1.2*(0.25+0.5)) = 2*2.2/1.9
    //   d3 (c: tf=1, dl=4): 2.2/(1 + 1.2*(0.25+1.0))    = 2.2/2.5 = 0.88
    val idx = Retrieval.buildIndex(docs, "id", "text")
    val qs = Seq((10L, "a c")).toDF("qid", "qtext")
    val got = Retrieval.scores(idx, qs, "qid", "qtext")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val idf = math.log(1.6)
    assert(math.abs(got(1L) - idf * 1.375) < 1e-12)
    assert(math.abs(got(2L) - 2 * idf * 2.2 / 1.9) < 1e-12)
    assert(math.abs(got(3L) - idf * 2.2 / 2.5) < 1e-12)
  }

  test("topK: rank order, tie-break by doc id, k cutoff") {
    val idx = Retrieval.buildIndex(docs, "id", "text")
    val qs = Seq((10L, "a c")).toDF("qid", "qtext")
    val top2 = Retrieval.topK(idx, qs, "qid", "qtext", k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    // d2 scores highest (both terms), then d1.
    assert(top2.toSeq === Seq((2L, 1), (1L, 2)))
    // Exact-duplicate docs score identically -> tie-break by id.
    val dup = Seq((1L, "x y"), (2L, "x y"), (3L, "z")).toDF("id", "text")
    val idx2 = Retrieval.buildIndex(dup, "id", "text")
    val t = Retrieval.topK(idx2, Seq((1L, "x")).toDF("qid", "qtext"),
      "qid", "qtext", k = 2).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(t.toSeq === Seq((1L, 1), (2L, 2)))
  }

  test("buildAndWriteIndex/loadIndex: persisted index scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_spec")
    try {
      val written = Retrieval.buildAndWriteIndex(docs, "id", "text",
        dir.toString)
      val loaded = Retrieval.loadIndex(spark, dir.toString)
      assert(loaded.nDocs === 3L && loaded.avgdl === 3.0)
      val qs = Seq((10L, "a c")).toDF("qid", "qtext")
      val mem = Retrieval.scores(Retrieval.buildIndex(docs, "id", "text"),
        qs, "qid", "qtext").collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
      val fromWritten = Retrieval.scores(written, qs, "qid", "qtext")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
      val fromLoaded = Retrieval.scores(loaded, qs, "qid", "qtext")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
      assert(fromWritten === mem && fromLoaded === mem)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("rrfFuse: hand-computed fusion, missing docs, tie-break") {
    // Ranking A: d1@1, d2@2. Ranking B: d2@1, d3@2.
    val a = Seq((1L, 1L, 1), (1L, 2L, 2)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 2L, 1), (1L, 3L, 2)).toDF("q_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3, rrfK = 60)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // d2: 1/62 + 1/61 wins; d1: 1/61; d3: 1/62 — d1 beats d3.
    assert(got.map(_._1).toSeq === Seq(2L, 1L, 3L))
    assert(math.abs(got(0)._2 - (1.0 / 62 + 1.0 / 61)) === 0.0)
    assert(got(1)._2 === 1.0 / 61 && got(2)._2 === 1.0 / 62)
    // Equal contributions tie-break by doc id.
    val t1 = Seq((1L, 9L, 1), (1L, 4L, 1)).toDF("q_id", "doc_id", "rank")
    val tied = Retrieval.rrfFuse(Seq(t1), k = 2).orderBy("rank")
      .collect().map(_.getLong(1))
    assert(tied.toSeq === Seq(4L, 9L))
  }

  test("queries with no matching terms return no candidates; empty index refused") {
    val idx = Retrieval.buildIndex(docs, "id", "text")
    val none = Retrieval.scores(idx,
      Seq((1L, "zzz qqq")).toDF("qid", "qtext"), "qid", "qtext")
    assert(none.count() === 0)
    val empty = Retrieval.buildIndex(
      Seq.empty[(Long, String)].toDF("id", "text"), "id", "text")
    intercept[IllegalArgumentException](
      Retrieval.scores(empty, Seq((1L, "a")).toDF("qid", "qtext"),
        "qid", "qtext"))
  }
}
