package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL interchange roundtrip + the shared sentence-segmentation rule. */
class InterchangeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jsonl: lossless roundtrip incl. unicode, nulls, arrays, doubles") {
    val df = Seq(
      (1L, "héllo wörld 😀", Seq("a", "b"), 1.5, true),
      (2L, "line\nbreak \"quoted\" \\slash", Seq.empty[String], -0.25, false),
      (3L, null.asInstanceOf[String], null.asInstanceOf[Seq[String]], 0.0, true))
      .toDF("id", "text", "tags", "score", "flag")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
    try {
      val path = dir.resolve("out").toString
      graft.io.TextIo.writeJsonl(df, path, compression = "gzip", partitions = 2)
      val back = graft.io.TextIo.readJsonl(spark, path, df.schema)
      assert(back.count() === 3)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
      // Exploration reader sees the same rows (schema may widen).
      assert(graft.io.TextIo.readJsonlInferred(spark, path).count() === 3)
      // Gzip shards actually written.
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".json.gz"))
      assert(files.length === 2)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("sentences: terminator runs, unterminated tail, drops, indexing") {
    val df = Seq(
      (1L, "Hi! How are you? Good"),
      (2L, "..."),                 // terminator-only: no sentence
      (3L, "One... two!   "),      // "..." folds into one terminator run;
                                   // trailing whitespace-only match drops
                                   // leaving an index gap
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.sentences(df, "doc_id", "text")
      .orderBy("doc_id", "sent_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 0, "Hi!"), (1L, 1, "How are you?"), (1L, 2, "Good"),
      (3L, 0, "One..."), (3L, 1, "two!")))
  }
}
