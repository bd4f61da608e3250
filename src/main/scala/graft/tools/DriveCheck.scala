package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end drive for the round-12 ADVICE fixes (verify skill
  * recipe): exercises the changed public surfaces and prints CHECK lines. */
object DriveCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-drive-check").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Dedup, Multimodal, Similarity}

    val sf = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .where(col("doc_id") < 2000)

    // 1) Bloom guard: streamed build parity with the exact guard.
    val corpus = docs.where(col("doc_id") % 3 === 0)
    val exactIdx = Dedup.minHashBandIndex(corpus, "doc_id", "text")
    val exact = Dedup.streamMinHashGuard(docs, exactIdx, "text")
      .where(col("nd_candidate")).select("doc_id")
    val bloomed = Dedup.streamMinHashGuardBloom(docs, corpus, "doc_id", "text")
      .where(col("nd_candidate")).select("doc_id")
    val missed = exact.exceptAll(bloomed).count() // bloom has NO false negatives
    val extra = bloomed.exceptAll(exact).count()  // FPs allowed (expect ~0 at 20 bits)
    println(s"CHECK bloom_guard_false_negatives=$missed (want 0) false_positives=$extra")

    // 2) Truncated stss: claims 1000 sync samples but carries none → the
    //    bound check must leave keyframe_count at the all-sync fallback
    //    rather than trusting the count.
    val good = Multimodal.encodeMp4Stub(600, 1200, Seq((640, 360)),
      frameSizes = Seq(100, 200, 300), syncSamples = Seq(1))
    // corrupt: patch the stss entry_count field to 1000 (find box by tag)
    def patchStssCount(mp4: Array[Byte], cnt: Int): Array[Byte] = {
      val out = mp4.clone()
      val tag = "stss".getBytes("ISO-8859-1")
      val at = out.indices.dropRight(3).find(i =>
        out(i) == tag(0) && out(i + 1) == tag(1) && out(i + 2) == tag(2) && out(i + 3) == tag(3)).get
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(at + 8, cnt) // after tag: ver/flags(4) then entry_count
      out
    }
    val bad = patchStssCount(good, 1000)
    val vids = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(good: Any), org.apache.spark.sql.Row(bad: Any)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.BinaryType))))
    val parsed = Multimodal.decodeVideoMeta(vids, "v")
      .select(col("decoded_video.frame_count"), col("decoded_video.keyframe_count"))
      .collect()
    println(s"CHECK stss_good=${parsed(0)} stss_truncated=${parsed(1)} (truncated must NOT report 1000)")

    // 3) probeIvfPqIndex: single collect path + isin skip when cells cover
    //    the index. Small corpus, tiny nCentroids so queries probe all cells.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      .limit(800)
    val (indexed, meta) = Similarity.buildIvfPqIndex(emb, "id", "vec",
      nCentroids = 4, m = 4, ksub = 16, refineIterations = 1)
    val raw = emb.select(col("id").as("neighbor_id"), col("vec").cast("array<double>").as("cv"))
    val queries = emb.limit(40).select(col("id").as("qid"), col("vec"))
    val top = Similarity.probeIvfPqIndex(indexed, meta, raw, queries, "qid", "vec",
      k = 5, nProbe = 4)
    println(s"CHECK ivfpq_probe_rows=${top.count()} (want 200 = 40 queries x k=5)")

    spark.stop()
  }
}
