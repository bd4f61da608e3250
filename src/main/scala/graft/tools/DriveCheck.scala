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
    //    bound check must report keyframe_count as UNKNOWN (null) rather
    //    than trusting the count or fabricating the all-sync rule.
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
    println(s"CHECK stss_good=${parsed(0)} stss_truncated=${parsed(1)} (truncated: keyframes UNKNOWN -> null, never 1000)")

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

    // 4) Bounded-sample training: bounded vs unbounded on a corpus ABOVE
    //    the bound — same seed, sane centroids, deterministic.
    val big = spark.range(5000).toDF("id")
      .withColumn("vec", transform(sequence(lit(0), lit(15)),
        i => pmod(xxhash64(col("id"), i), lit(1000L)).cast("double") / 1000.0))
    val seed = Similarity.sampleCentroids(big, "id", "vec", 8)
    val full = Similarity.refineCentroids(big, "vec", seed, 2, maxTrainRows = 0L)
    val bounded = Similarity.refineCentroids(big, "vec", seed, 2, maxTrainRows = 800L)
    val drift = full.zip(bounded).map { case (a, b) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max }.max
    println(f"CHECK bounded_training_max_centroid_drift=$drift%.4f (small but nonzero: sample active)")

    // 5) Index append roundtrip: append == rebuild at the same meta.
    val baseHalf = emb.where(col("id") % 2 === 0)
    val appendHalf = emb.where(col("id") % 2 === 1)
    val (idx, idxMeta) = Similarity.buildIvfPqIndex(baseHalf, "id", "vec",
      nCentroids = 4, m = 4, ksub = 16, refineIterations = 0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_drive_append").toString
    Similarity.writeIvfPqIndex(idx, idxMeta, dir2)
    Similarity.appendToIvfPqIndex(appendHalf, "id", "vec", idxMeta, dir2)
    val (rel, m2) = Similarity.readIvfPqIndex(spark, dir2)
    val want = baseHalf.count() + appendHalf.count()
    println(s"CHECK appended_index_rows=${rel.count()} (want $want)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir2))

    // 6) stsd/stts through the distributed decode.
    val withCodec = Multimodal.encodeMp4Stub(1000, 2000L, Seq((320, 240)),
      codec = "avc1", sampleDeltas = Seq.fill(8)(300), mediaTimescale = 2400)
    val vdf = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(withCodec: Any)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.BinaryType))))
    val meta2 = Multimodal.decodeVideoMeta(vdf, "v")
      .select(col("decoded_video.codec"), col("decoded_video.codec_class"),
        col("decoded_video.fps"), col("decoded_video.stts_duration_sec"))
      .collect()(0)
    println(s"CHECK video_codec_fields=$meta2 (want [avc1,video,8.0,1.0])")

    spark.stop()
  }
}
