package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: MP4 frame-level metadata (stbl: stsz/stss). */
class Round11Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("video frames: stsz/stss roundtrip — both stsz forms, stss-absent rule") {
    import graft.llm.Multimodal
    // Per-entry stsz (varying sizes) + stss naming 3 keyframes.
    val varying = Multimodal.encodeMp4Stub(timescale = 1000, durationUnits = 5000L,
      tracks = Seq((320, 240)), frameSizes = Seq(100, 110, 120, 130, 140),
      syncSamples = Seq(1, 3, 5))
    val r1 = Multimodal.parseMp4Meta(varying)
    assert(r1 != null)
    assert(r1.getLong(7) === 5L, s"frame_count: $r1")
    assert(r1.getLong(8) === 3L, s"keyframe_count: $r1")
    assert(r1.getDouble(9) === 120.0, s"mean_frame_size: $r1")

    // Compact stsz (uniform size), NO stss: every sample is sync
    // (ISO 14496-12 absence rule).
    val uniform = Multimodal.encodeMp4Stub(timescale = 1000, durationUnits = 5000L,
      tracks = Seq((320, 240), (0, 0)), frameSizes = Seq.fill(7)(256))
    val r2 = Multimodal.parseMp4Meta(uniform)
    assert(r2.getLong(7) === 7L && r2.getLong(8) === 7L && r2.getDouble(9) === 256.0)

    // No stbl at all: header fields parse, frame fields are null.
    val bare = Multimodal.encodeMp4Stub(timescale = 1000, durationUnits = 5000L,
      tracks = Seq((320, 240)))
    val r3 = Multimodal.parseMp4Meta(bare)
    assert(r3 != null && r3.getLong(1) === 1000L)
    assert(r3.isNullAt(7) && r3.isNullAt(8) && r3.isNullAt(9),
      s"stbl-less container must yield null frame fields: $r3")

    // The distributed decode carries the new fields through the struct.
    val df = Seq((1L, varying), (2L, bare)).toDF("id", "payload")
    val dec = Multimodal.decodeVideoMeta(df, "payload")
      .select(col("id"), col("decoded_video.frame_count").as("fc"),
        col("decoded_video.keyframe_count").as("kc"))
      .orderBy("id").collect()
    assert(dec(0).getLong(1) === 5L && dec(0).getLong(2) === 3L)
    assert(dec(1).isNullAt(1) && dec(1).isNullAt(2))
  }
}
