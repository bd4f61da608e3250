package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ts.{StreamSessionize, TimeOps}

/** Round-10 component tests.
  *
  * 1. TIMESTAMP vs TIMESTAMP_NTZ matrix over the ts/ operator family. The
  *    r9 regression (q_range_join) happened because the testdata parquet
  *    carries `isAdjustedToUTC=false`, Spark reads it as TIMESTAMP_NTZ, and
  *    `unix_micros` hard-rejects NTZ. Every operator here is run over BOTH
  *    flavors — written to and read back from real parquet, so the NTZ leg
  *    goes through the exact inference path the testdata does — and must
  *    produce identical (formatted) results.
  * 2. Verify.dumpOne err-marker: a failing query must still land a result
  *    dir (1-row `err` frame) so it can never silently vanish from the
  *    correctness artifact (r9: 135 recorded vs 136 declared, no red row).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  /** Tiny events table; written to parquet in the given timestamp flavor
    * and read back, so NTZ goes through parquet's isAdjustedToUTC=false
    * inference, not just an in-memory cast. */
  private def eventsParquet(flavor: String): DataFrame = {
    val raw = Seq(
      (1L, 100L, "error", "2024-01-01 10:00:00", 0.0),
      (2L, 100L, "click", "2024-01-01 11:30:00", 1.5),
      (3L, 100L, "click", "2024-01-01 15:00:00", 2.5), // outside 4h window
      (4L, 200L, "error", "2024-01-01 09:00:00", 0.0),
      (5L, 200L, "click", "2024-01-01 09:00:00", 3.0), // boundary: ts == start
      (6L, 200L, "click", "2024-01-01 13:00:00", 4.0), // boundary: ts == end
      (7L, 300L, "click", "2024-01-01 10:00:00", 5.0)  // no error for key
    ).toDF("event_id", "user_id", "event_type", "ts_str", "value")
      .withColumn("ts", col("ts_str").cast(flavor)).drop("ts_str")
    val dir = java.nio.file.Files.createTempDirectory(s"r10_$flavor").toString
    raw.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val tsType = back.schema("ts").dataType.typeName
    assert(tsType === flavor.replace("timestamp_ntz", "timestamp_ntz"),
      s"parquet round-trip must preserve the $flavor flavor, got $tsType")
    back
  }

  private def rangeJoinRows(ev: DataFrame): Set[(Long, Long)] = {
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("err_start"),
        (col("ts") + expr("INTERVAL 4 HOURS")).as("err_end"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    TimeOps.rangeJoinPoint(errors, clicks, Seq("user_id"),
      startCol = "err_start", endCol = "err_end", pointTime = "click_ts",
      binSeconds = 3600)
      .select("err_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def asofRows(ev: DataFrame): Set[(Long, Any)] = {
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("value").as("click_value"))
    TimeOps.asofJoin(errors, clicks, Seq("user_id"),
      leftTime = "ts", rightTime = "cts", rightCols = Seq("click_value"),
      direction = "forward")
      .select("event_id", "click_value")
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
  }

  private def sessionRows(ev: DataFrame): Set[(Long, Long, Long)] = {
    TimeOps.sessions(ev.select("user_id", "ts", "value"),
      Seq("user_id"), "ts", expr("INTERVAL 90 MINUTES"))
      .select("user_id", "session_seq", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("ts operators give identical results over TIMESTAMP and TIMESTAMP_NTZ parquet") {
    val tz  = eventsParquet("timestamp")
    val ntz = eventsParquet("timestamp_ntz")
    assert(ntz.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType,
      "NTZ leg must actually read back as TIMESTAMP_NTZ")

    // rangeJoinPoint — the r9 breakage: NTZ leg used to fail analysis with
    // DATATYPE_MISMATCH on unix_micros before the binOf cast fix.
    val rjExpected = Set((1L, 2L), (4L, 5L), (4L, 6L))
    assert(rangeJoinRows(tz) === rjExpected)
    assert(rangeJoinRows(ntz) === rjExpected)

    // asofJoin (forward): first click at-or-after each error.
    val asofExpected = Set[(Long, Any)]((1L, 1.5), (4L, 3.0))
    assert(asofRows(tz) === asofExpected)
    assert(asofRows(ntz) === asofExpected)

    // sessions (90-minute gap): user 100 splits {10:00,11:30} / {15:00},
    // user 200 splits {09:00,09:00} / {13:00}, user 300 has one.
    val sessExpected = Set(
      (100L, 1L, 2L), (100L, 2L, 1L),
      (200L, 1L, 2L), (200L, 2L, 1L),
      (300L, 1L, 1L))
    assert(sessionRows(tz) === sessExpected)
    assert(sessionRows(ntz) === sessExpected)
  }

  test("streamSessionize accepts an NTZ-sourced stream via a boundary cast") {
    implicit val sqlCtx = spark.sqlContext
    // Source events carry NTZ event time (string → timestamp_ntz), as a
    // parquet/Kafka-JSON stream would after NTZ inference; the typed
    // boundary cast to TIMESTAMP is the documented adapter.
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDS().toDF("key", "ts_str", "value")
      .withColumn("ts_ntz", col("ts_str").cast("timestamp_ntz"))
      .select(col("key"), col("ts_ntz").cast("timestamp").as("ts"), col("value"))
      .as[StreamSessionize.Event]
    val sessions = StreamSessionize(events, gapSeconds = 600,
      watermarkDelay = "1 minute")
    val query = sessions.writeStream.format("memory")
      .queryName("r10_ntz_sessions").outputMode("append").start()
    try {
      input.addData(
        (1L, "2024-01-01 10:00:00", 1.0),
        (1L, "2024-01-01 10:05:00", 2.0))
      query.processAllAvailable()
      // Close by gap, then an extra batch so the timeout can fire.
      input.addData((1L, "2024-01-01 12:00:00", 3.0))
      query.processAllAvailable()
      input.addData((9L, "2024-01-01 12:00:01", 0.0))
      query.processAllAvailable()
      val got = spark.table("r10_ntz_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got.contains(
        (1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:05:00"), 2L, 3.0)),
        s"gap-closed session must surface, got $got")
    } finally query.stop()
  }

  test("audio: encodePcmWav rejects Int-overflow specs; non-16-bit mean is null") {
    import graft.llm.Multimodal
    // 2^30 frames x 2 ch x 2 bytes = 2^32 wraps to 0 in Int arithmetic —
    // must be rejected, not silently encoded with a corrupt RIFF header.
    val e = intercept[IllegalArgumentException] {
      Multimodal.encodePcmWav(48000, 2, 1 << 30, 100)
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)

    // Hand-built 8-bit PCM WAV (10 frames, mono): header probe succeeds but
    // the amplitude scan only covers 16-bit — mean_amplitude must be null,
    // not a 0.0 that masquerades as silence.
    val n = 10
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    (0 until n).foreach(_ => bb.put(200.toByte))
    val row = Multimodal.decodeAudioOne(bb.array())
    assert(row != null && row.getInt(2) === 8, s"8-bit header must probe: $row")
    assert(row.isNullAt(5), s"mean_amplitude must be null for non-16-bit PCM: $row")

    // 16-bit zero-frame clip keeps the genuine 0.0 (empty, not unknown).
    val empty = Multimodal.decodeAudioOne(Multimodal.encodePcmWav(8000, 1, 0, 0))
    assert(empty != null && empty.getDouble(5) === 0.0)
  }

  test("video: MP4 stub encode/parse roundtrip recovers exact header fields") {
    import graft.llm.Multimodal
    val bytes = Multimodal.encodeMp4Stub(timescale = 1500, durationUnits = 4500L,
      tracks = Seq((640, 360), (0, 0)))
    val row = Multimodal.parseMp4Meta(bytes)
    assert(row != null, "structurally valid stub must parse")
    assert(row.getString(0) === "isom")
    assert(row.getLong(1) === 1500L)
    assert(row.getLong(2) === 4500L)
    assert(row.getDouble(3) === 3.0)
    assert(row.getInt(4) === 2, "both tracks counted")
    assert((row.getInt(5), row.getInt(6)) === ((640, 360)),
      "first visually-sized track wins; the 0x0 audio track must not override")

    // Garbage, truncated, and audio bytes must all yield null.
    assert(Multimodal.parseMp4Meta("garbage".getBytes("UTF-8")) == null)
    assert(Multimodal.parseMp4Meta(bytes.take(20)) == null)
    assert(Multimodal.parseMp4Meta(
      Multimodal.encodePcmWav(8000, 1, 10, 5)) == null)
    assert(Multimodal.parseMp4Meta(null) == null)

    // The magic-byte sniffer must classify the stub as video/mp4.
    val df = Seq(Tuple1(bytes)).toDF("payload")
      .select(graft.llm.Multimodal.mediaType(col("payload")).as("t"))
    assert(df.collect().head.getString(0) === "video/mp4")
  }

  test("resize: solid-color downsample keeps exact gray; garbage stays null") {
    import graft.llm.Multimodal
    val gray = 137
    val src = Multimodal.encodeSolidImage(17, 11, gray)
    val out = Multimodal.resizeOne(src, 6, 4, "png")
    assert(out != null)
    val dec = Multimodal.decodeOne(out)
    assert((dec.getInt(0), dec.getInt(1), dec.getInt(2)) === ((6, 4, 3)))
    assert(dec.getDouble(3) === gray / 255.0,
      s"solid input must stay exactly gray after bilinear resample: $dec")
    assert(Multimodal.resizeOne("nope".getBytes("UTF-8"), 6, 4, "png") == null)

    // DataFrame plumbing: resize + re-decode via the batched mapPartitions.
    val media = Seq((1L, src), (2L, "bad".getBytes("UTF-8"))).toDF("id", "payload")
    val resized = Multimodal.resizeImages(media, "payload", 6, 4)
    val decoded = Multimodal.decodeImages(resized, "resized")
    val rows = decoded.orderBy("id").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("decoded").getInt(0) === 6)
    assert(rows(1).isNullAt(rows(1).fieldIndex("resized")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("decoded")))
  }

  test("Verify.dumpOne writes an err-marker parquet for a failing query") {
    val out = java.nio.file.Files.createTempDirectory("r10_verify").toString
    // Failing query: must land a 1-row frame with a single `err` column.
    Verify.dumpOne(spark, "q_boom",
      (_, _) => throw new IllegalStateException("synthetic r10 failure"),
      "unused", out)
    val err = spark.read.parquet(s"$out/q_boom")
    assert(err.columns.toSeq === Seq("err"))
    val msg = err.collect().map(_.getString(0)).toSeq
    assert(msg.size === 1 && msg.head.contains("synthetic r10 failure"), msg)

    // Healthy query: lands the real result, no marker.
    Verify.dumpOne(spark, "q_fine",
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") },
      "unused", out)
    val fine = spark.read.parquet(s"$out/q_fine")
    assert(fine.columns.toSeq === Seq("id", "v") && fine.count() === 1L)
  }
}
