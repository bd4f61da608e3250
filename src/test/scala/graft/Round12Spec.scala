package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: bounded-sample ANN training (`maxTrainRows`). */
class Round12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic 16-dim pseudo-embedding corpus with 8 planted cluster
    * centers — clustered enough that k-means refinement matters, noisy
    * enough that recall is not trivially 1.0. */
  private def corpus(n: Int): DataFrame =
    spark.range(n).toDF("id")
      .withColumn("cluster", pmod(col("id"), lit(8)))
      .withColumn("vec", transform(sequence(lit(0), lit(15)), i =>
        when(i === col("cluster").cast("int"), lit(4.0)).otherwise(lit(0.0)) +
          pmod(xxhash64(col("id"), i), lit(1000L)).cast("double") / 1000.0 - 0.5))
      .select(col("id"), col("vec"))

  private def recallAt10(approx: DataFrame, exact: DataFrame): Double = {
    val hit = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble
    hit / exact.count().toDouble
  }

  test("bounded-sample IVF training: recall parity with full-corpus Lloyd") {
    import graft.llm.Similarity
    val c = corpus(12000).cache()
    val q = c.limit(25).select(col("id").as("qid"), col("vec"))
    val exact = Similarity.bruteForceTopK(c, "id", "vec", q, "qid", "vec", k = 10).cache()

    val full = Similarity.ivfTopK(c, "id", "vec", q, "qid", "vec",
      k = 10, nCentroids = 16, nProbe = 4, refineIterations = 2,
      maxTrainRows = 0L) // disabled: exact full-corpus training
    val bounded = Similarity.ivfTopK(c, "id", "vec", q, "qid", "vec",
      k = 10, nCentroids = 16, nProbe = 4, refineIterations = 2,
      maxTrainRows = 1500L) // forces the hash sample: 1.5k of 12k rows
    val rFull = recallAt10(full, exact)
    val rBounded = recallAt10(bounded, exact)
    assert(rFull >= 0.6, s"full-train recall degenerate: $rFull")
    assert(rBounded >= rFull - 0.1,
      s"bounded-sample training lost recall: full=$rFull bounded=$rBounded")

    // Below the bound the knob is a NO-OP: identical results to disabled.
    val noop = Similarity.ivfTopK(c, "id", "vec", q, "qid", "vec",
      k = 10, nCentroids = 16, nProbe = 4, refineIterations = 2,
      maxTrainRows = 1000000L)
    assert(noop.exceptAll(full).isEmpty && full.exceptAll(noop).isEmpty,
      "default maxTrainRows must not change results when corpus < bound")
    c.unpersist(); exact.unpersist()
  }

  test("bounded-sample PQ training: codebook parity below bound, recall above it") {
    import graft.llm.Similarity
    val c = corpus(9000).cache()
    // Below the bound: bit-identical codebooks (the no-op contract).
    val bFull = Similarity.pqTrain(c, "id", "vec", m = 8, ksub = 16,
      refineIterations = 2, maxTrainRows = 0L)
    val bNoop = Similarity.pqTrain(c, "id", "vec", m = 8, ksub = 16,
      refineIterations = 2, maxTrainRows = 1000000L)
    assert(bFull.flatten.flatten.toSeq == bNoop.flatten.flatten.toSeq,
      "maxTrainRows must be a no-op when the corpus is below the bound")

    // Above the bound: recall parity through the whole pqTopK path.
    val q = c.limit(20).select(col("id").as("qid"), col("vec"))
    val exact = Similarity.bruteForceTopK(c, "id", "vec", q, "qid", "vec", k = 10).cache()
    val full = Similarity.pqTopK(c, "id", "vec", q, "qid", "vec", k = 10,
      m = 8, ksub = 16, refineIterations = 2, rerank = 8, maxTrainRows = 0L)
    val bounded = Similarity.pqTopK(c, "id", "vec", q, "qid", "vec", k = 10,
      m = 8, ksub = 16, refineIterations = 2, rerank = 8, maxTrainRows = 1200L)
    val rFull = recallAt10(full, exact)
    val rBounded = recallAt10(bounded, exact)
    assert(rFull >= 0.5, s"full-train PQ recall degenerate: $rFull")
    assert(rBounded >= rFull - 0.1,
      s"bounded-sample PQ training lost recall: full=$rFull bounded=$rBounded")
    c.unpersist(); exact.unpersist()
  }

  test("video stsd/stts: codec fourcc + class, fps, duration cross-check") {
    import graft.llm.Multimodal
    // 6 frames at 400 media units each on a 2400 clock -> fps = 6, stts
    // duration = 1.0s; movie clock says 2.0s (inconsistent on purpose).
    val v = Multimodal.encodeMp4Stub(timescale = 1000, durationUnits = 2000L,
      tracks = Seq((320, 240)), frameSizes = Seq.fill(6)(100),
      codec = "avc1", sampleDeltas = Seq.fill(6)(400), mediaTimescale = 2400)
    val r = Multimodal.parseMp4Meta(v)
    assert(r.getString(10) === "avc1" && r.getString(11) === "video")
    assert(r.getDouble(12) === 6.0, s"fps: $r")
    assert(r.getDouble(13) === 1.0, s"stts duration: $r")
    assert(r.getDouble(3) === 2.0) // mvhd duration differs -> detectable

    // Audio fourcc classifies audio; unknown fourcc is "other".
    val a = Multimodal.encodeMp4Stub(1000, 1000L, Seq((0, 0)), codec = "mp4a",
      sampleDeltas = Seq(500), mediaTimescale = 500)
    val ra = Multimodal.parseMp4Meta(a)
    assert(ra.getString(11) === "audio" && ra.getDouble(12) === 1.0)
    val o = Multimodal.encodeMp4Stub(1000, 1000L, Seq((0, 0)), codec = "zzzz")
    assert(Multimodal.parseMp4Meta(o).getString(11) === "other")

    // Mixed deltas exercise the run-length stts encoding: 2x100 + 1x200
    // on a 400 clock -> duration 1.0s, fps 3.0.
    val mixed = Multimodal.encodeMp4Stub(1000, 1000L, Seq((160, 90)),
      codec = "hev1", sampleDeltas = Seq(100, 100, 200), mediaTimescale = 400)
    val rm = Multimodal.parseMp4Meta(mixed)
    assert(rm.getDouble(12) === 3.0 && rm.getDouble(13) === 1.0)

    // Consistency-planted: media clock chosen so stts == mvhd exactly.
    val cons = Multimodal.encodeMp4Stub(1000, 3000L, Seq((160, 90)),
      codec = "avc1", sampleDeltas = Seq.fill(4)(3000), mediaTimescale = 4000)
    val rc = Multimodal.parseMp4Meta(cons)
    assert(rc.getDouble(13) === rc.getDouble(3),
      s"stts duration must equal mvhd duration bit-for-bit: $rc")

    // No stsd/stts: the new fields are null, old fields untouched.
    val bare = Multimodal.encodeMp4Stub(1000, 5000L, Seq((320, 240)),
      frameSizes = Seq(1, 2, 3))
    val rb = Multimodal.parseMp4Meta(bare)
    assert(rb.isNullAt(10) && rb.isNullAt(11) && rb.isNullAt(12) && rb.isNullAt(13))
    assert(rb.getLong(7) === 3L)
  }

  test("video stsc/stco/co64: chunk count + implied sample total") {
    import graft.llm.Multimodal
    // 5 chunks: 3+3+3+2+2 samples — stsc compresses to two runs
    // (first=1,spc=3),(first=4,spc=2); the expansion must recover 13,
    // which equals the stsz frame count (well-formed cross-check).
    val v = Multimodal.encodeMp4Stub(1000, 2000L, Seq((320, 240)),
      frameSizes = (1 to 13).map(100 + _),
      chunkSamples = Seq(3, 3, 3, 2, 2))
    val r = Multimodal.parseMp4Meta(v)
    assert(r.getLong(14) === 5L, s"chunk_count: $r")
    assert(r.getLong(15) === 13L, s"chunk_sample_count: $r")
    assert(r.getLong(15) === r.getLong(7), "chunk map must agree with stsz")

    // Uniform chunking compresses to ONE stsc run covering every chunk.
    val u = Multimodal.encodeMp4Stub(1000, 2000L, Seq((320, 240)),
      chunkSamples = Seq.fill(7)(4))
    val ru = Multimodal.parseMp4Meta(u)
    assert(ru.getLong(14) === 7L && ru.getLong(15) === 28L)

    // No chunk boxes: both fields null, old fields untouched.
    val bare = Multimodal.encodeMp4Stub(1000, 2000L, Seq((320, 240)),
      frameSizes = Seq(10, 20))
    val rb = Multimodal.parseMp4Meta(bare)
    assert(rb.isNullAt(14) && rb.isNullAt(15) && rb.getLong(7) === 2L)

    // Malformed stsc (first_chunk starts at 2, not 1): chunk_count still
    // reads, but the implied sample total is unknown (null), not garbage.
    def patchFirstChunk(bytes: Array[Byte]): Array[Byte] = {
      val out = bytes.clone()
      // find the stsc box and bump its first run's first_chunk
      val idx = out.sliding(4).indexWhere(_.sameElements("stsc".getBytes("US-ASCII")))
      assert(idx > 0, "stsc box not found in stub")
      val firstChunkOff = idx + 4 + 8 // past fourcc, ver/flags, entry_count
      out(firstChunkOff + 3) = 2.toByte
      out
    }
    val rmVal = Multimodal.parseMp4Meta(patchFirstChunk(u))
    assert(rmVal.getLong(14) === 7L && rmVal.isNullAt(15),
      s"malformed stsc must yield null sample total: $rmVal")

    // Truncated stco claim (entry_count far beyond payload): the bound
    // check rejects it — chunk_count stays null.
    def patchStcoCount(bytes: Array[Byte]): Array[Byte] = {
      val out = bytes.clone()
      val idx = out.sliding(4).indexWhere(_.sameElements("stco".getBytes("US-ASCII")))
      assert(idx > 0, "stco box not found in stub")
      val cntOff = idx + 4 + 4 // past fourcc + ver/flags
      out(cntOff) = 0x7F.toByte // entry_count ~2^31: cannot fit the payload
      out
    }
    val rt = Multimodal.parseMp4Meta(patchStcoCount(u))
    assert(rt.isNullAt(14) && rt.isNullAt(15),
      s"overclaimed stco must be rejected by the payload bound: $rt")
  }

  test("removeCorpusFrequentLines: cross-doc strip, within-doc immunity, row stability") {
    import graft.llm.Dedup
    val docs = Seq(
      (0L, "BOILER\nalpha zero"),
      (1L, "BOILER\nalpha one"),
      (2L, "BOILER\nalpha two"),
      (3L, "alpha three\nBOILER"),      // position doesn't matter
      (4L, "BOILER"),                   // all-boilerplate doc -> ""
      (5L, "twice\ntwice\nalpha five"), // within-ONE-doc repeat: NOT corpus-frequent
      (6L, "rare\nrare2"),              // rare pair (2 docs < minDocs=3): kept
      (7L, "rare\nrare2"),
      (8L, "alpha eight")
    ).toDF("id", "text")
    val out = Dedup.removeCorpusFrequentLines(docs, "id", "text", minDocs = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length === 9, "row count must be stable")
    val m = out.toMap
    assert(m(0L) === "alpha zero" && m(3L) === "alpha three",
      "corpus-frequent line stripped regardless of position")
    assert(m(4L) === "", "all-boilerplate doc becomes empty, not dropped")
    assert(m(5L) === "twice\ntwice\nalpha five",
      "a line repeated within ONE doc is not corpus-frequent")
    assert(m(6L) === "rare\nrare2" && m(7L) === "rare\nrare2",
      "2-doc lines survive a minDocs=3 threshold")
    assert(m(8L) === "alpha eight")
    // Order preservation inside a doc with interleaved strips.
    val docs2 = Seq((0L, "a\nX\nb\nX\nc"), (1L, "X\np"), (2L, "X\nq")).toDF("id", "text")
    val out2 = Dedup.removeCorpusFrequentLines(docs2, "id", "text", minDocs = 3)
      .orderBy("id").collect().map(_.getString(1))
    assert(out2(0) === "a\nb\nc", s"line order must survive the strip: ${out2(0)}")
    // Blank lines are corpus-frequent in ANY real corpus but exempt by
    // default — paragraph breaks must survive; raising minLineChars also
    // shields short dividers.
    val docs3 = Seq((0L, "p1\n\np2"), (1L, "q1\n\nq2"), (2L, "r1\n\nr2"),
      (3L, "s1\n---\ns2"), (4L, "t1\n---\nt2"), (5L, "u1\n---\nu2")).toDF("id", "text")
    val out3 = Dedup.removeCorpusFrequentLines(docs3, "id", "text", minDocs = 3)
      .orderBy("id").collect().map(_.getString(1))
    assert(out3(0) === "p1\n\np2", "blank paragraph breaks must be exempt")
    assert(out3(3) === "s1\ns2", "a 3-char divider IS stripped at minLineChars=1")
    val out4 = Dedup.removeCorpusFrequentLines(docs3, "id", "text",
      minDocs = 3, minLineChars = 4).orderBy("id").collect().map(_.getString(1))
    assert(out4(3) === "s1\n---\ns2", "minLineChars=4 exempts the divider")
  }

  test("stripFrequentLinesWith: guard equals the relational strip, null passthrough") {
    import graft.llm.Dedup
    val docs = Seq(
      (0L, "BOILER\nalpha zero"), (1L, "BOILER\nalpha one"),
      (2L, "BOILER\nalpha two"), (3L, "alpha three\nBOILER"),
      (4L, "BOILER"), (5L, "p1\n\np2"), (6L, "q1\n\nq2"), (7L, "r1\n\nr2"),
      (8L, "alpha eight")
    ).toDF("id", "text")
    val idx = Dedup.frequentLineIndex(docs, "id", "text", minDocs = 3)
    assert(idx.length === 1, "exactly the BOILER line is frequent (blanks exempt)")
    val guard = Dedup.stripFrequentLinesWith(docs, "text", idx)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val join = Dedup.removeCorpusFrequentLines(docs, "id", "text", minDocs = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(guard.toSeq === join.toSeq,
      "per-row guard must equal the relational strip on the training corpus")
    assert(guard.toMap.apply(5L) === "p1\n\np2", "blank lines survive the guard too")
    // Null text rides through the projection as null (no join to "" it).
    val withNull = docs.unionByName(Seq((10L, null.asInstanceOf[String])).toDF("id", "text"))
    val g2 = Dedup.stripFrequentLinesWith(withNull, "text", idx)
      .where(col("id") === 10L).collect()
    assert(g2.length === 1 && g2(0).isNullAt(1))
    // The collect is bounded: an overflowing vocabulary fails fast.
    val e = intercept[IllegalArgumentException] {
      Dedup.frequentLineIndex(docs, "id", "text", minDocs = 3, maxLines = 0L)
    }
    assert(e.getMessage.contains("maxLines"))
    // SQL surface: same strip through the registered function.
    graft.functions.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("strip_docs")
    val viaSql = spark.sql(
      s"SELECT id, graft_strip_lines_in_set(text, array(${idx.mkString(",")})) AS t " +
        "FROM strip_docs ORDER BY id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSql.toSeq === join.toSeq, "SQL form must match the Column form")
  }

  test("lshParamsFor: S-curve threshold fit, exhaustively verified") {
    import graft.llm.Dedup
    // Against a brute-force enumeration at several operating points.
    def brute(t: Double, n: Int): Double =
      (1 to n).filter(n % _ == 0)
        .map(b => math.abs(math.pow(1.0 / b, 1.0 / (n / b)) - t)).min
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9); n <- Seq(64, 128, 256)) {
      val (b, r) = Dedup.lshParamsFor(t, n)
      assert(b * r === n, s"must use every hash: ($b,$r) for n=$n")
      val got = math.abs(math.pow(1.0 / b, 1.0 / r) - t)
      assert(math.abs(got - brute(t, n)) < 1e-12,
        s"not the closest divisor pair at t=$t n=$n: ($b,$r)")
    }
    // Known points: high thresholds want few bands of many rows, low
    // thresholds many bands of few rows (the S-curve moves right with r).
    assert(Dedup.lshParamsFor(0.8, 128) === ((8, 16)))
    assert(Dedup.lshParamsFor(0.5, 128) === ((32, 4)))
    val (bLow, _) = Dedup.lshParamsFor(0.3, 128)
    val (bHigh, _) = Dedup.lshParamsFor(0.9, 128)
    assert(bLow > bHigh, "lower threshold must pick more bands")
    // Tie-break toward more bands (recall side).
    val (b2, r2) = Dedup.lshParamsFor(0.5, 4) // (4,1)->0.25, (2,2)->~0.707, (1,4)->1
    assert(b2 * r2 === 4)
  }

  test("bounded training sample is deterministic across repartition") {
    import graft.llm.Similarity
    val c = corpus(6000)
    val seed = Similarity.sampleCentroids(c, "id", "vec", 8)
    val a = Similarity.refineCentroids(c, "vec", seed, 2, maxTrainRows = 900L)
    val b = Similarity.refineCentroids(c.repartition(7), "vec", seed, 2,
      maxTrainRows = 900L)
    // Same sample membership either way (hash-keyed filter); means may
    // differ only in FP summation order — compare with a tolerance.
    assert(a.length == b.length)
    for (i <- a.indices; j <- a(i).indices)
      assert(math.abs(a(i)(j) - b(i)(j)) < 1e-9,
        s"centroid ($i,$j) moved across repartition: ${a(i)(j)} vs ${b(i)(j)}")
  }

  test("appendToIvfPqIndex refuses a foreign codebook (sidecar mismatch)") {
    import graft.llm.Similarity
    val c = corpus(3000)
    val batch = corpus(3200).where(col("id") >= 3000)
    val (indexed, meta) = Similarity.buildIvfPqIndex(c, "id", "vec",
      nCentroids = 8, m = 4, ksub = 16, refineIterations = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_guard").toString
    try {
      Similarity.writeIvfPqIndex(indexed, meta, dir)
      // The index's own meta appends fine (value-exact through the JSON
      // sidecar roundtrip — this is also the Jackson-roundtrip pin).
      Similarity.appendToIvfPqIndex(batch, "id", "vec", meta, dir)
      // A retrained (different-values) meta of the SAME shape must refuse.
      val (_, foreign) = Similarity.buildIvfPqIndex(
        c.where(col("id") % 3 === 0), "id", "vec",
        nCentroids = 8, m = 4, ksub = 16, refineIterations = 1)
      val e1 = intercept[IllegalArgumentException] {
        Similarity.appendToIvfPqIndex(batch, "id", "vec", foreign, dir)
      }
      assert(e1.getMessage.contains("values differ"), e1.getMessage)
      // A different-SHAPE meta names the offending dimension.
      val wrongM = Similarity.IvfPqMeta(meta.centroids, meta.books.take(2))
      val e2 = intercept[IllegalArgumentException] {
        Similarity.appendToIvfPqIndex(batch, "id", "vec", wrongM, dir)
      }
      assert(e2.getMessage.contains("m 4 vs 2") ||
        e2.getMessage.contains("m 2 vs 4"), e2.getMessage)
      // A directory with no sidecar yet ADOPTS the first batch's meta:
      // the sidecar is written, the dir becomes readable, and the guard
      // bites from the second batch on.
      val fresh = java.nio.file.Files.createTempDirectory("graft_meta_fresh").toString
      try {
        Similarity.appendToIvfPqIndex(batch, "id", "vec", meta, fresh)
        val (_, adopted) = Similarity.readIvfPqIndex(spark, fresh)
        assert(Similarity.IvfPqMeta.mismatch(meta, adopted).isEmpty,
          "first append must adopt its meta as the index sidecar")
        intercept[IllegalArgumentException] {
          Similarity.appendToIvfPqIndex(batch, "id", "vec", foreign, fresh)
        }
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fresh))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("compactIvfPqIndex: one file per cell, identical probes, meta survives") {
    import graft.llm.Similarity
    val c = corpus(4000).cache()
    val q = c.limit(10).select(col("id").as("qid"), col("vec"))
    val (indexed, meta) = Similarity.buildIvfPqIndex(
      c.where(col("id") % 4 === 0), "id", "vec",
      nCentroids = 8, m = 4, ksub = 16, refineIterations = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    try {
      Similarity.writeIvfPqIndex(indexed, meta, dir)
      (1 to 3).foreach(r => Similarity.appendToIvfPqIndex(
        c.where(col("id") % 4 === r), "id", "vec", meta, dir))
      val raw = c.select(col("id").as("neighbor_id"),
        col("vec").cast("array<double>").as("cv"))
      def probe(): DataFrame = {
        val (idx, m2) = Similarity.readIvfPqIndex(spark, dir)
        Similarity.probeIvfPqIndex(idx, m2, raw, q, "qid", "vec",
          k = 5, nProbe = 3, rerank = 4)
          .select("query_id", "neighbor_id").localCheckpoint()
      }
      val before = probe()
      val (nBefore, nAfter) = Similarity.compactIvfPqIndex(spark, dir)
      val after = probe()
      assert(nAfter < nBefore, s"compaction must shrink files: $nBefore -> $nAfter")
      val (idx2, meta2) = Similarity.readIvfPqIndex(spark, dir)
      // Materialize the cell count NOW: the second compaction below
      // replaces idx2's underlying files (the documented snapshot rule).
      val cells = idx2.select("centroid_idx").distinct().count()
      assert(nAfter === cells,
        "filesPerCell=1 must leave exactly one file per occupied cell")
      assert(Similarity.IvfPqMeta.mismatch(meta, meta2).isEmpty,
        "sidecar must survive the rename swap unchanged")
      assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty,
        "compaction must not change probe results")
      // filesPerCell > 1 bounds, not fixes, the per-cell file count.
      (1 to 2).foreach(r => Similarity.appendToIvfPqIndex(
        c.where(col("id") % 4 === r), "id", "vec", meta, dir))
      val (_, nAfter3) = Similarity.compactIvfPqIndex(spark, dir, filesPerCell = 3)
      assert(nAfter3 <= 3 * cells, s"filesPerCell=3: $nAfter3 files for $cells cells")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      c.unpersist()
    }
  }

  test("ngramNovelty: hand-counted unseen windows, boundary cases") {
    // Reference doc: "a b c d e f" -> 5-gram windows {abcde, bcdef}.
    val ref = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c d e"),       // {abcde}: seen -> 0/1 novel
      (3L, "a b c d e x"),     // {abcde, bcdex}: 1/2 novel
      (5L, "x y z w v"),       // {xyzwv}: 1/1 novel
      (7L, "a b c d"),         // < 5 tokens -> omitted
      (9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.llm.Decontamination
      .ngramNovelty(ref, score, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 0L),
      (3L, 2L, 1L, 500000L),
      (5L, 1L, 1L, 1000000L)))
  }

  test("assignSplitsByCluster: clusters move atomically, singletons match the key split") {
    val df = (1L to 200L).map(i => (i, s"doc $i")).toDF("id", "text")
    // Chain 1-2-3 (transitive: no direct 1-3 pair) and pair 5-6.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val got = graft.llm.Sampling.assignSplitsByCluster(df, "id", pairs, splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got.size === 200)
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(5L) === got(6L))
    // Clustered rows take the REPRESENTATIVE's (min id) split...
    val plain = graft.llm.Sampling.assignSplits(df, Seq("id"), splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got(3L) === plain(1L) && got(6L) === plain(5L))
    // ...and unpaired rows split exactly as the plain key-hash split.
    (7L to 200L).foreach(i => assert(got(i) === plain(i)))
    // Both split names actually occur (hash is not degenerate).
    assert(got.values.toSet === Set("train", "test"))
  }
}
