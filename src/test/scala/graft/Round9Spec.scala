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

  test("streamDecontaminate refuses an oversized eval corpus, names the knob") {
    import graft.llm.Decontamination
    val stream = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    // 3 docs x ~18 distinct 2-grams >> cap of 10: must fail BEFORE collect.
    val bigEval = (0 until 3).map(i =>
      (i.toLong, (0 until 20).map(j => s"e${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Decontamination.streamDecontaminate(stream, bigEval, "doc_id", "text",
        n = 2, maxEvalGrams = 10L)
    }
    assert(e.getMessage.contains("maxEvalGrams"), e.getMessage)
    assert(e.getMessage.contains("decontaminate"), e.getMessage)
    // Same call under the default cap works and filters correctly.
    val eval_ = Seq((100L, "aa bb cc dd")).toDF("doc_id", "text")
    val kept = Decontamination.streamDecontaminate(
      stream.unionByName(Seq((2L, "zz yy xx ww")).toDF("doc_id", "text")),
      eval_, "doc_id", "text", n = 2)
    assert(kept.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("saltedEquiJoin tolerates map columns and stays exact under AQE skew-join") {
    import graft.operators.SkewJoin
    import org.apache.spark.sql.functions.{col, map_from_arrays, array, lit => flit}
    // Map-bearing left frame: the salt hash must skip the map column
    // (xxhash64 over a MapType fails analysis) yet still join correctly.
    val mleft = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("k", "lv")
      .withColumn("m", map_from_arrays(array(flit("a")), array(col("lv"))))
    val mright = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val mj = SkewJoin.saltedEquiJoin(mleft, mright, Seq("k"), salt = 4)
    assert(mj.count() === 3L)
    assert(mj.columns.toSeq === Seq("k", "lv", "m", "rv"))

    // Zipf-hot key under AQE with skew-join handling ON: row-for-row
    // equality with the plain join, AND the salt actually splits the hot
    // key — no (key, salt) group exceeds ~2x the ideal hot/salt share, so
    // no post-shuffle partition can see more than that bound either.
    val spark2 = spark
    val prevAqe = spark2.conf.get("spark.sql.adaptive.enabled")
    val prevSkew = spark2.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark2.conf.set("spark.sql.adaptive.enabled", "true")
    spark2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try {
      val hotN = 20000
      val salt = 8
      val left = ((1 to hotN).map(_ => 7L) ++ (1L to 1000L))
        .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
      val right = (1L to 1000L).map(k => (k, s"r$k")).toDF("k", "rv")
      val salted = SkewJoin.saltedEquiJoin(left, right, Seq("k"), salt)
      val plain = left.join(right, Seq("k"))
      assert(salted.count() === plain.count())
      assert(salted.join(plain, Seq("k", "lv", "rv"), "left_anti").count() === 0L)
      // Re-derive the salt the operator uses and bound the largest group.
      import org.apache.spark.sql.functions.{pmod, xxhash64, count => fcount, lit => flit2, max => fmax}
      val groups = left.withColumn("s",
          pmod(xxhash64(col("k"), col("lv"), flit2(0x5ca1ab1eL)), flit2(salt.toLong)))
        .where(col("k") === 7L).groupBy("s").agg(fcount(flit2(1)).as("n"))
      val maxGroup = groups.agg(fmax(col("n"))).head().getLong(0)
      assert(groups.count() === salt.toLong, "every salt value must be hit")
      assert(maxGroup <= 2L * hotN / salt,
        s"hot key not spread: max salt-group $maxGroup of $hotN rows")
    } finally {
      spark2.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark2.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
    }
  }

  test("writeBatch rejects buckets>0 without bucketBy on every branch") {
    import graft.spec.OutputDataset
    val df = Seq((1L, "a")).toDF("k", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft_w9").toString
    // Catalog branch: previously matched `(_, Some(t))` and silently wrote
    // an unbucketed table.
    val e1 = intercept[IllegalArgumentException] {
      graft.io.Writer.writeBatch(df, OutputDataset(s"$tmp/t1",
        buckets = 8, tableName = Some("graft_w9_t1")))
    }
    assert(e1.getMessage.contains("bucketBy"), e1.getMessage)
    // Path-only branch keeps rejecting too.
    val e2 = intercept[IllegalArgumentException] {
      graft.io.Writer.writeBatch(df, OutputDataset(s"$tmp/t2", buckets = 8))
    }
    assert(e2.getMessage.contains("bucketBy"), e2.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("semantic dedup multi-probe only widens candidates, never loses pairs") {
    import graft.llm.Dedup
    // Deterministic blobby corpus: 30 clusters x 6 near-identical vectors
    // plus per-vector jitter — boundary pairs exist between neighboring
    // cluster centers. Same centroids both runs (hash-sampled + Lloyd are
    // deterministic for a fixed frame), and the top-1 cell is contained in
    // the top-2 set, so probeCells=2's pair set must be a superset of
    // probeCells=1's; both must be exact-verified (precision 1).
    val rnd = new scala.util.Random(42)
    val rows = (0 until 180).map { i =>
      val c = i / 6
      val base = Array.tabulate(8)(d => math.sin(c * 131 + d * 17).toFloat)
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + 0.05f * math.sin(i * 37 + d * 7).toFloat })
    }
    val df = rows.toDF("id", "vec")
    def pairs(p: Int) = Dedup.semanticNearDupPairs(df, "id", "vec",
      threshold = 0.9, nCentroids = 16, refineIterations = 1, probeCells = p)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(1); val p2 = pairs(2)
    assert(p1.nonEmpty, "planted clusters must produce near-dup pairs")
    assert(p1.subsetOf(p2), s"multi-probe lost pairs: ${(p1 -- p2).take(5)}")
    intercept[IllegalArgumentException] {
      Dedup.semanticNearDupPairs(df, "id", "vec", probeCells = 0)
    }
  }

  test("WAV encode/decode roundtrip recovers exact header fields and amplitude") {
    import graft.llm.Multimodal
    val bytes = Multimodal.encodePcmWav(12000, 2, 250, 123)
    val row = Multimodal.decodeAudioOne(bytes)
    assert(row != null, "a canonical 44-byte-header WAV must decode")
    assert(row.getInt(0) === 12000)
    assert(row.getInt(1) === 2)
    assert(row.getInt(2) === 16)
    assert(row.getLong(3) === 250L)
    assert(row.getDouble(4) === 250.0 / 12000)
    assert(row.getDouble(5) === 123.0 / 32768)
    // Mean amplitude is over |sample|: a negative DC level reports its magnitude.
    val neg = Multimodal.decodeAudioOne(Multimodal.encodePcmWav(8000, 1, 10, -100))
    assert(neg.getDouble(5) === 100.0 / 32768)
    assert(Multimodal.decodeAudioOne("not a wav".getBytes("UTF-8")) == null)
    assert(Multimodal.decodeAudioOne(Array.emptyByteArray) == null)
    assert(Multimodal.decodeAudioOne(null) == null)
    // The DataFrame path carries the typed struct and nulls the garbage row.
    val df = Seq((1L, bytes), (2L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "payload")
      .select(col("id"), col("decoded_audio.sample_rate"), col("decoded_audio").isNull.as("bad"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) === 12000 && !out(0).getBoolean(2))
    assert(out(1).getBoolean(2))
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
