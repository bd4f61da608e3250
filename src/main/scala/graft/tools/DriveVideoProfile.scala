package graft.tools

import graft.llm.Multimodal

/** Measurement drive for the re-encode-tolerant video size-profile
  * signature (VERDICT r14 Next #8): prove or disprove that the
  * bitrate-motion curve visible in stsz survives a two-pass re-encode.
  * Pure-JVM (the signature is per-row byte arithmetic; the Spark leg is
  * exercised by `q_dedup_video_profile`). Prints the same-content vs
  * independent-content Hamming distributions over the planted encoder
  * model, plus the degenerate cases (flat profile, uniform stsz,
  * garbage bytes). */
object DriveVideoProfile {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scale")) {
      scaleRun(if (args.length > 1) args(1).toLong else 1000000L,
        flat = args.contains("flat"),
        budgetRows = args.collectFirst {
          case a if a.startsWith("budget=") => a.stripPrefix("budget=").toLong
        }.getOrElse(0L))
      return
    }
    if (args.headOption.contains("guard")) {
      guardRun(if (args.length > 1) args(1).toLong else 1000000L,
        if (args.length > 2) args(2).toLong else 200000L)
      return
    }
    val nFam = if (args.nonEmpty) args(0).toInt else 200
    run(nFam, 640, 480)
    run(nFam, 1280, 960)
  }

  /** Spark scale leg: n videos = n/2 content families × 2 independent
    * encodes, on a HETEROGENEOUS plant (r16): family durations are
    * log-uniform over 24–192 s (≈ 6 log-1.5 duration buckets), base fps
    * 24 or 30 per family, and every 4th family's second encode is ALSO a
    * 2× fps change landing in the ADJACENT fps bucket, so the
    * cell-partitioned index path is exercised across a realistic
    * duration×fps grid including its boundary-tolerance probes. The
    * other second encodes are 0.6×-bitrate / other-GOP / other-noise
    * re-encodes at the same fps. Reports wall, pair counts, planted
    * recall (every family must pair its two encodes — ids 2f, 2f+1),
    * the per-shard cell stats, and the MEASURED per-probe bucket-member
    * scans; `flat = true` re-runs the identical plant with unknowable
    * durations (single-cell index = the r15 flat probe) as the measured
    * baseline twin. */
  def scaleRun(n: Long, flat: Boolean = false, budgetRows: Long = 0L): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val K = graft.functions.HammingIndexKernel
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // Plant shape: durations log-uniform 24–192 s (>= 576 frames, the
    // r15-certified regime — DiagVp measured the signature's own miss
    // tail below ~8 frames/bucket: 3 near-threshold misses per 50k
    // families at a 12 s floor, zero at 24 s), base
    // fps 24 or 30 per family, every 4th family's re-encode at 2× fps
    // (adjacent log-2 bucket — the boundary-tolerance probes earn their
    // keep), durationUnits decoupled from the frame count exactly like a
    // real encoder clocks it.
    val media = spark.range(0, n).select(col("id")).as[Long]
      .map { id =>
        val fam = id / 2
        def mix(z0: Long): Long = {
          var z = z0 + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val u = (mix(fam * 0x100000001B3L) >>> 11).toDouble / (1L << 53).toDouble
        val durSec = 24.0 * StrictMath.pow(8.0, u) // log-uniform 24..192 s
        val baseFps = if ((mix(fam * 31L + 7L) & 1L) == 0L) 24 else 30
        val fpsChanged = fam % 4 == 0 && id % 2 == 1
        val fps = if (fpsChanged) 2 * baseFps else baseFps
        val nFrames = math.max(64, (durSec * fps).round.toInt)
        // flat = the measured baseline twin: durationUnits 0 parses to an
        // unknown duration, every row lands in the reserved unknown cell,
        // and the index degenerates to the r15 FLAT probe over the same
        // corpus — same pairs (pair-identity at scale), honest A/B for
        // the member-scan reduction.
        val durUnits = if (flat) 0L else (durSec * 600.0).round
        val sizes =
          if (id % 2 == 0)
            Multimodal.bitrateProfileFrameSizes(fam, nFrames, 1.0, gop = 12, noiseSeed = 1L, base = 48)
          else if (fpsChanged)
            Multimodal.bitrateProfileFrameSizes(fam, nFrames, 1.8, gop = 15, noiseSeed = 3L, base = 48)
          else
            Multimodal.bitrateProfileFrameSizes(fam, nFrames, 0.6, gop = 8, noiseSeed = 2L, base = 48)
        val chunks = Seq.fill(nFrames / 64)(64) ++
          (if (nFrames % 64 > 0) Seq(nFrames % 64) else Nil)
        (id, Multimodal.encodeMp4Media(id, sizes, chunks, durationUnits = durUnits))
      }.toDF("doc_id", "payload")
    var drops = (0L, 0L)
    var shardStats = List.empty[(Int, Int, Int)]
    K.scanCounter.reset()
    K.countScans = true
    val t0 = System.nanoTime
    // maxBucket 5000 puts the path switch at 80k rows so every scale
    // size (100k smoke included) exercises the cell-partitioned index
    // path — the subject under measurement.
    // budget=<rows> forces the cell-grouped multi-pass at this size (the
    // shipped default holds ~11.5M rows in one pass).
    val r = Multimodal.videoProfilePairs(media, "doc_id", "payload",
        maxBucket = 5000,
        maxIndexBytes = if (budgetRows > 0)
          budgetRows * graft.functions.HammingIndexKernel
            .indexBytesPerRow(4, hasIds = true, rankLen = 64)
        else graft.functions.HammingIndexKernel.DefaultIndexBudgetBytes,
        onCapDrops = (k, rr) => drops = (k, rr),
        onIndexStats = (rows, cells, maxCell) =>
          shardStats = (rows, cells, maxCell) :: shardStats)
      .agg(count(lit(1)).as("pairs"),
        sum(when(col("id_b") === col("id_a") + 1 && col("id_a") % 2 === 0, 1L)
          .otherwise(0L)).as("planted"))
      .collect()(0)
    val wall = (System.nanoTime - t0) / 1e9
    K.countScans = false
    val scans = K.scanCounter.sum()
    val pairs = r.getLong(0)
    val planted = r.getLong(1)
    println(f"CHECK scale${if (flat) "_flat" else ""} n=$n wall=$wall%.1fs pairs=$pairs planted=$planted/${n / 2} " +
      f"recall=${planted.toDouble / (n / 2)}%.4f extras=${pairs - planted} cap_drops=$drops")
    shardStats.reverse.zipWithIndex.foreach { case ((rows, cells, maxCell), s) =>
      println(s"CHECK shard=$s rows=$rows cells=$cells max_cell=$maxCell")
    }
    // Each row probes every shard once; compare per-probe member scans
    // against the flat twin (run with the extra "flat" arg) — the
    // analytic uniform-slice floor is 4·ΣC(16,<=3)/2^16 = 4.26% of the
    // shard, but smooth-curve slice values are lumpy, so the honest
    // baseline is MEASURED, not computed.
    if (shardStats.isEmpty)
      println(s"CHECK member_scans n=$n took the BANDED path (<= 16*maxBucket) — no index stats")
    else if (shardStats.size == 1)
      println(f"CHECK member_scans total=$scans per_probe=${scans.toDouble / n}%.1f " +
        f"uniform_floor_per_probe=${0.0426 * n}%.1f")
    else
      // Cell-grouped passes: a row probes only the groups its
      // neighborhood overlaps, so scans/probe is not total/(n·groups) —
      // report the total (comparable across budgets at fixed n).
      println(s"CHECK member_scans total=$scans groups=${shardStats.size}")
    spark.stop()
  }

  /** At-scale throughput + identity point for the VERIFIED streaming
    * profile guard (r18 — VERDICT r17 #4: every other guard has a
    * bench_ops_scale entry; this one was correctness-pinned only).
    * Index side: `n` corpus videos on the heterogeneous scaleRun plant
    * (log-uniform 24–192 s durations, 24/30 base fps) through
    * [[graft.llm.Multimodal.videoProfileIndex]]. Probe side: `m` in-flight
    * videos — 40% re-encodes of a corpus family (must flag), 10% 2×-fps
    * re-encodes (must flag: adjacent bucket, inside the 3×3 neighborhood),
    * 40% independent content (must not flag), 10% junk bytes (unprofiled,
    * must not flag) — driven as a parquet file stream under
    * Trigger.AvailableNow. Reports index-build and stream wall, rows/s,
    * and pins per-probe VERDICT IDENTITY against the batch
    * [[graft.llm.Multimodal.videoProfilePairs]] operator over
    * corpus ∪ probes (the guard's contract: flag ⟺ the pair operator
    * would emit a (corpus, probe) pair). Appends one JSON line to
    * bench_ops_scale.json. */
  def guardRun(n: Long, m: Long): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val local = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      Seq("/dev/shm", "/tmp").find(p => new java.io.File(p).isDirectory).get)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.local.dir", s"$local/graft_vpg_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Corpus: one original encode per family, ids 0..n-1 = families.
    val corpus = spark.range(0, n).select(col("id")).as[Long]
      .map(fam => (fam, DriveVideoProfile.encOfStatic(fam, fam, 1, reenc = false)))
      .toDF("doc_id", "payload")
    val tIdx0 = System.nanoTime()
    val idx = Multimodal.videoProfileIndex(corpus, "doc_id", "payload")
    val idxWall = (System.nanoTime() - tIdx0) / 1e9

    // Probes (parquet-cached): probe i targets family i % n.
    //  i%10 in 0..3  -> re-encode of the family        (expect FLAG)
    //  i%10 == 4     -> 2x-fps re-encode of the family (expect FLAG)
    //  i%10 in 5..8  -> independent content (fam+n)    (expect no flag)
    //  i%10 == 9     -> junk bytes                     (expect no flag)
    val probeDir = s"/tmp/graft_vpg_probes_${n}_$m"
    if (!new java.io.File(probeDir, "_SUCCESS").exists()) {
      spark.range(0, m).select(col("id")).as[Long]
        .map { i =>
          val fam = i % n
          val bytes = (i % 10) match {
            case k if k <= 3 => DriveVideoProfile.encOfStatic(fam, n + i, 1, reenc = true)
            case 4 => DriveVideoProfile.encOfStatic(fam, n + i, 2, reenc = true)
            case 9 => s"junk-$i".getBytes("UTF-8")
            case _ => DriveVideoProfile.encOfStatic(fam + n, n + i, 1, reenc = false)
          }
          (i, bytes)
        }.toDF("id", "payload")
        .write.mode("overwrite").parquet(probeDir)
    }
    val probeSchema = spark.read.parquet(probeDir).schema

    // Stream leg: file source -> guard -> (id, flag) memory sink, one
    // AvailableNow drain. Stateless projection: wall is decode+probe.
    val t0 = System.nanoTime()
    val q = graft.llm.Dedup.streamVideoProfileGuard(
        spark.readStream.schema(probeSchema).parquet(probeDir),
        idx, "payload")
      .select(col("id"), col("video_near_dup"))
      .writeStream.format("memory").queryName("vpg_guard")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val flags = spark.table("vpg_guard")
    val agg = flags.agg(count(lit(1)),
      sum(when(col("video_near_dup"), 1L).otherwise(0L)),
      sum(when(col("video_near_dup") =!= (pmod(col("id"), lit(10L)) <= 4L), 1L)
        .otherwise(0L))).collect()(0)
    val rows = agg.getLong(0)
    val flagged = agg.getLong(1)
    val mismatched = agg.getLong(2)
    require(rows == m, s"stream drained $rows of $m probes")
    require(mismatched == 0L,
      s"$mismatched probes disagree with the planted expectation")
    println(f"CHECK vp_guard n=$n m=$m idx_wall=$idxWall%.1fs stream_wall=$wall%.1fs " +
      f"rows_per_sec=${m / wall}%.0f flagged=$flagged")

    // Batch-pair identity: the guard flag must equal "videoProfilePairs
    // over corpus ∪ probes emits a (corpus, probe) pair" per probe.
    // Probe ids shift by n so corpus ids stay below them (emission rule:
    // pairs point id_a < id_b within the probed cells).
    val probesDf = spark.read.parquet(probeDir)
    val union = corpus.unionByName(
      probesDf.select((col("id") + n).as("doc_id"), col("payload")))
    val tP0 = System.nanoTime()
    val paired = Multimodal.videoProfilePairs(union, "doc_id", "payload",
        maxBucket = 5000)
      .where(col("id_a") < n && col("id_b") >= n)
      .select((col("id_b") - n).as("id")).distinct()
    val guardTrue = flags.where(col("video_near_dup")).select("id")
    val disagree = paired.unionByName(guardTrue)
      .groupBy("id").count().where(col("count") =!= 2L).count()
    val pairWall = (System.nanoTime() - tP0) / 1e9
    require(disagree == 0L,
      s"$disagree probes disagree between the guard and the batch pair operator")
    println(f"CHECK vp_guard_pair_identity n=$n m=$m pair_wall=$pairWall%.1fs disagreements=0")

    val line = f"""{"bench":"vp_guard_${n / 1000000}m_idx_${m / 1000}k_probes","rows":$m,"index_rows":$n,"idx_build_sec":$idxWall%.1f,"stream_wall_sec":$wall%.1f,"rows_per_sec":${m / wall}%.0f,"flagged":$flagged,"batch_pair_identity":true,"pair_check_sec":$pairWall%.1f}"""
    println(s"CHECK $line")
    val path = java.nio.file.Paths.get("bench_ops_scale.json")
    val name = line.split("\"")(3)
    val kept =
      if (!java.nio.file.Files.exists(path)) Seq.empty[String]
      else new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
        .linesIterator.filter(l => l.nonEmpty && l.split("\"")(3) != name).toSeq
    java.nio.file.Files.write(path,
      (kept :+ line).mkString("", "\n", "\n").getBytes("UTF-8"))
    println("CHECK wrote bench_ops_scale.json")
    spark.stop()
  }

  /** Static twin of guardRun's encoder for executor closures (the
    * closure-capture rule: task lambdas call the module through a
    * static path only). */
  private[tools] def encOfStatic(fam: Long, payloadFam: Long, fpsMul: Int,
      reenc: Boolean): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val u = (mix(fam * 0x100000001B3L) >>> 11).toDouble / (1L << 53).toDouble
    val durSec = 24.0 * StrictMath.pow(8.0, u)
    val baseFps = if ((mix(fam * 31L + 7L) & 1L) == 0L) 24 else 30
    val nFrames = math.max(64, (durSec * baseFps * fpsMul).round.toInt)
    val sizes =
      if (reenc) Multimodal.bitrateProfileFrameSizes(fam, nFrames, 0.6, gop = 8, noiseSeed = 2L, base = 48)
      else Multimodal.bitrateProfileFrameSizes(fam, nFrames, 1.0, gop = 12, noiseSeed = 1L, base = 48)
    val chunks = Seq.fill(nFrames / 64)(64) ++
      (if (nFrames % 64 > 0) Seq(nFrames % 64) else Nil)
    Multimodal.encodeMp4Media(payloadFam, sizes, chunks,
      durationUnits = (durSec * 600.0).round)
  }

  def run(nFam: Int, framesA: Int, framesB: Int): Unit = {
    println(s"== nFrames original=$framesA, fps-changed re-encode=$framesB ==")

    def ham(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.bitCount(a.longValue ^ b.longValue)

    def encode(payloadFamily: Long, sizes: Seq[Int]): Array[Byte] = {
      // chunks of 64 keep the container small; payloadFamily varies per
      // encode so the coded BYTES are fully independent between the two
      // "encodes" of the same content — only the size curve is shared,
      // exactly a re-encode's signature.
      val chunks = {
        val full = sizes.length / 64
        val rem = sizes.length - full * 64
        Seq.fill(full)(64) ++ (if (rem > 0) Seq(rem) else Seq.empty)
      }
      Multimodal.encodeMp4Media(payloadFamily, sizes, chunks)
    }

    // Arms per family: original; re-encode at lower bitrate + different
    // GOP + different rate-control noise; re-encode at higher bitrate +
    // different frame COUNT (frame-rate change); a pure re-mux twin.
    val origH = new Array[java.lang.Long](nFam)
    val lowH = new Array[java.lang.Long](nFam)
    val fpsH = new Array[java.lang.Long](nFam)
    val muxH = new Array[java.lang.Long](nFam)
    var f = 0
    while (f < nFam) {
      val fam = f.toLong
      val orig = Multimodal.bitrateProfileFrameSizes(fam, framesA, 1.0, gop = 12, noiseSeed = 1L)
      val low = Multimodal.bitrateProfileFrameSizes(fam, framesA, 0.6, gop = 8, noiseSeed = 2L)
      val fps = Multimodal.bitrateProfileFrameSizes(fam, framesB, 1.8, gop = 15, noiseSeed = 3L)
      origH(f) = Multimodal.videoSizeProfileHashOne(encode(fam * 10L, orig))
      lowH(f) = Multimodal.videoSizeProfileHashOne(encode(fam * 10L + 1, low))
      fpsH(f) = Multimodal.videoSizeProfileHashOne(encode(fam * 10L + 2, fps))
      muxH(f) = Multimodal.videoSizeProfileHashOne(
        Multimodal.encodeMp4Media(fam * 10L + 3, orig, Seq.fill(orig.length / 32)(32),
          timescale = 90000))
      f += 1
    }
    require(origH.forall(_ != null) && lowH.forall(_ != null) && fpsH.forall(_ != null))

    def stats(name: String, ds: Seq[Int]): Unit = {
      val s = ds.sorted
      println(f"CHECK $name%-28s n=${s.length}%5d min=${s.head}%2d p50=${s(s.length / 2)}%2d " +
        f"p95=${s((s.length * 95) / 100 min (s.length - 1))}%2d max=${s.last}%2d " +
        f"mean=${s.sum.toDouble / s.length}%5.2f")
    }

    stats("same_lowbr_gop_noise", (0 until nFam).map(i => ham(origH(i), lowH(i))))
    stats("same_fpschange_highbr", (0 until nFam).map(i => ham(origH(i), fpsH(i))))
    stats("same_remux", (0 until nFam).map(i => ham(origH(i), muxH(i))))
    val cross = for (i <- 0 until nFam; j <- Seq((i + 1) % nFam, (i + 7) % nFam, (i + 31) % nFam)
      if i != j) yield ham(origH(i), origH(j))
    stats("cross_family", cross)
    val crossRe = for (i <- 0 until nFam; j <- Seq((i + 1) % nFam, (i + 13) % nFam)
      if i != j) yield ham(lowH(i), fpsH(j))
    stats("cross_family_reencoded", crossRe)

    // Degenerate inputs must null, not collide.
    val flat = Multimodal.videoSizeProfileHashOne(
      Multimodal.encodeMp4Media(1L, Seq.fill(128)(100), Seq.fill(4)(32)))
    val short = Multimodal.videoSizeProfileHashOne(
      Multimodal.encodeMp4Media(1L, (0 until 24).map(i => 32 + i), Seq.fill(6)(4)))
    val junk = Multimodal.videoSizeProfileHashOne("not-an-mp4".getBytes("UTF-8"))
    println(s"CHECK degenerate flat=$flat short=$short junk=$junk (expect null,null,null)")

    val same = (0 until nFam).map(i => ham(origH(i), lowH(i))) ++
      (0 until nFam).map(i => ham(origH(i), fpsH(i)))
    val crossAll = cross ++ crossRe
    val thr = 14
    println(s"CHECK separation same_max=${same.max} cross_min=${crossAll.min} " +
      s"${if (same.max < crossAll.min) "SEPARATED" else "OVERLAP"}")
    println(f"CHECK at_maxDistance_$thr recall=${same.count(_ <= thr).toDouble / same.size}%.4f " +
      f"cross_fp=${crossAll.count(_ <= thr)}/${crossAll.size}")

    // Spearman verify leg: dot of rank vectors over EVERY pair — the
    // sign-bit hash is the candidate stage, this is the precision stage.
    def ranks(fam: Long, payload: Long, sizes: Seq[Int]): Array[Double] =
      Multimodal.videoProfileRanks(encode(payload, sizes))
    val origR = Array.tabulate(nFam) { i =>
      ranks(i, i * 10L, Multimodal.bitrateProfileFrameSizes(i.toLong, framesA, 1.0, gop = 12, noiseSeed = 1L))
    }
    val lowR = Array.tabulate(nFam) { i =>
      ranks(i, i * 10L + 1, Multimodal.bitrateProfileFrameSizes(i.toLong, framesA, 0.6, gop = 8, noiseSeed = 2L))
    }
    val fpsR = Array.tabulate(nFam) { i =>
      ranks(i, i * 10L + 2, Multimodal.bitrateProfileFrameSizes(i.toLong, framesB, 1.8, gop = 15, noiseSeed = 3L))
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val sameDots = (0 until nFam).map(i => dot(origR(i), lowR(i))) ++
      (0 until nFam).map(i => dot(origR(i), fpsR(i))) ++
      (0 until nFam).map(i => dot(lowR(i), fpsR(i)))
    val crossDots = for {
      i <- 0 until nFam; j <- 0 until nFam if i < j
      pair <- Seq(dot(origR(i), origR(j)), dot(origR(i), lowR(j)), dot(lowR(i), fpsR(j)))
    } yield pair
    def dstats(name: String, ds: Seq[Double]): Unit = {
      val s = ds.sorted
      println(f"CHECK $name%-28s n=${s.length}%6d min=${s.head}%6.3f p05=${s(s.length / 20)}%6.3f " +
        f"p50=${s(s.length / 2)}%6.3f p95=${s((s.length * 95) / 100 min (s.length - 1))}%6.3f max=${s.last}%6.3f")
    }
    dstats("spearman_same", sameDots)
    dstats("spearman_cross", crossDots)
    println(s"CHECK spearman separation same_min=${f"${sameDots.min}%.3f"} " +
      s"cross_max=${f"${crossDots.max}%.3f"} " +
      s"${if (sameDots.min > crossDots.max) "SEPARATED" else "OVERLAP"}")
  }
}
