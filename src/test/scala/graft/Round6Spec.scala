package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{CentroidKernels, LangIdKernel}
import graft.llm.{Similarity, TextAnalysis}

/** Round-6 component tests: the fused language-ID kernel (parity with the
  * historical Column spelling plus the empty-text fix), and the fused
  * nearest-centroid kernel behind the IVF rewrite. */
class Round6Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- language id

  test("langid kernel matches the Column spelling on non-empty docs") {
    val docs = Seq(
      "The cat and the dog sat on the mat with the hat",
      "der hund und die katze ist nicht auf der matte",
      "le chat et le chien sont sur le tapis avec une balle",
      "el gato y el perro en la casa con su sombrero",
      "il gatto e il cane sono sulla sedia con la palla e più gioia",
      "\tthe   the\nthe", // tabs/newlines tokenize like Java \s
      "la la la la", // fr+es multi-membership word: tie goes to es (alphabetical)
      "xyzzy plugh 12345", // no hits -> und
      "漢字漢字漢字漢字 some latin", // Han ratio > 0.25 -> zh
      "ひらがなとカタカナ mixed in", // Kana ratio > 0.1 -> ja
      "한국어 텍스트입니다 완전히", // Hangul -> ko
      "русский текст про кота", // Cyrillic -> ru
      "نص عربي قصير جدا", // Arabic -> ar
      "für die männer auf der straße") // non-ASCII lowercase path
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val cmp = df.select(col("id"),
      TextAnalysis.languageId(col("text")).as("fused"),
      TextAnalysis.languageIdColumns(col("text")).as("legacy")).collect()
    cmp.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"id=${r.get(0)}")
    }
    // Spot-pin the script paths so both forms changing together is caught.
    val byId = cmp.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(8) === "zh"); assert(byId(9) === "ja"); assert(byId(10) === "ko")
    assert(byId(11) === "ru"); assert(byId(12) === "ar"); assert(byId(7) === "und")
  }

  test("langid kernel: null -> und; empty text fixed to und (legacy said zh)") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "   ")).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.languageId(col("text")).as("fused"),
      TextAnalysis.languageIdColumns(col("text")).as("legacy")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1) === ("und", "und"))
    // The documented divergence: the Column form's greatest(length,1) clamp
    // made empty docs score Han ratio 1 and come out "zh".
    assert(out(2) === ("und", "zh"))
    assert(out(3) === ("und", "zh"))
  }

  test("langid minHits raises the und threshold") {
    val df = Seq((1L, "the end")).toDF("id", "text") // exactly one en hit
    val out = df.select(
      TextAnalysis.languageId(col("text"), minHits = 1).as("one"),
      TextAnalysis.languageId(col("text"), minHits = 2).as("two")).head()
    assert(out.getString(0) === "en")
    assert(out.getString(1) === "und")
  }

  test("langid kernel parity property: random mixed-script texts agree with the Column form") {
    // The pinned q_text_langid oracle depends on the fused kernel matching
    // the historical Column spelling exactly; sweep randomized texts over
    // every code path: stopwords of all 5 languages, mixed scripts near
    // the ratio thresholds, messy whitespace, non-ASCII case, numbers.
    val rnd = new scala.util.Random(17)
    val stopPool = TextAnalysis.Stopwords.values.flatten.toArray
    val fillers = Array("lorem", "ipsum", "xyzzy", "WORD", "Tree", "123", "a-b", "café",
      "STRASSE", "projeção", "中文", "の", "한", "тест", "عرب", "...", "?!")
    val ws = Array(" ", "  ", "\t", "\n", " \t ", "\u00A0") // incl. NBSP (not \s)
    def randText(): String = {
      val n = rnd.nextInt(30)
      (0 until n).map { _ =>
        val tok = if (rnd.nextBoolean()) stopPool(rnd.nextInt(stopPool.length))
        else fillers(rnd.nextInt(fillers.length))
        val cased = if (rnd.nextInt(4) == 0) tok.toUpperCase else tok
        cased + ws(rnd.nextInt(ws.length))
      }.mkString
    }
    val texts = (1 to 400).map(i => (i.toLong, randText())).filter(_._2.trim.nonEmpty)
    val df = texts.toDF("id", "text")
    val bad = df.select(col("id"),
      TextAnalysis.languageId(col("text")).as("fused"),
      TextAnalysis.languageIdColumns(col("text")).as("legacy"))
      .where(col("fused") =!= col("legacy")).collect()
    assert(bad.isEmpty, s"kernel/Column disagreement on: ${bad.take(3).mkString("; ")}")
  }

  // ------------------------------------------------- packing + stratified

  test("sampleNPerGroup: exact per-group sizes, deterministic, monotone") {
    import graft.llm.Sampling
    val df = (0 until 100).map(i => (i.toLong, s"g${i % 3}")) ++
      Seq((1000L, "tiny"), (1001L, "tiny"))
    val docs = df.toDF("id", "grp")
    val s5 = Sampling.sampleNPerGroup(docs, Seq("id"), Seq("grp"), 5, seed = 9)
    val sizes = s5.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L, "tiny" -> 2L))
    val again = Sampling.sampleNPerGroup(docs, Seq("id"), Seq("grp"), 5, seed = 9)
    assert(s5.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)
    val s2 = Sampling.sampleNPerGroup(docs, Seq("id"), Seq("grp"), 2, seed = 9)
    val ids5 = s5.select("id").collect().map(_.getLong(0)).toSet
    assert(s2.select("id").collect().map(_.getLong(0)).forall(ids5.contains))
  }

  test("binPack: next-fit invariants hold on every shard") {
    import graft.llm.Packing
    val rnd = new scala.util.Random(5)
    val docs = (0 until 400).map(i => (i.toLong, 20L + rnd.nextInt(400).toLong)) :+
      (9999L, 5000L) // oversized doc: must sit alone in its own pack
    val df = docs.toDF("id", "n_tok")
    val budget = 512L
    val packed = Packing.binPack(df, Seq("id"), "n_tok", budget, shards = 4, seed = 3)
    assert(packed.count() === 401L, "every doc assigned exactly once")
    val packs = packed.groupBy("pack_shard", "pack_id")
      .agg(sum("n_tok").as("tok"), count(lit(1)).as("ndocs"),
        min(struct(col("pack_pos"), col("n_tok"))).as("first"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getStruct(4).getLong(1))).toMap
    packs.foreach { case ((sh, pid), (tok, ndocs, firstTok)) =>
      assert(tok <= budget || ndocs === 1L, s"pack ($sh,$pid) overflows with $ndocs docs")
      // The defining next-fit property: this pack's first doc did NOT fit
      // in the previous pack.
      packs.get((sh, pid - 1)).foreach { case (prevTok, _, _) =>
        assert(prevTok + firstTok > budget,
          s"pack ($sh,$pid) opened although its first doc fit the previous pack")
      }
    }
    // pack_pos is contiguous from 0.
    val badPos = packed.groupBy("pack_shard", "pack_id")
      .agg(min("pack_pos").as("mn"), max("pack_pos").as("mx"), count(lit(1)).as("n"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(badPos === 0L)
    // Deterministic across reruns.
    val again = Packing.binPack(df, Seq("id"), "n_tok", budget, shards = 4, seed = 3)
      .select("id", "pack_shard", "pack_id", "pack_pos").collect().map(_.toSeq).toSet
    assert(packed.select("id", "pack_shard", "pack_id", "pack_pos")
      .collect().map(_.toSeq).toSet === again)
  }

  test("packing invariants hold across random budgets, widths and shard counts") {
    import graft.llm.Packing
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val budget = 64L + rnd.nextInt(960)
      val shards = Seq(1, 3, 8)(rnd.nextInt(3))
      val docs = (0 until 150).map(i => (i.toLong + trial * 1000, rnd.nextInt(500).toLong))
      val df = docs.toDF("id", "n_tok")
      val packed = Packing.binPack(df, Seq("id"), "n_tok", budget, shards, seed = trial)
      assert(packed.count() === 150L, s"trial=$trial: every doc assigned")
      val packs = packed.groupBy("pack_shard", "pack_id")
        .agg(sum("n_tok").as("tok"), count(lit(1)).as("ndocs"),
          min(struct(col("pack_pos"), col("n_tok"))).as("first"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getStruct(4).getLong(1))).toMap
      packs.foreach { case ((sh, pid), (tok, ndocs, firstTok)) =>
        assert(tok <= budget || ndocs === 1L,
          s"trial=$trial budget=$budget: pack ($sh,$pid) overflows")
        packs.get((sh, pid - 1)).foreach { case (prevTok, _, _) =>
          assert(prevTok + firstTok > budget,
            s"trial=$trial budget=$budget: pack ($sh,$pid) opened early")
        }
      }
      val chunked = Packing.chunkPack(df, Seq("id"), "n_tok", budget, shards, seed = trial)
      val badShard = chunked.groupBy("pack_shard")
        .agg(max("chunk_last").as("mxc"), sum("n_tok").as("tok"))
        .where(col("tok") > 0 && col("mxc") =!= floor((col("tok") - 1) / budget)).count()
      assert(badShard === 0L, s"trial=$trial budget=$budget: chunk tiling broken")
    }
  }

  test("chunkPack: chunk ranges tile each shard's token stream exactly") {
    import graft.llm.Packing
    val rnd = new scala.util.Random(6)
    val docs = (0 until 300).map(i => (i.toLong, rnd.nextInt(700).toLong)) :+
      (777L, 0L) // zero-token doc: occupies nothing, stays in range
    val df = docs.toDF("id", "n_tok")
    val budget = 256L
    val out = Packing.chunkPack(df, Seq("id"), "n_tok", budget, shards = 4, seed = 3)
    // Per-row range arithmetic: last - first == floor((offset + max(tok,1) - 1) / budget).
    val badRange = out.where(col("chunk_last") - col("chunk_first") =!=
      floor((col("chunk_offset") + greatest(col("n_tok"), lit(1L)) - 1) / budget)).count()
    assert(badRange === 0L)
    assert(out.where(col("chunk_offset") < 0 || col("chunk_offset") >= budget).count() === 0L)
    // Per-shard: the highest chunk index is exactly the one holding the
    // shard's last token.
    val badShard = out.groupBy("pack_shard")
      .agg(max("chunk_last").as("mxc"), sum("n_tok").as("tok"))
      .where(col("tok") > 0 && col("mxc") =!= floor((col("tok") - 1) / budget)).count()
    assert(badShard === 0L)
  }

  // ------------------------------------------------------ advice follow-ups

  test("asofJoin nearest+tolerance follows pandas filter-then-pick semantics") {
    import org.apache.spark.sql.functions.expr
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 1L, t("2024-01-01 10:00:00"))).toDF("row_id", "k", "lt")
    val r = Seq(
      (1L, t("2024-01-01 09:59:45"), "back15"), // 15s back
      (1L, t("2024-01-01 10:00:30"), "fwd30")) // 30s fwd
      .toDF("k", "rt", "tag")
    def join(tolSecs: Int) =
      graft.ts.TimeOps.asofJoin(l, r, Seq("k"), "lt", "rt", Seq("tag"),
        direction = "nearest", tolerance = Some(expr(s"INTERVAL $tolSecs SECONDS")))
        .select("tag").head()
    // Both candidates out of tolerance -> null.
    assert(join(3).isNullAt(0))
    // Only the nearer (backward) side in tolerance -> it wins.
    assert(join(20).getString(0) === "back15")
    // Both in tolerance -> nearest wins.
    assert(join(60).getString(0) === "back15")
    // (The candidate-filtering restructure is semantics-preserving for
    // two-sided rows: the picked side is the min-distance side, so "nearest
    // out of tolerance" implies the opposite side is out too. The filter-
    // then-pick form makes that pandas equivalence structural rather than
    // coincidental.)
  }

  test("fused subword count matches the regex spelling, incl. astral chars") {
    val t = graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "Hello, world! 42 pieces a-b c_d"),
      (2L, ""),
      (3L, "   \t  "),
      (4L, "día café naïve 中文 🙂 done"), // non-ASCII letters + astral emoji
      (5L, "a1b2c3"),
      (6L, "....!!!!"))
      .toDF("id", "text")
    val bad = docs.select(col("id"),
      t.subwordCount(col("text")).as("fused"),
      t.subwordCountColumns(col("text")).as("legacy"))
      .where(col("fused") =!= col("legacy")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("fused quality kernel matches the Column spelling field by field") {
    val docs = Seq(
      (1L, "The cat AND the dog sat on the mat, 42 times..."),
      (2L, ""),
      (3L, "   "),
      (4L, null: String),
      (5L, "\tleading tab"),
      (6L, "x x x x x x x x"),
      (7L, "Ünïcödé tëxt — em-dash and « guillemets » stay unclassified"),
      (8L, "a, b; c: d! e? (f) [g] {h} #i $j %k"),
      (9L, "the the the and and of"))
      .toDF("id", "text")
    val fused = graft.llm.TextAnalysis.qualityFeatures(col("text"))
    val legacy = graft.llm.TextAnalysis.qualityFeaturesColumns(col("text"))
    val fields = Seq("n_chars", "n_tokens", "mean_token_len", "alpha_ratio",
      "punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio", "repetition")
    val cmp = docs.where(col("text").isNotNull).select(
      col("id") +: fields.flatMap(f =>
        Seq(fused.getField(f).as(s"f_$f"), legacy.getField(f).as(s"l_$f"))): _*)
      .collect()
    cmp.foreach { r =>
      fields.foreach { f =>
        val a = r.getAs[Any](s"f_$f"); val b = r.getAs[Any](s"l_$f")
        assert(a === b, s"id=${r.get(0)} field=$f fused=$a legacy=$b")
      }
    }
    // Score composes over the features — spot-check both ends.
    val scores = docs.where(col("text").isNotNull).select(col("id"),
      graft.llm.TextAnalysis.qualityScore(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1) > 0.8, s"prose doc scored ${scores(1)}")
    assert(scores(6) < 0.8, s"repetitive doc scored ${scores(6)}")
  }

  test("fused repetition kernel matches the exploded spelling") {
    val docs = Seq(
      (1L, "a b\na b\n- item\n* other\n  - spaced bullet\nend..."),
      (2L, "the cat the cat the cat the cat"),
      (3L, ""),
      (4L, null: String),
      (5L, "\tleading tab tokens here\nsecond  line"),
      (6L, "one\n\n\ntrailing newlines\n\n"),
      (7L, "x y z x y z x y z"),
      (8L, "• unicode bullet\n...bare ellipsis line...   "))
      .toDF("id", "text")
    val a = graft.llm.TextAnalysis.repetitionSignals(docs, "id", "text", 3)
      .orderBy("id").collect().map(_.toSeq)
    val b = graft.llm.TextAnalysis.repetitionSignalsExploded(docs, "id", "text", 3)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("repetitionSignals keeps null-text rows (counted as empty docs)") {
    val df = Seq((1L, "a b\na b"), (2L, null: String), (3L, ""))
      .toDF("id", "text")
    val out = graft.llm.TextAnalysis.repetitionSignals(df, "id", "text", 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 3, "one row per input row, including null text")
    assert(out(2).getAs[Long]("n_lines") === 1L) // null -> "" -> one empty line
    assert(out(2).getAs[Long]("ngram_total") === 1L)
    assert(out(3).getAs[Long]("n_lines") === 1L)
    assert(out(1).getAs[Long]("dup_line_count") === 1L)
  }

  // ------------------------------------------------- substring-level dedup

  test("repeated-substring detector finds the planted shared span") {
    import graft.llm.Dedup
    // Docs 1 and 2 share an 8-token boilerplate span inside otherwise
    // distinct text; doc 3 is unrelated; doc 4 is short (< width tokens).
    val boiler = "please subscribe to our newsletter for daily updates"
    val df = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two three four five $boiler six"),
      (3L, "completely unrelated text with enough tokens to have many windows here now"),
      (4L, "tiny doc")).toDF("id", "text")

    val reps = Dedup.repeatedSubstrings(df, "id", "text", width = 8, minDocs = 2).collect()
    assert(reps.length === 1, "exactly the one shared 8-token window repeats")
    assert(reps.head.getLong(1) === 2L)

    val flags = Dedup.flagRepeatedSubstrings(df, "id", "text", width = 8, minDocs = 2)
      .select("id", "n_windows", "n_repeated_windows").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(flags(1)._2 === 1L && flags(2)._2 === 1L)
    assert(flags(3)._2 === 0L)
    assert(flags(4) === ((1, 0L)), "short doc: one full-text window, not repeated")

    val pairs = Dedup.repeatedSubstringPairs(df, "id", "text", width = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1L)))
  }

  test("removeRepeatedSubstrings drops exactly the shared spans") {
    import graft.llm.Dedup
    val boiler = "please subscribe to our newsletter for daily updates" // 8 tokens
    val df = Seq(
      (1L, s"alpha beta gamma $boiler delta"),
      (2L, s"one two $boiler three four"),
      (3L, "untouched document with plenty of distinct tokens in it"),
      (4L, null: String)).toDF("id", "text")
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", width = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1) === Some("alpha beta gamma delta"))
    assert(out(2) === Some("one two three four"))
    assert(out(3) === Some("untouched document with plenty of distinct tokens in it"))
    assert(out(4) === None, "null text passes through as null")
    // Whole-doc duplication: both copies collapse to empty strings.
    val dupes = Seq((1L, "exact copy here now"), (2L, "exact copy here now"))
      .toDF("id", "text")
    val wiped = Dedup.removeRepeatedSubstrings(dupes, "id", "text", width = 8, minDocs = 2)
      .collect().map(_.getString(1))
    assert(wiped.forall(_ === ""))
  }

  test("window fingerprints in the frame path match the Column form") {
    import graft.llm.{Dedup, TextAnalysis}
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "short"),
      (3L, "x y z x y z x y z x y z")) // repeated windows collapse to a set
      .toDF("id", "text")
    // Frame path = ShingleSketch (sorted distinct hashes); Column form =
    // transform(shingles, xxhash64) — same strings, same seed-42 hash.
    val colForm = df.select(col("id"),
      array_sort(array_distinct(TextAnalysis.windowFingerprints(col("text"), 8))).as("fp"))
    val frame = Dedup.repeatedSubstrings(df, "id", "text", width = 8, minDocs = 1)
    val colFps = colForm.select(explode(col("fp")).as("fp")).distinct()
      .collect().map(_.getLong(0)).toSet
    val frameFps = frame.collect().map(_.getLong(0)).toSet
    assert(frameFps === colFps)
  }

  // ---------------------------------------------------- streaming rate paths

  test("plain rate source streams generated rows (wall-clock path)") {
    // Coverage moved here from q_gen_stream_rate, which now uses the
    // deterministic rate-micro-batch source so the driver gets a full
    // hash-checked oracle row.
    val qname = "r6_rate_plain"
    val q = graft.api.DataGenerator(spark, "sr", rows = Long.MaxValue)
      .withColumn("v", "int", graft.spec.ColumnStrategy.Range(1, 100, Some(BigDecimal(1))))
      .buildStream(rowsPerSecond = 1000)
      .writeStream.format("memory").queryName(qname).start()
    try {
      var waited = 0
      while (spark.table(qname).isEmpty && waited < 300) { Thread.sleep(200); waited += 1 }
    } finally if (q.isActive) q.stop()
    val rows = spark.table(qname)
    assert(rows.count() > 0)
    assert(rows.where(!col("v").between(1, 100)).count() === 0)
    assert(rows.where(col(graft.engine.Generator.StreamingTimestampColumn).isNull).count() === 0)
  }

  test("rate-micro-batch build is deterministic across runs") {
    import org.apache.spark.sql.streaming.Trigger
    def run(qname: String): Seq[Seq[Any]] = {
      val q = graft.api.DataGenerator(spark, "sr", rows = Long.MaxValue)
        .withColumn("v", "int", graft.spec.ColumnStrategy.Range(1, 100, Some(BigDecimal(1))))
        .withColumn("tag", "string", graft.spec.ColumnStrategy.Values(Seq("a", "b")))
        .buildStreamMicroBatch(rowsPerBatch = 500, startTimestampMs = 86400000L)
        .writeStream.format("memory").queryName(qname)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "AvailableNow micro-batch did not finish")
      val t = spark.table(qname)
      t.orderBy(t.columns.map(col): _*).collect().map(_.toSeq).toSeq
    }
    val a = run("r6_mb_a")
    val b = run("r6_mb_b")
    assert(a.length === 500)
    assert(a === b)
    // Timestamp is the parameterized start, not the wall clock.
    assert(a.head.contains(java.sql.Timestamp.valueOf("1970-01-02 00:00:00")))
  }

  // -------------------------------------------------------- centroid kernel

  private val mat: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0),
    Array(0.0, 0.0, 1.0),
    Array(1.0, 1.0, 0.0))

  test("nearest-centroid kernel: argmax, top-n order, ties to lower index") {
    val df = Seq(
      (1L, Seq(0.9, 0.1, 0.0)), // nearest cell 0, then 3
      (2L, Seq(0.0, 0.0, 2.0)), // cell 2
      (3L, Seq(1.0, 1.0, 0.0)), // exactly cell 3
      (4L, Seq(0.0, 0.0, 0.0))) // zero norm: all cosines 0.0 -> lowest index
      .toDF("id", "vec")
    val out = df.select(col("id"),
      CentroidKernels.nearestIndex(col("vec"), mat).as("cell"),
      CentroidKernels.nearestIndices(col("vec"), mat, 2).as("top2"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    assert(out(1)._1 === 0); assert(out(1)._2 === Seq(0, 3))
    assert(out(2)._1 === 2)
    assert(out(3)._1 === 3)
    assert(out(4)._1 === 0); assert(out(4)._2 === Seq(0, 1))
  }

  test("nearest-centroid kernel: null/ragged vectors and empty centroid set") {
    val df = Seq((1L, Seq[Double](1.0, 0.0)), (2L, null: Seq[Double]))
      .toDF("id", "vec")
    val ragged = df.select(CentroidKernels.nearestIndex(col("vec"), mat).as("cell"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(ragged.forall(_ == null)) // dim 2 vs centroid dim 3 -> null; null vec -> null
    val empty = df.where(col("id") === 1)
      .select(CentroidKernels.nearestIndices(col("vec"),
        Array.empty[Array[Double]], 2).as("t"))
      .head().getSeq[Int](0)
    assert(empty.isEmpty)
  }

  test("Lloyd refinement moves centroids toward cluster means, keeps empty cells") {
    // Two tight clusters around (10,0) and (0,10); seed centroids off-center
    // plus one far-away cell that captures nothing.
    val pts = (0 until 50).map(i => (i.toLong, Seq(10.0 + (i % 5) * 0.01, 0.0))) ++
      (50 until 100).map(i => (i.toLong, Seq(0.0, 10.0 + (i % 5) * 0.01)))
    val df = pts.toDF("id", "vec")
    val seed = Array(Array(5.0, 1.0), Array(1.0, 5.0), Array(-50.0, -50.0))
    val refined = Similarity.refineCentroids(df, "vec", seed, iterations = 2)
    assert(math.abs(refined(0)(0) - 10.02) < 0.1 && math.abs(refined(0)(1)) < 1e-9)
    assert(math.abs(refined(1)(1) - 10.02) < 0.1 && math.abs(refined(1)(0)) < 1e-9)
    assert(refined(2).toSeq === Seq(-50.0, -50.0)) // empty cell keeps its centroid
  }

  test("ivfTopK with refinement and full probes still equals brute force") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 60L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = base.toDF("id", "vec")
    val q = df.where(col("id") < 4)
    val bf = Similarity.bruteForceTopK(df, "id", "vec", q, "id", "vec", k = 3)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(df, "id", "vec", q, "id", "vec", k = 3,
      nCentroids = 5, nProbe = 5, refineIterations = 2)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    assert(ivf === bf)
  }
}
