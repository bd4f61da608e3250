package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeKernels
import graft.llm.Bpe

/** Distributed BPE training + fused encode kernel. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train: hand-checkable merge sequence, tie-break, early stop") {
    val docs = Seq("aa ab", "aa aa").toDF("text")
    // Word counts: aa x3, ab x1. Pair counts: (a,a)=3, (a,b)=1.
    val m1 = Bpe.train(docs, "text", numMerges = 5, minPairCount = 2)
    assert(m1.map(m => (m.rank, m.left, m.right, m.count)) === Seq((0, "a", "a", 3L)))
    val m2 = Bpe.train(docs, "text", numMerges = 5, minPairCount = 1)
    assert(m2.map(m => (m.left, m.right, m.count)) === Seq(("a", "a", 3L), ("a", "b", 1L)))

    // Tie-break on (left asc, right asc) at equal counts: "ab ba" has
    // (a,b)=1 and (b,a)=1 -> (a,b) wins rank 0.
    val tie = Bpe.train(Seq("ab ba").toDF("text"), "text", 1, minPairCount = 1)
    assert(tie.head.left === "a" && tie.head.right === "b")
  }

  test("encode kernel: left-to-right non-overlap, roundtrip, whitespace, nulls") {
    val merges = Seq(Bpe.Merge(0, "a", "a", 3), Bpe.Merge(1, "a", "b", 1))
    val df = Seq(
      (1L, "aab"), (2L, "aaa"), (3L, "abab"), (4L, "  Aa\tab  "),
      (5L, ""), (6L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val enc = Bpe.encode(df, "text", merges)
    val got = enc.orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getSeq[String](2).toSeq)
    assert(got(0) === Seq("aa", "b"))
    // Non-overlapping left-to-right: aaa -> [aa, a], the fused token does
    // not re-fuse with the trailing a.
    assert(got(1) === Seq("aa", "a"))
    assert(got(2) === Seq("ab", "ab"))
    // Lowercased + whitespace split: "Aa" and "ab" are separate words.
    assert(got(3) === Seq("aa", "ab"))
    assert(got(4) === Seq.empty)
    assert(got(5) === null)
  }

  test("real corpus: counts non-increasing, roundtrip holds corpus-wide, compression") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 20)
    assert(merges.nonEmpty && merges.length <= 20)
    assert(merges.map(_.rank) === merges.indices)
    // The chosen pair count never increases with rank.
    assert(merges.sliding(2).forall {
      case Seq(a, b) => b.count <= a.count
      case _ => true
    })
    val enc = Bpe.encode(docs, "text", merges)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))

    // Encoding is a narrow fused-kernel projection (parquet scan -> project).
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE encode must stay narrow:\n$plan")
    assert(plan.contains("graft_bpe_encode"))

    val agg = enc.agg(
      sum(when(concat_ws("", col("bpe_tokens")) === col("stripped"), 0L)
        .otherwise(1L)).as("bad_roundtrip"),
      sum(size(col("bpe_tokens"))).as("n_tokens"),
      sum(length(col("stripped"))).as("n_chars")).head
    assert(agg.getLong(0) === 0L, "token concat must reproduce the stripped text")
    assert(agg.getLong(1) < agg.getLong(2), "20 merges must compress the corpus")

    // Vocabulary bound: every emitted token is a char or a learned merge.
    val vocab = enc.select(explode(col("bpe_tokens")).as("t")).where(length(col("t")) > 1)
      .distinct().collect().map(_.getString(0)).toSet
    val learned = merges.map(m => m.left + m.right).toSet
    assert(vocab.subsetOf(learned), s"multi-char tokens beyond learned merges: ${vocab -- learned}")
  }

  test("spark-exact trim and astral passthrough in byteDecode") {
    // U+0001 is NOT SQL-trim whitespace (trim strips 0x20 only) and not
    // regex \s — the kernel must keep it exactly like the SQL pipeline
    // does, or the frozen roundtrip oracle flips on such corpora.
    val df = Seq(Tuple1("abc\u0001"), Tuple1(" padded ")).toDF("text")
    val enc = Bpe.encode(df, "text", Nil)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))
    val bad = enc.where(concat_ws("", col("bpe_tokens")) =!= col("stripped")).count()
    assert(bad === 0L, "kernel tokenization must match the SQL trim/split exactly")

    // byteDecode passes unmapped astral chars through as WHOLE code
    // points, never as lone surrogates.
    val d = Seq(Tuple1("x🙂y")).toDF("s")
      .select(BpeKernels.byteDecode(col("s"))).head.getString(0)
    assert(d === "x🙂y")
  }

  test("byte mapping: bijective over all 256 bytes") {
    val chars = BpeKernels.byteToChar
    assert(chars.length === 256)
    assert(chars.distinct.length === 256, "byte->char map must be injective")
    // Printable bytes map to themselves (GPT-2 contract).
    assert(chars('A'.toInt) === 'A' && chars('z'.toInt) === 'z' && chars('!'.toInt) === '!')
    // Control bytes and space leave the byte range.
    assert(chars(' '.toInt) >= 256.toChar && chars(0) >= 256.toChar)
  }

  test("byte-level: roundtrip on non-ASCII + emoji, totality on unseen chars") {
    val docs = Seq(
      "Süße Grüße aus München", "naïve café déjà-vu",
      "日本語のテスト", "emoji 🙂🚀 and 🎉", "plain ascii words here"
    ).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 30, minPairCount = 1,
      byteLevel = true)
    assert(merges.nonEmpty)
    val enc = Bpe.encode(docs, "text", merges, byteLevel = true)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))
      .withColumn("back", BpeKernels.byteDecode(concat_ws("", col("bpe_tokens"))))
    val bad = enc.where(col("back") =!= col("stripped")).collect()
    assert(bad.isEmpty, s"byte-level roundtrip failed: ${bad.mkString(";")}")

    // Totality: an encoder trained on THIS corpus still encodes text made
    // entirely of characters it never saw — byte symbols always exist.
    val unseen = Seq("Ωμέγα ΑΒΓ", "🥨🦑🛸").toDF("text")
    val u = Bpe.encode(unseen, "text", merges, byteLevel = true)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))
      .withColumn("back", BpeKernels.byteDecode(concat_ws("", col("bpe_tokens"))))
    val ubad = u.where(col("back") =!= col("stripped") ||
      size(col("bpe_tokens")) === 0).collect()
    assert(ubad.isEmpty, "byte-level encode must be total and lossless on unseen text")
  }

  test("batched sweeps: 256 merges at sf0.01 in bounded wall, deterministic, disjoint") {
    // The raw sf0.01 text has only 31 distinct words — exact-BPE saturates
    // below 100 merges (every word fully fused). Collapsing each doc to one
    // long word keeps the corpus real but gives the pair lattice enough
    // depth for a 256-merge vocabulary, which is what the sweep-batching
    // job bound is about.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(translate(col("text"), " ", "").as("text"))
    val t0 = System.nanoTime()
    val merges = Bpe.train(docs, "text", numMerges = 256, minPairCount = 1,
      byteLevel = true, sweepSize = 32)
    val wall = (System.nanoTime() - t0) / 1e9
    info(f"256 byte-level merges in $wall%.1fs (8 sweeps of 32)")
    assert(merges.length === 256)
    assert(merges.map(_.rank) === merges.indices)
    assert(wall < 300.0, f"batched training took $wall%.1fs — driver-bound regression?")
    // The job bound's premise: few sweeps, many merges per sweep.
    val nSweeps = merges.map(_.sweep).distinct.length
    info(s"$nSweeps sweeps for ${merges.length} merges")
    // Conflict rejections mean sweeps rarely fill to 32; what matters is
    // the job-count cut vs one-merge-per-job (measured: 20 sweeps = 12.8
    // merges/sweep on this corpus).
    assert(nSweeps <= 64, s"sweep batching degenerated: $nSweeps sweeps for 256 merges")
    // Within each sweep, accepted merges are pairwise symbol-disjoint
    // (no merge touches a symbol any EARLIER sweep-mate introduced or
    // consumed — l == r within one merge is fine) and counts are
    // non-increasing (the documented batched contract).
    merges.groupBy(_.sweep).values.foreach { sw =>
      val sweep = sw.sortBy(_.rank)
      var seen = Set.empty[String]
      sweep.foreach { m =>
        val mine = Set(m.left, m.right, m.left + m.right)
        assert(mine.intersect(seen).isEmpty, "sweep members must be symbol-disjoint")
        seen ++= mine
      }
      assert(sweep.sliding(2).forall {
        case Seq(a, b) => b.count <= a.count
        case _ => true
      })
    }
    // Deterministic: a re-run reproduces the sequence exactly.
    val merges2 = Bpe.train(docs.repartition(7), "text", numMerges = 64,
      minPairCount = 1, byteLevel = true, sweepSize = 32)
    assert(merges2 === merges.take(64),
      "batched selection must be a pure function of the corpus")
    // Roundtrip still holds corpus-wide under the batched table.
    val enc = Bpe.encode(docs, "text", merges, byteLevel = true)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))
    val bad = enc.where(
      BpeKernels.byteDecode(concat_ws("", col("bpe_tokens"))) =!= col("stripped")).count()
    assert(bad === 0L)
  }

  test("tokenizer save/load: structural roundtrip with hostile symbols") {
    // Merges whose symbols are exactly the JSON-hostile cases: quotes,
    // backslashes, newlines-in-symbol can't arise from the trainer (words
    // are whitespace-split) but CJK / byte-alphabet code points can, and
    // user-constructed tables may carry anything — the serializer must be
    // symbol-agnostic.
    val merges = Seq(
      Bpe.Merge(0, "\"", "\\", 7L), Bpe.Merge(1, "日", "本", 5L, sweep = 1),
      Bpe.Merge(2, "a\"b", "\\n", 3L), Bpe.Merge(3, "Ā", "ÿ", 2L))
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_save")
    val path = dir.resolve("tok.json").toString
    try {
      Bpe.saveMerges(spark, merges, byteLevel = true, path)
      val (loaded, flag) = Bpe.loadMerges(spark, path)
      assert(flag && loaded === merges,
        s"roundtrip must be structural identity: $loaded")
      // And the false flag survives too.
      Bpe.saveMerges(spark, merges.take(2), byteLevel = false, path)
      val (l2, f2) = Bpe.loadMerges(spark, path)
      assert(!f2 && l2 === merges.take(2))
      // Trained-table roundtrip drives identical encodes.
      val docs = Seq("the cat sat on the mat", "the bat sat on the hat")
        .toDF("text")
      val trained = Bpe.train(docs, "text", numMerges = 8, minPairCount = 1)
      Bpe.saveMerges(spark, trained, byteLevel = false, path)
      val (lt, lf) = Bpe.loadMerges(spark, path)
      val a = Bpe.encode(docs, "text", trained).select("bpe_tokens").collect()
      val b = Bpe.encode(docs, "text", lt, byteLevel = lf)
        .select("bpe_tokens").collect()
      assert(a.map(_.getSeq[String](0)).toSeq === b.map(_.getSeq[String](0)).toSeq)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
