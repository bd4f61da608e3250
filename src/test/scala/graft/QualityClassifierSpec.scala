package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LogRegKernels
import graft.llm.QualityClassifier

/** Model-based quality classifier: featurization contract, planted-signal
  * learnability, loss descent, Pareto acceptance, persistence roundtrip. */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 1 << 12

  test("hashed features: sorted indices, L2 norm 1, deterministic, null/empty contract") {
    val df = Seq(
      ("a", "the quick brown fox jumps the fence"),
      ("b", "the the the the"),
      ("c", ""),
      ("d", "   \t \n ")).toDF("id", "text")
      .withColumn("f", QualityClassifier.featurize(col("text"), dim, 2))
    val rows = df.select("id", "f.indices", "f.values").collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Int](1), r.getSeq[Double](2))).toMap

    val (ia, va) = rows("a")
    assert(ia === ia.sorted, "indices must ascend")
    assert(ia.length === va.length)
    // 7 unigram tokens (6 distinct) + 6 bigrams, minus any hash collisions.
    assert(ia.length >= 10 && ia.length <= 12)
    assert(math.abs(va.map(v => v * v).sum - 1.0) < 1e-12, "L2 normalized")
    assert(va.forall(_ > 0))

    // Repeated token -> one bucket, full mass on it.
    val (ib, vb) = rows("b")
    // "the" x4 unigrams + "the the" x3 bigrams = 2 buckets (collision aside).
    assert(ib.length === 2)
    assert(math.abs(vb.map(v => v * v).sum - 1.0) < 1e-12)

    // Empty / whitespace-only text -> EMPTY features, not null.
    assert(rows("c")._1.isEmpty && rows("d")._1.isEmpty)

    // Null text -> null struct.
    val n = Seq(("e", null: String)).toDF("id", "text")
      .select(QualityClassifier.featurize(col("text"), dim, 2)).collect()
    assert(n.head.isNullAt(0))

    // Deterministic across evaluations.
    val again = df.select("f.indices").where($"id" === "a").collect()
      .head.getSeq[Int](0)
    assert(again === ia)
  }

  test("featurization matches between executors and driver hash") {
    // The planted word must land where hashToBucket says it lands.
    val bucket = LogRegKernels.hashToBucket("spark", 1, dim)
    val idx = Seq(Tuple1("spark")).toDF("text")
      .select(QualityClassifier.featurize(col("text"), dim, 1).getField("indices"))
      .collect().head.getSeq[Int](0)
    assert(idx === Seq(bucket))
  }

  test("training learns a planted separable signal") {
    // 200 docs from a shared pool; positives additionally contain "zebra".
    val pool = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0 until 200).map { i =>
      val words = (0 until 12).map(j => pool((i * 7 + j * 3) % pool.length))
      val text = if (i % 3 == 0) (words :+ "zebra").mkString(" ")
      else words.mkString(" ")
      (i.toLong, text, i % 3 == 0)
    }.toDF("id", "text", "label")

    val model = QualityClassifier.train(docs, "text", "label",
      dim = dim, ngrams = 2, iterations = 40, learningRate = 4.0, l2 = 1e-6)

    // Loss descends overall (first vs last).
    assert(model.lossTrace.head > model.lossTrace.last,
      s"loss did not descend: ${model.lossTrace.head} -> ${model.lossTrace.last}")
    // The planted unigram's weight is strongly positive.
    val zebraW = model.weights(LogRegKernels.hashToBucket("zebra", 1, dim))
    assert(zebraW > 0.1, s"planted-signal weight $zebraW not learned")

    // Scores separate the classes; binned AUC ~ 1.
    val scored = docs.withColumn("score",
      QualityClassifier.score(col("text"), model)).localCheckpoint()
    val mp = scored.where($"label").agg(avg("score")).head.getDouble(0)
    val mn = scored.where(!$"label").agg(avg("score")).head.getDouble(0)
    assert(mp > mn + 0.2, s"separation too weak: pos=$mp neg=$mn")
    assert(QualityClassifier.binnedAuc(scored, "score", "label") > 0.95)
    // Probabilities stay in the unit interval.
    val oob = scored.where($"score" < 0 || $"score" > 1).count()
    assert(oob === 0)
  }

  test("maxTrainRows caps the training frame without breaking training") {
    val docs = (0 until 300).map { i =>
      (i.toLong, if (i % 2 == 0) "good text about zebra" else "bad noise text",
        i % 2 == 0)
    }.toDF("id", "text", "label")
    val m = QualityClassifier.train(docs, "text", "label", dim = dim,
      ngrams = 1, iterations = 10, maxTrainRows = 50,
      sampleKeyCols = Seq("id"))
    // Perfectly separable even from the 50-row sample.
    val zebraW = m.weights(LogRegKernels.hashToBucket("zebra", 1, dim))
    assert(zebraW > 0)
  }

  test("pareto keep: monotone in score, deterministic, heavy low-score tail") {
    val df = (0 until 20000).map(i => (i.toLong, i / 20000.0)).toDF("id", "score")
      .withColumn("keep", QualityClassifier.paretoKeep($"score", $"id"))
      .localCheckpoint()
    val hi = df.where($"score" > 0.9)
    val lo = df.where($"score" < 0.2)
    val hiRate = hi.where($"keep").count().toDouble / hi.count()
    val loRate = lo.where($"keep").count().toDouble / lo.count()
    // Expected keep rates at alpha=9: mean over t in (0.9,1] of (2-t)^-9
    // is ~0.667; over [0,0.2) it is ~0.004 — a hard cut would be 0.
    assert(hiRate > 0.55 && hiRate < 0.8, s"high-score keep rate $hiRate")
    assert(loRate < 0.05, s"low-score keep rate $loRate")
    assert(loRate > 0.0, "the Pareto tail must let some low scorers through")
    // Deterministic: same decisions on re-evaluation.
    val k1 = df.where($"keep").select("id").collect().map(_.getLong(0)).sorted.toSeq
    val k2 = df.where($"keep").select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(k1 === k2)
  }

  test("save/load roundtrip preserves scores exactly") {
    val docs = (0 until 60).map { i =>
      (i.toLong, if (i % 2 == 0) "fine prose zebra here" else "junk spam",
        i % 2 == 0)
    }.toDF("id", "text", "label")
    val m = QualityClassifier.train(docs, "text", "label", dim = dim,
      ngrams = 2, iterations = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_model")
    val path = dir.resolve("model.json").toString
    try {
      QualityClassifier.save(spark, m, path)
      val m2 = QualityClassifier.load(spark, path)
      assert(m2.dim === m.dim && m2.ngrams === m.ngrams)
      assert(m2.bias === m.bias)
      assert(m2.weights.toSeq === m.weights.toSeq)
      assert(m2.lossTrace === m.lossTrace)
      val s1 = docs.select(QualityClassifier.score(col("text"), m))
        .collect().map(_.getDouble(0)).toSeq
      val s2 = docs.select(QualityClassifier.score(col("text"), m2))
        .collect().map(_.getDouble(0)).toSeq
      assert(s1 === s2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
