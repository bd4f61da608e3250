package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 OPTIMIZATION pins: the dense one-pass training aggregates
  * (logistic-regression gradient, Lloyd centroid sums, PQ codeword sums)
  * must produce the same models as the explode + hash-aggregate plans
  * they replaced (equal up to floating-point association), and the
  * literal-table kernels must no longer serialize their full tables into
  * plan strings (the per-action SQL listener events were stringifying
  * 2^15-double weight vectors on every AQE update). */
class Round18OptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withDense[T](on: Boolean)(body: => T): T = {
    val prev = sys.props.get("graft.denseAgg")
    if (on) sys.props -= "graft.denseAgg" else sys.props("graft.denseAgg") = "off"
    try body
    finally prev match {
      case Some(v) => sys.props("graft.denseAgg") = v
      case None => sys.props -= "graft.denseAgg"
    }
  }

  private lazy val labeled = {
    val texts = (0 until 200).map { i =>
      val good = s"w$i the quick brown fox jumps over the lazy dog idx$i"
      val spam = s"w$i click the casino bonus offer now win cash idx$i"
      (i.toLong, if (i % 2 == 0) good else spam, i % 2 == 0)
    }
    texts.toDF("id", "text", "label")
  }

  test("logreg RDD gradient loop == explode-plan training (weights + loss trace)") {
    def model(on: Boolean) = withDense(on) {
      graft.llm.QualityClassifier.train(labeled, "text", "label",
        dim = 1 << 10, ngrams = 2, iterations = 7, learningRate = 5.0, l2 = 1e-5)
    }
    val a = model(true)
    val b = model(false)
    assert(a.lossTrace.size == 7 && b.lossTrace.size == 7)
    a.lossTrace.zip(b.lossTrace).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"loss trace diverged: $x vs $y") }
    assert(math.abs(a.bias - b.bias) < 1e-9)
    a.weights.zip(b.weights).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"weights diverged: $x vs $y") }
    // And the trained model actually separates the plant.
    assert(a.lossTrace.head > a.lossTrace.last)
  }

  private lazy val vecs = {
    // Three well-separated blobs in 6-d so Lloyd assignment is unambiguous.
    (0 until 120).map { i =>
      val c = i % 3
      val base = Array.tabulate(6)(d => if (d == c) 10.0 else 0.0)
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + ((i * 31 + d * 7) % 10) * 0.01 }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("dense kmeans sums == explode-plan refinement (cosine + L2 flavors)") {
    def cents(on: Boolean) = withDense(on) {
      val c = vecs.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("cv"))
      graft.llm.Similarity.refineCentroids(c, "cv",
        graft.llm.Similarity.sampleCentroids(c, "id", "cv", 3), iterations = 3)
    }
    val a = cents(true)
    val b = cents(false)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) =>
        assert(math.abs(u - v) < 1e-9, s"centroid diverged: $u vs $v") } }

    def l2(on: Boolean) = withDense(on) {
      graft.llm.Clustering.kMeans(vecs, "vec_id", "embedding", k = 3,
        iterations = 3)._2
    }
    val la = l2(true)
    val lb = l2(false)
    la.zip(lb).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) =>
        assert(math.abs(u - v) < 1e-9, s"L2 centroid diverged: $u vs $v") } }
  }

  test("dense pq sums == explode-plan codebook training") {
    def book(on: Boolean) = withDense(on) {
      graft.llm.Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 3, ksub = 4, refineIterations = 3)
    }
    val a = book(true)
    val b = book(false)
    assert(a.length == b.length)
    for (s <- a.indices; c <- a(s).indices; d <- a(s)(c).indices)
      assert(math.abs(a(s)(c)(d) - b(s)(c)(d)) < 1e-9,
        s"codeword ($s,$c,$d) diverged: ${a(s)(c)(d)} vs ${b(s)(c)(d)}")
  }

  test("empty cells keep their previous centroid on both paths") {
    // 2 distinct points, 3 seeds: at least one cell captures nothing.
    val two = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    def cents(on: Boolean) = withDense(on) {
      val c = two.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("cv"))
      graft.llm.Similarity.refineCentroids(c, "cv",
        Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-5.0, -5.0)),
        iterations = 2)
    }
    val a = cents(true)
    val b = cents(false)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) => assert(math.abs(u - v) < 1e-9) } }
    // The unreachable seed survived refinement untouched.
    assert(a(2).sameElements(Array(-5.0, -5.0)))
  }

  test("kMeans seed injection == rederived seeding (centroids + assignments)") {
    val (a1, m1) = graft.llm.Clustering.kMeans(vecs, "vec_id", "embedding",
      k = 3, iterations = 0)
    val (a2, m2) = graft.llm.Clustering.kMeans(vecs, "vec_id", "embedding",
      k = 3, iterations = 2, seedCentroids = Some(m1))
    val (a3, m3) = graft.llm.Clustering.kMeans(vecs, "vec_id", "embedding",
      k = 3, iterations = 2)
    m2.zip(m3).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) =>
        assert(math.abs(u - v) < 1e-9, s"injected-seed centroid diverged: $u vs $v") } }
    assert(a2.select("vec_id", "cluster_id").collect().map(r =>
        r.getLong(0) -> r.getInt(1)).toMap ==
      a3.select("vec_id", "cluster_id").collect().map(r =>
        r.getLong(0) -> r.getInt(1)).toMap)
    assert(a1.columns.contains("cluster_id")) // baseline call stays intact
  }

  test("literal-table kernels summarize, not dump, their tables in plan strings") {
    // range source: a local relation would be constant-folded away
    // (ConvertToLocalRelation) before the plan string is built.
    val w = new Array[Double](1 << 15)
    val scored = spark.range(100)
      .select(graft.llm.QualityClassifier.score(
        concat(lit("doc "), col("id").cast("string")),
        graft.llm.QualityClassifier.Model(1 << 15, 2, w, 0.0, Seq(0.5))).as("s"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.length < 20000, s"plan string is ${plan.length} chars — a " +
      "literal table is leaking into it")
    assert(plan.contains("weights[32768]"), plan.take(500))

    val centroids = Array.fill(64)(Array.fill(32)(0.1))
    val assigned = spark.range(100)
      .select(graft.functions.CentroidKernels.nearestIndex(
        array(col("id").cast("double"), col("id").cast("double")), centroids).as("c"))
    val cplan = assigned.queryExecution.executedPlan.toString
    assert(cplan.length < 20000, s"centroid plan is ${cplan.length} chars")
    assert(cplan.contains("centroids[64]"), cplan.take(500))
  }
}
