package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pca

/** Distributed one-pass PCA: hand-solved eigenproblems, planted
  * axis-aligned variance, the var(pc_j) = λ_j property against brute
  * force, and the fused projection kernel's null contract. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jacobiEigen: hand-solved 2x2, canonical signs") {
    // [[2,1],[1,2]] -> eigenvalues (3, 1), vectors (1,1)/sqrt2 and
    // (1,-1)/sqrt2 after sign canonicalization (earliest max-|coord|
    // positive).
    val (evals, evecs) = Pca.jacobiEigen(Array(2.0, 1.0, 1.0, 2.0), 2)
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2)
    assert(evecs(0).zip(Array(r, r)).forall(p => math.abs(p._1 - p._2) < 1e-12))
    assert(evecs(1).zip(Array(r, -r)).forall(p => math.abs(p._1 - p._2) < 1e-12))
  }

  test("fit: planted axis-aligned variance recovers the axes exactly") {
    val pts = Seq(
      Array(2.0, 1.0, 0.0), Array(2.0, -1.0, 0.0),
      Array(-2.0, 1.0, 0.0), Array(-2.0, -1.0, 0.0))
    val df = pts.map(p => Tuple1(p)).toDF("v")
    val m = Pca.fit(df, "v", k = 2)
    assert(m.eigenvalues.zip(Seq(4.0, 1.0, 0.0))
      .forall(p => math.abs(p._1 - p._2) < 1e-12))
    assert(m.components(0).zip(Array(1.0, 0.0, 0.0))
      .forall(p => math.abs(p._1 - p._2) < 1e-9))
    assert(m.components(1).zip(Array(0.0, 1.0, 0.0))
      .forall(p => math.abs(p._1 - p._2) < 1e-9))
    assert(math.abs(m.explainedVariance - 1.0) < 1e-12)
    val pcs = Pca.transform(df, "v", m).collect()
      .map(_.getSeq[Double](1).toSeq).sortBy(_.head)
    assert(pcs === Seq(Seq(-2.0, 1.0), Seq(-2.0, -1.0),
      Seq(2.0, 1.0), Seq(2.0, -1.0)).sortBy(_.head))
  }

  test("fit: var(pc_j) equals eigenvalue_j; trace preserved (brute force)") {
    val pts = (0 until 200).map(i => Array(
      (i % 13).toDouble, ((2 * i + 3) % 7).toDouble,
      ((5 * i + 1) % 11).toDouble, ((i * i) % 9).toDouble))
    val df = pts.map(p => Tuple1(p)).toDF("v").repartition(5)
    val m = Pca.fit(df, "v", k = 4)
    val n = pts.length
    // Brute-force covariance trace = sum of per-dim population variances.
    val trace = (0 until 4).map { j =>
      val mu = pts.map(_(j)).sum / n
      pts.map(p => (p(j) - mu) * (p(j) - mu)).sum / n
    }.sum
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-9 * trace)
    val proj = Pca.transform(df, "v", m).collect().map(_.getSeq[Double](1))
    (0 until 4).foreach { j =>
      val vals = proj.map(_(j))
      val mu = vals.sum / n
      val v = vals.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - m.eigenvalues(j)) < 1e-9 * math.max(1.0, v),
        s"component $j variance $v != eigenvalue ${m.eigenvalues(j)}")
    }
  }

  test("projection kernel: null vector and dim mismatch null out") {
    val m = Pca.Model(Array(0.0, 0.0),
      Array(Array(1.0, 0.0)), Array(1.0, 0.0))
    val df = Seq(
      (1L, Array(3.0, 4.0)), (2L, Array(1.0, 2.0, 3.0)),
      (3L, null.asInstanceOf[Array[Double]])).toDF("id", "v")
    val got = Pca.transform(df, "v", m).orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getSeq[Double](2).toSeq)
    assert(got(0) === Seq(3.0))
    assert(got(1) === null) // dim mismatch
    assert(got(2) === null)
  }

  test("maxTrainRows: bounded fit still yields an orthonormal basis") {
    val pts = (0 until 500).map(i =>
      Array((i % 17).toDouble, ((3 * i) % 5).toDouble))
    val m = Pca.fit(pts.map(Tuple1(_)).toDF("v"), "v", k = 2,
      maxTrainRows = 100L)
    val dots = for (i <- 0 until 2; j <- i until 2) yield
      (m.components(i).zip(m.components(j)).map(p => p._1 * p._2).sum,
        if (i == j) 1.0 else 0.0)
    dots.foreach { case (got, want) => assert(math.abs(got - want) < 1e-9) }
  }
}
