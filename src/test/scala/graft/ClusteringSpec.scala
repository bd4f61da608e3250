package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Clustering

class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("clustering-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Two tight planted blobs around (0,0,...) and (10,10,...). */
  private def blobs = {
    import spark.implicits._
    (0 until 200).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      val jitter = (i % 7) * 0.01
      (i.toLong, Array.fill(8)(base + jitter))
    }.toDF("id", "vec")
  }

  test("kMeans separates planted blobs and assigns every row to its nearest centroid") {
    val (assigned, mat) = Clustering.kMeans(blobs, "id", "vec", k = 2,
      iterations = 3)
    assert(mat.length == 2)
    val rows = assigned.collect()
    assert(rows.length == 200)
    // Blob membership must map 1:1 onto clusters.
    val byBlob = rows.groupBy(_.getLong(0) % 2 == 0)
      .map { case (blob, rs) => blob -> rs.map(_.getInt(2)).toSet }
    assert(byBlob.values.forall(_.size == 1))
    assert(byBlob(true) != byBlob(false))
    // Assignment == argmin over the matrix, recomputed by hand.
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val d = mat.map(c => c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d(r.getInt(2)) == d.min)
    }
  }

  test("inertia falls with Lloyd iterations and stats sizes sum to n") {
    val (a0, m0) = Clustering.kMeans(blobs, "id", "vec", k = 2, iterations = 0)
    val (a3, m3) = Clustering.kMeans(blobs, "id", "vec", k = 2, iterations = 3)
    def inertia(df: org.apache.spark.sql.DataFrame, m: Array[Array[Double]]) =
      Clustering.clusterStats(df, "vec", m)
        .agg(sum("inertia"), sum("n")).collect()(0)
    val s0 = inertia(a0, m0)
    val s3 = inertia(a3, m3)
    assert(s0.getLong(1) == 200L && s3.getLong(1) == 200L)
    assert(s3.getDouble(0) <= s0.getDouble(0) + 1e-9)
  }

  test("balancedSample takes min(perCluster, size) per cluster, deterministically") {
    val (assigned, _) = Clustering.kMeans(blobs, "id", "vec", k = 2,
      iterations = 2)
    val picked = Clustering.balancedSample(assigned, Seq("id"), perCluster = 30)
    val counts = picked.groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 30L))
    val again = Clustering.balancedSample(
      assigned.repartition(7), Seq("id"), perCluster = 30)
    assert(picked.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
    // perCluster above the cluster size keeps whole clusters.
    val all = Clustering.balancedSample(assigned, Seq("id"), perCluster = 1000)
    assert(all.count() == 200L)
  }

  test("assign is stable under repartition and k is validated") {
    val (assigned, mat) = Clustering.kMeans(blobs, "id", "vec", k = 2,
      iterations = 1)
    val re = Clustering.assign(blobs.repartition(9), "vec", mat)
    val a = assigned.select("id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = re.select("id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      Clustering.kMeans(blobs, "id", "vec", k = 0)
    }
  }
}
