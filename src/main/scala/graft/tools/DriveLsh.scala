package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Scratch: profile the cosine-LSH near-dup pipeline stage by stage. */
object DriveLsh {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"CHECK $label%-28s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val dim = Similarity.dimOf(emb, "embedding")
    t("dim-probe")(dim.toLong)

    val prepared = Similarity
      .hyperplaneSketches(emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        "id", "vec", planes = 8, probes = 16)
      .withColumn("nrm", Similarity.norm(col("vec"), dim))
      .withColumn("key", explode(col("keys"))).drop("keys")

    t("keys-explode")(prepared.count())
    val counts = prepared.groupBy("key").count()
    t("bucket-count")(counts.count())
    counts.orderBy(col("count").desc).show(5, false)

    val capped = counts.where(col("count") <= 500)
    val bucketed = prepared.join(capped.select("key"), "key")
    t("bucketed")(bucketed.count())

    val a = bucketed.select(col("key"), col("id").as("id_a"), col("vec").as("v_a"), col("nrm").as("n_a"))
    val b = bucketed.select(col("key"), col("id").as("id_b"), col("vec").as("v_b"), col("nrm").as("n_b"))
    val joined = a.join(b, Seq("key")).where(col("id_a") < col("id_b"))
    t("pair-join")(joined.count())

    t("full-op")(Dedup.nearDupCosine(emb, "vec_id", "embedding",
      threshold = 0.4, planes = 8, probes = 16, maxBucket = 500).count())
    spark.stop()
  }
}
