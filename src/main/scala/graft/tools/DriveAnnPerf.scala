package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver: break down where q_ann_topk / q_ann_ivf spend time. */
object DriveAnnPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"CHECK $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()

    for (i <- 1 to 2) {
      time(s"topk_full_$i") { mat(graft.SparkEntry.queries("q_ann_topk")(spark, sfDir)) }
      time(s"ivf_full_$i") { mat(graft.SparkEntry.queries("q_ann_ivf")(spark, sfDir)) }
      time(s"dimof_$i") { graft.llm.Similarity.dimOf(emb, "embedding") }
      time(s"parallelize_rdd_$i") { graft.llm.Similarity.parallelize(emb).count() }
      val queries = emb.where(col("vec_id") < 10)
      time(s"scored_only_$i") {
        val dim = 64
        val q = broadcast(queries.select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"))
          .withColumn("qn", graft.llm.Similarity.norm(col("qv"), dim)))
        val c = emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("cv"))
          .withColumn("cn", graft.llm.Similarity.norm(col("cv"), dim))
        val denom = col("qn") * col("cn")
        mat(c.crossJoin(q).where(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            when(denom === 0, lit(0.0))
              .otherwise(graft.llm.Similarity.dot(col("qv"), col("cv"), dim) / denom)
              .as("cosine")))
      }
    }
    spark.stop()
  }
}
