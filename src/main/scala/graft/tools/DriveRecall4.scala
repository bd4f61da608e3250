package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: IVF partial-probe recall@k vs exact brute-force top-k. */
object DriveRecall4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Similarity
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); nProbe <- Seq(2, 4, 8)) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.where(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 5, nCentroids = 16, nProbe = nProbe)
        .select("query_id", "neighbor_id")
      val nE = exact.count(); val hit = ivf.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"CHECK $sf nProbe=$nProbe recall=${hit.toDouble / nE}%.3f ($hit/$nE)")
    }
    spark.stop()
  }
}
