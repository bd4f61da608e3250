package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: recall components by cosine tier and LSH params. */
object DriveRecall2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Dedup, Similarity}
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.4)
        .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"),
          col("cosine")).cache()
      for ((planes, probes) <- Seq((8, 16), (6, 24), (6, 32))) {
        val lsh = Dedup.nearDupCosine(emb, "vec_id", "embedding", 0.4, planes, probes, 500)
          .select(col("id_a").cast("long"), col("id_b").cast("long")).cache()
        val hits = lsh.join(exact, Seq("id_a", "id_b"), "left_semi")
        val hiExact = exact.where(col("cosine") >= 0.7)
        val hiHits = hiExact.join(lsh, Seq("id_a", "id_b"), "left_semi")
        println(s"CHECK $sf p=$planes/$probes nExact=${exact.count()} nLsh=${lsh.count()} " +
          s"hits=${hits.count()} hiExact=${hiExact.count()} hiHits=${hiHits.count()}")
        lsh.unpersist()
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
