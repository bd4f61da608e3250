package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: minhash-LSH recall vs the exact inverted-index jaccard pairs. */
object DriveRecall3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Dedup
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
        .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b")).cache()
      val lsh = Dedup.nearDupMinHash(docs, "doc_id", "text", threshold = 0.5,
        numHashes = 128, bands = 64)
        .select(col("id_a").cast("long"), col("id_b").cast("long")).cache()
      val hits = lsh.join(exact, Seq("id_a", "id_b"), "left_semi").count()
      println(s"CHECK $sf nExact=${exact.count()} nLsh=${lsh.count()} hits=$hits")
      exact.unpersist(); lsh.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
