package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: semantic-dedup recall vs the exact harness at each SF. */
object DriveSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("graft-semdedup").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val exact = graft.llm.Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.4)
        .select(col("id_a").cast("long"), col("id_b").cast("long")).localCheckpoint()
      for (iters <- Seq(0, 2, 4)) {
        val sem = graft.llm.Dedup.semanticNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.4, nCentroids = 0, refineIterations = iters, maxCell = 10000)
          .select(col("id_a").cast("long"), col("id_b").cast("long")).localCheckpoint()
        val nE = exact.count(); val nS = sem.count()
        val hit = sem.join(exact, Seq("id_a", "id_b"), "left_semi").count()
        println(f"CHECK sf$sf iters=$iters: exact=$nE sem=$nS subset=${hit == nS} recall=${nS.toDouble / math.max(1, nE)}%.3f")
      }
    }
    spark.stop()
  }
}
