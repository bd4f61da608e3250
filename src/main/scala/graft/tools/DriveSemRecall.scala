package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Measures semantic-dedup recall vs the exact harness at probeCells 1 and
  * 2 — the evidence behind the q_dedup_semantic recall pin. */
object DriveSemRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.01", "0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", threshold = 0.4)
        .select("id_a", "id_b").localCheckpoint()
      val nE = exact.count()
      for (p <- Seq(1, 2, 3)) {
        val t0 = System.nanoTime()
        val sem = Dedup.semanticNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.4, nCentroids = 0, refineIterations = 2,
          maxCell = 10000, probeCells = p)
          .select("id_a", "id_b").localCheckpoint()
        val nS = sem.count()
        val hit = sem.join(exact, Seq("id_a", "id_b"), "left_semi").count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"CHECK sf=$sf probes=$p n_exact=$nE n_sem=$nS precision=${
          if (nS == 0) 1.0 else hit.toDouble / nS}%.3f recall=${
          if (nE == 0) 1.0 else nS.toDouble / nE}%.3f sec=$sec%.2f")
      }
    }
    spark.stop()
  }
}
