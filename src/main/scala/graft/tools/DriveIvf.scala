package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver: IVF cell-size diagnostics at both gate scales. */
object DriveIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); iters <- Seq(0, 2)) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val n = emb.count()
      val stats = graft.llm.Similarity.ivfCellStats(emb, "vec_id", "embedding",
        nCentroids = 0, refineIterations = iters)
      val agg = stats.agg(count(lit(1)).as("cells"),
        sum("n_rows").as("total"),
        sum(when(col("n_rows") === 0, 1L).otherwise(0L)).as("empty"),
        max("n_rows").as("mx"), avg("n_rows").as("mean")).head
      println(f"CHECK $sf iters=$iters n=$n cells=${agg.getLong(0)} total=${agg.getLong(1)} " +
        f"empty=${agg.getLong(2)} max=${agg.getLong(3)} mean=${agg.getDouble(4)}%.1f " +
        f"sqrtN=${math.round(math.sqrt(n.toDouble))}")
    }
    spark.stop()
  }
}
