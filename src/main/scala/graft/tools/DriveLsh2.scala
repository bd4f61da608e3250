package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Scratch: isolate the hyperplane-key projection cost by formulation. */
object DriveLsh2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val dim = 64
    val base = Similarity.parallelize(
      emb.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec")))

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"CHECK $label%-28s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // A: one giant array expression (current shape)
    t("A-one-expr-16x8") {
      base.withColumn("ks", Similarity.hyperplaneKeys(col("vec"), 8, 16, dim))
        .select(sum(size(col("ks")))).collect().head.getLong(0)
    }
    // B: 16 separate probe columns
    def probeKey(vec: org.apache.spark.sql.Column, planes: Int, probe: Int): org.apache.spark.sql.Column = {
      val signBits = (0 until planes).map { plane =>
        val proj = (1 to dim).map(i => element_at(vec, i) *
          (pmod(xxhash64(lit(probe), lit(plane), lit(i - 1)), lit(1000000L)).cast("double") / 1000000.0 - 0.5))
          .reduce(_ + _)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }
      concat(lit(s"$probe#") +: signBits: _*)
    }
    t("B-16-cols") {
      val withKeys = (0 until 16).foldLeft(base)((d, p) => d.withColumn(s"__k$p", probeKey(col("vec"), 8, p)))
      withKeys.select(sum(length(concat((0 until 16).map(p => col(s"__k$p")): _*)))).collect().head.getLong(0)
    }
    // C: small expr (4 probes x 4 planes) for reference
    t("C-one-expr-4x4") {
      base.withColumn("ks", Similarity.hyperplaneKeys(col("vec"), 4, 4, dim))
        .select(sum(size(col("ks")))).collect().head.getLong(0)
    }
    // D: projections via a broadcast-free matrix: explode dims? -- skip
    spark.stop()
  }
}
