package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Scratch: aggregate-kernel variants for the minhash signature stage. */
object DriveDedupProfile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"CHECK $label%-32s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val par = Similarity.parallelize(docs)
    val withSh = par.select(col("doc_id").as("id"),
      array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s))).as("sh"))
      .localCheckpoint(true)
    val ex2 = withSh.select(col("id"), explode(col("sh")).as("h"))
    t("warm.exploded")(ex2.count())
    t("warm.exploded.again")(ex2.count())

    // A: current kernel — min(xxhash64(h, k)) x128
    val minsA = (0 until 128).map(k => min(xxhash64(col("h"), lit(k))).as(s"__m$k"))
    t("aggA.xxhash128")(ex2.groupBy("id").agg(minsA.head, minsA.tail: _*).count())
    t("aggA.xxhash128.again")(ex2.groupBy("id").agg(minsA.head, minsA.tail: _*).count())

    // B: multiply-shift family — min(h * oddA_k + b_k) x128 (tiny bytecode)
    def oddA(k: Int): Long = 0x9E3779B97F4A7C15L * (2 * k + 1)
    def bC(k: Int): Long = 0xC2B2AE3D27D4EB4FL * k
    val minsB = (0 until 128).map(k => min(col("h") * lit(oddA(k)) + lit(bC(k))).as(s"__m$k"))
    t("aggB.mult128")(ex2.groupBy("id").agg(minsB.head, minsB.tail: _*).count())
    t("aggB.mult128.again")(ex2.groupBy("id").agg(minsB.head, minsB.tail: _*).count())

    // C: multiply + xor-shift (better avalanche, still small bytecode)
    val minsC = (0 until 128).map { k =>
      val m = col("h") * lit(oddA(k)) + lit(bC(k))
      min(m.bitwiseXOR(shiftrightunsigned(m, 29))).as(s"__m$k")
    }
    t("aggC.multxor128")(ex2.groupBy("id").agg(minsC.head, minsC.tail: _*).count())
    t("aggC.multxor128.again")(ex2.groupBy("id").agg(minsC.head, minsC.tail: _*).count())

    // D: codegen disabled for comparison (interpreted baseline)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("aggD.xxhash128.nocodegen")(ex2.groupBy("id").agg(minsA.head, minsA.tail: _*).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.stop()
  }
}
