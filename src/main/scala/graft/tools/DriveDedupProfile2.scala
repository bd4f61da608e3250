package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Scratch: isolate where minhash signature time goes — shingle compute vs
  * array-in-group-key vs aggregate count — and candidate volumes in the
  * cosine-LSH and ngram verify joins. */
object DriveDedupProfile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"CHECK $label%-32s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val par = Similarity.parallelize(docs)
    t("p.shingle-count")(par.select(explode(Dedup.shingles(col("text"), 3))).count())
    t("p.shingle-count.again")(par.select(explode(Dedup.shingles(col("text"), 3))).count())

    val withSh = par.select(col("doc_id").as("id"),
      array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s))).as("sh"))
    t("p.sh-only")(withSh.count())

    val exploded = withSh.select(col("id"), col("sh"), explode(col("sh")).as("h"))
    t("p.exploded")(exploded.count())

    // Variant A: current — sh in group key, 128 aggs
    val minsA = (0 until 128).map(k => min(xxhash64(col("h"), lit(k))).as(s"__m$k"))
    t("p.agg128-shkey")(exploded.groupBy("id", "sh").agg(minsA.head, minsA.tail: _*).count())
    // Variant B: no sh — group by id only, 128 aggs
    val ex2 = withSh.select(col("id"), explode(col("sh")).as("h"))
    t("p.agg128-idkey")(ex2.groupBy("id").agg(minsA.head, minsA.tail: _*).count())
    // Variant C: sh in key, 16 aggs
    val minsC = (0 until 16).map(k => min(xxhash64(col("h"), lit(k))).as(s"__m$k"))
    t("p.agg16-shkey")(exploded.groupBy("id", "sh").agg(minsC.head, minsC.tail: _*).count())
    // Variant D: id key, 16 aggs
    t("p.agg16-idkey")(ex2.groupBy("id").agg(minsC.head, minsC.tail: _*).count())
    // Variant E: id key, 128 aggs, re-run (codegen warm)
    t("p.agg128-idkey.again")(ex2.groupBy("id").agg(minsA.head, minsA.tail: _*).count())

    // Candidate volumes
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3)
      .withColumn("bandkey", explode(Dedup.lshBandKeys(col("sig"), 64, 2)))
      .select("id", "sh", "bandkey")
    val mat = sigs.localCheckpoint(false)
    val aa = mat.select(col("bandkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val bb = mat.select(col("bandkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    t("mh.candidates")(aa.join(bb, Seq("bandkey")).where(col("id_a") < col("id_b")).count())

    val sk = Similarity.hyperplaneSketches(embs, "vec_id", "embedding", 8, 16)
      .withColumn("key", explode(col("keys"))).localCheckpoint(false)
    val ca = sk.select(col("key"), col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val cb = sk.select(col("key"), col("vec_id").as("id_b"), col("embedding").as("v_b"))
    t("cl.candidates")(ca.join(cb, Seq("key")).where(col("id_a") < col("id_b")).count())
    spark.stop()
  }
}
