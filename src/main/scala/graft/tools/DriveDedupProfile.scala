package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Scratch: stage-by-stage wall profile of the dedup bench family at sf0.1,
  * with repeat runs to split fixed (analyze/codegen) cost from execution. */
object DriveDedupProfile {
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

    // --- minhash decomposition (q_dedup_minhash uses threshold=0.5, 128/64?)
    t("mh.shingle-count")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    t("mh.sig128")(Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3).count())
    t("mh.sig128.again")(Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3).count())
    val prepared = Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3)
      .withColumn("bandkey", explode(Dedup.lshBandKeys(col("sig"), 64, 2)))
      .select("id", "sh", "bandkey")
    t("mh.band-explode")(prepared.count())
    t("mh.full")(Dedup.nearDupMinHash(docs, "doc_id", "text", 0.5, 128, 64).count())
    t("mh.full.again")(Dedup.nearDupMinHash(docs, "doc_id", "text", 0.5, 128, 64).count())

    // --- cosine LSH decomposition (q_dedup_cosine_lsh: thr .4, 8 planes, 16 probes)
    t("cl.sketches")(Similarity.hyperplaneSketches(embs, "vec_id", "embedding", 8, 16).count())
    t("cl.sketches.again")(Similarity.hyperplaneSketches(embs, "vec_id", "embedding", 8, 16).count())
    t("cl.full")(Dedup.nearDupCosine(embs, "vec_id", "embedding", 0.4, 8, 16, 500).count())
    t("cl.full.again")(Dedup.nearDupCosine(embs, "vec_id", "embedding", 0.4, 8, 16, 500).count())

    // --- ngram jaccard
    t("nj.full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8, 3).count())
    t("nj.full.again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8, 3).count())
    spark.stop()
  }
}
