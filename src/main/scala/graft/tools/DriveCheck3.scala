package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Dev drive harness #3: LLM-pipeline operators over the driver's
  * documents/embeddings tables. Run: `sbt "runMain graft.tools.DriveCheck3"`. */
object DriveCheck3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // Exact dedup family.
    println("CHECK20 exact dedup rows: " + Dedup.exact(docs, Seq("text")).count()
      + " byContentHash: " + Dedup.byContentHash(docs, "text").count()
      + " keepFirst(source): " + Dedup.exactKeepFirst(docs, Seq("source"), "doc_id").count())

    // MinHash LSH vs exact n-gram jaccard at threshold 0.5 (word salads are
    // weakly similar; lower threshold to force candidates).
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
    val lsh = Dedup.nearDupMinHash(docs, "doc_id", "text", threshold = 0.5,
      numHashes = 128, bands = 64)
    val exactPairs = exact.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = lsh.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"CHECK21 jaccard>=0.5: exact=${exactPairs.size} lsh=${lshPairs.size} " +
      s"missed=${(exactPairs -- lshPairs).size} spurious=${(lshPairs -- exactPairs).size}")

    // SimHash near-dup.
    val sim = Dedup.nearDupSimHash(docs, "doc_id", "text", maxDistance = 3)
    println("CHECK22 simhash pairs(h<=3): " + sim.count())

    // Embedding cosine near-dup: LSH-bucketed vs all-pairs ground truth.
    val cosLsh = Dedup.nearDupCosine(emb, "vec_id", "embedding", threshold = 0.95)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").cast("array<double>").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").cast("array<double>").as("v_b"))
    val cosExact = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(Similarity.cosineGeneric(col("v_a"), col("v_b")) >= 0.95)
    println(s"CHECK23 cosine>=0.95 pairs: exact=${cosExact.count()} lsh=${cosLsh.count()}")

    // ANN: brute force vs IVF recall.
    val queries = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 8)
    val bfSet = bf.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ivf.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"CHECK24 ann top5: bf=${bfSet.size} ivf=${ivfSet.size} " +
      f"recall=${(bfSet & ivfSet).size.toDouble / bfSet.size}%.2f")
    bf.where(col("query_id") === 0).show(5, truncate = false)

    // Text analysis.
    val annotated = TextAnalysis.annotate(docs, "text")
    annotated.select("doc_id", "n_tokens", "n_subwords", "lang_pred", "quality", "fingerprint")
      .show(5, truncate = false)
    val tokOk = annotated.where(col("n_tokens") =!= size(split(trim(col("text")), "\\s+"))).count()
    val fpDistinct = annotated.agg(countDistinct("fingerprint")).collect().head.getLong(0)
    println(s"CHECK25 token mismatches=$tokOk fingerprint distinct=$fpDistinct (500 texts)")
    println("CHECK25b lang_pred x lang: ")
    annotated.groupBy("lang").agg(count(lit(1)).as("n"),
      sum(when(col("lang_pred") === col("lang"), 1).otherwise(0)).as("matched"))
      .orderBy("lang").show()

    // Multimodal plumbing: binary from text, metadata, stub decode, frames.
    val media = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val withMeta = Multimodal.withMediaMeta(media, "payload")
    val decoded = Multimodal.decodeImages(withMeta, "payload", batchSize = 32)
    val resized = decoded.withColumn("target", Multimodal.resizePlan(col("decoded")))
    val stats = resized.agg(
      count(lit(1)).as("n"),
      sum(when(col("media_meta.byte_len") === length(col("payload")), 0).otherwise(1)).as("bad_len"),
      sum(when(col("decoded.width") > 0, 0).otherwise(1)).as("bad_decode"),
      max(greatest(col("target.width"), col("target.height"))).as("max_side"))
      .collect().head
    println("CHECK26 multimodal: " + stats)
    val frames = media.select(Multimodal.sampleFrames(col("payload"), 4, 16).as("frames"))
      .select(size(col("frames")).as("n"), length(element_at(col("frames"), 1)).as("len0"))
      .agg(min("n"), max("n"), max("len0")).collect().head
    println("CHECK26b frames: " + frames)

    // Feature embedding determinism + shape.
    val fe = media.select(Multimodal.featureEmbedding(col("payload"), 16).as("emb"))
      .agg(min(size(col("emb"))), max(size(col("emb")))).collect().head
    println("CHECK27 feature embedding dims: " + fe)

    spark.stop()
  }
}
