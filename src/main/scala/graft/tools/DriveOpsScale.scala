package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the round-10 pipeline operators: runs each over a
  * synthesized 10M–100M-row input on local[32] and reports marginal
  * operator cost (input synthesis is measured separately and subtracted),
  * writing one JSON line per bench to `bench_ops_scale.json`.
  *
  * The inputs are synthesized with the same deterministic xxhash64 idiom
  * the engine uses everywhere, so runs are reproducible; the operators
  * under test are the narrow/zero-shuffle paths whose claim to 100 TB
  * readiness is exactly that their cost is a constant factor on the scan.
  * Run: `sbt "runMain graft.tools.DriveOpsScale"`. */
object DriveOpsScale {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mat(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    /** ~`nTok`-token text from the row id — vocabulary of 5000 words. */
    def text(nTok: Int): Column = array_join(
      transform(sequence(lit(0), lit(nTok - 1)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(5000)).cast("string"))),
      " ")
    /** 64-dim pseudo-embedding in [-0.5, 0.5) from the row id. */
    def vec(dim: Int): Column = transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(col("id"), i), lit(1000000L)).cast("double") / 1e6 - 0.5)

    val out = new StringBuilder
    def bench(name: String, rows: Long, synth: => DataFrame,
        op: DataFrame => DataFrame): Unit = {
      // Warm at 1/10 scale (codegen + JIT), then measure synthesis alone
      // and synthesis+operator; the difference is the operator's marginal
      // cost on a warm pipeline.
      mat(op(synth.limit((rows / 10).toInt)))
      val base = secs(mat(synth))
      val full = secs(mat(op(synth)))
      val marginal = math.max(0.0, full - base)
      val rps = rows / math.max(1e-9, marginal) / 1e6
      val line = f"""{"bench":"$name","rows":$rows,"base_sec":$base%.2f,"full_sec":$full%.2f,"marginal_sec":$marginal%.2f,"marginal_mrows_per_sec":$rps%.1f}"""
      println(s"CHECK $line")
      out.append(line).append('\n')
    }

    val docs10m = spark.range(10000000L).toDF("id").withColumn("text", text(32))
    bench("chunk_10m_docs", 10000000L, docs10m,
      df => graft.llm.Chunking.chunkByTokens(df, "id", "text",
        chunkTokens = 16, overlapTokens = 4))

    val emb10m = spark.range(10000000L).toDF("id").withColumn("embedding", vec(64))
    bench("quantize_10m_vecs", 10000000L, emb10m,
      df => graft.llm.Similarity.quantizeInt8(df, "embedding"))

    val weighted100m = spark.range(100000000L).toDF("id")
      .withColumn("w", (pmod(xxhash64(col("id")), lit(9L)) + 1L).cast("double"))
    bench("weighted_sample_100m_top100k", 100000000L, weighted100m,
      df => graft.llm.Sampling.sampleWeightedN(df, Seq("id"), "w", 100000))

    // Bloom guard: 1M-gram eval set (built once, ~2.5 MB at 20 bits/key)
    // probed by every document's 13-gram windows.
    val evalGrams: Array[Long] = Array.tabulate(1000000) { i =>
      var z = i.toLong + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    bench("bloom_guard_10m_docs_1m_grams", 10000000L, docs10m, { df =>
      val toks = split(trim(lower(col("text"))), "\\s+")
      val sh = graft.functions.ShingleSketch.sketch(toks, 13, 0).getField("sh")
      df.where(!coalesce(
        graft.functions.SetKernels.anyInBloom(sh, evalGrams, 20), lit(false)))
    })

    java.nio.file.Files.write(java.nio.file.Paths.get("bench_ops_scale.json"),
      out.toString.getBytes("UTF-8"))
    println("CHECK wrote bench_ops_scale.json")
    spark.stop()
  }
}
