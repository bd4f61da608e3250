package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale proof for the end-to-end curation pipeline (`llm/Pipeline`):
  * synthesizes an N-doc corpus exercising EVERY stage (a language family
  * that dies at langid, a punctuation family at quality, repeated-line
  * docs, exact and near duplicate pairs, decontamination victims), runs
  * `Pipeline.curate`, and records per-stage wall + survival. One JSON
  * line per corpus size into `bench_pipeline.json`; run two sizes and
  * compare stage walls for superlinearity.
  * Run: `sbt "runMain graft.tools.DrivePipelineScale [rows ...]"`. */
object DrivePipelineScale {

  def main(args: Array[String]): Unit = {
    // Shuffle files + spilled checkpoint blocks default to tmpfs (r14) so
    // the shared disk stays out of the small/mid-size measurements; for
    // the largest corpora tmpfs COMPETES with the JVM heap for the same
    // physical RAM, so `SPARK_GRAFT_LOCAL_DIR=/tmp` puts the working set
    // back on disk — which now fits: the selective banding shrank the
    // r13-era ~58 GB banded-explode checkpoint ~4x.
    val local = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      Seq("/dev/shm", "/tmp").find(p => new java.io.File(p).isDirectory).get)
    // Shuffle-partition count scales with the corpus (the brief's sizing
    // rule: partitions must fit executor memory at the target SF) — at
    // 100M docs the 32-partition default puts ~3M rows in each
    // hash-aggregate task and trips UNABLE_TO_ACQUIRE_MEMORY; 256 keeps
    // per-task state spillable. Env-tunable for the biggest runs.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "32")
    // The biggest single-JVM runs are bounded by 32 threads' simultaneous
    // task state sharing one heap with all block storage (BENCH_NOTES r14
    // 100M attempts 1-3). Two geometry knobs: fewer executor threads
    // (each task keeps its state longer but holds less heap at once), and
    // a small protected-storage fraction so execution pressure can evict
    // checkpointed stage blocks to disk instead of OOMing around them.
    val threads = sys.env.getOrElse("SPARK_GRAFT_THREADS", "32")
    val storageFrac = sys.env.getOrElse("SPARK_GRAFT_STORAGE_FRACTION", "0.5")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.memory.storageFraction", storageFrac)
      // The stage checkpoints store serialized (r14); lz4 on those blocks
      // trades CPU for the disk that bounds the biggest single-box runs.
      // Default off so the core 3M/10M/30M numbers stay comparable.
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "false"))
      .config("spark.local.dir", s"$local/graft_pipe_local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(10000000L, 30000000L)
    val out = new StringBuilder

    def boxSteal(): Long = try {
      val ticks = scala.io.Source.fromFile("/proc/stat").getLines().next().trim
        .split("\\s+").drop(1).map(_.toLong)
      ticks(7)
    } catch { case _: Throwable => 0L }

    sizes.foreach { n =>
      // ~21-token English-stopword-bearing body, unique per id; families:
      //  id%17=1 -> French (langid kill), id%17=2 -> punct spam (quality
      //  kill), id%17=3 -> repeated line (token shrink), id%17=4 -> exact
      //  copy of id-4 (a plain-en_good id: id-4 ≡ 0 mod 17), id%17=5 ->
      //  near-dup of id-5 (+1 token on 21 ⇒ shingle jaccard 19/20 = 0.95
      //  — past the r14 selective banding's S-curve knee, so the planted
      //  survival counts stay exact; P(miss) ~ 3e-8 per pair).
      val i = col("id").cast("string")
      val prevExact = (col("id") - 4).cast("string")
      val prevNear = (col("id") - 5).cast("string")
      def enGood(idc: org.apache.spark.sql.Column) = concat(lit("w"), idc,
        lit("a the quick brown fox jumps over the lazy dog w"), idc,
        lit("b it was good that it is here and now w"), idc, lit("c"))
      val fam = pmod(col("id"), lit(17))
      val body = when(fam === 1, concat(lit("le chat et le chien sont dans " +
          "la maison avec les amis et la famille w"), i))
        .when(fam === 2, lit("the it was " +
          Seq("!", "?", "@", "#", "$", "%", "^").map(c => c * 20).mkString(" ")))
        .when(fam === 3, concat(
          lit("the cat sat on the mat with w"), i, lit("x\n"),
          lit("it was here and it is there w"), i, lit("y\n"),
          lit("it was here and it is there w"), i, lit("y")))
        .when(fam === 4, enGood(prevExact))
        .when(fam === 5, concat(enGood(prevNear), lit(" extra")))
        .otherwise(enGood(i))
      // Materialize the input once (parquet) so stage walls measure the
      // pipeline, not the synthesis expression.
      val dir = s"/tmp/graft_pipeline_scale_$n"
      if (!new java.io.File(dir, "_SUCCESS").exists())
        spark.range(n).toDF("id")
          .select(col("id").as("doc_id"), body.as("text"))
          .write.mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)
      val eval = spark.range(64).toDF("k")
        .select((col("k") + n + 7L).as("doc_id"),
          enGood((col("k") * 17 + 6).cast("string")).as("text"))
      // The near-dup bucket cap (linearity backstop) tightens for the
      // biggest runs: this plant shares 13 template shingles across the
      // WHOLE corpus, so sub-cap boilerplate buckets grow linearly with n
      // and their pair mass quadratically until the cap bites. Planted
      // near-dup pairs share document-specific band keys (tiny buckets),
      // so recall on them is cap-independent — verified by the exact
      // stage counts.
      val maxBucket = sys.env.get("SPARK_GRAFT_MAXBUCKET").map(_.toInt)
        .getOrElse(1000)
      val st0 = boxSteal()
      val t0 = System.nanoTime()
      val r = graft.llm.Pipeline.curate(corpus, "doc_id", "text", Some(eval),
        graft.llm.Pipeline.Config(maxBucket = maxBucket))
      val total = (System.nanoTime() - t0) / 1e9
      val st1 = boxSteal()
      val stages = r.stats.orderBy("ord").collect().map { x =>
        f"""{"stage":"${x.getString(1)}","rows_out":${x.getLong(2)},"tokens_out":${x.getLong(3)},"wall_sec":${x.getDouble(4)}%.2f,"capped_rows":${x.getLong(5)}}"""
      }.mkString("[", ",", "]")
      val line = f"""{"bench":"pipeline_e2e_${n / 1000000}m_docs","rows":$n,"total_sec":$total%.1f,"steal_sec":${(st1 - st0) / 100.0}%.1f,"stages":$stages}"""
      println(s"CHECK $line")
      out.append(line).append('\n')
      r.docs.unpersist()
    }

    val path = java.nio.file.Paths.get("bench_pipeline.json")
    val merged =
      if (!java.nio.file.Files.exists(path)) out.toString
      else {
        val fresh = out.toString.linesIterator.toSeq
        val freshNames = fresh.map(l => l.split("\"")(3)).toSet
        val kept = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
          .linesIterator.filter(l => l.nonEmpty && !freshNames(l.split("\"")(3)))
        (kept ++ fresh).mkString("", "\n", "\n")
      }
    java.nio.file.Files.write(path, merged.getBytes("UTF-8"))
    println(s"CHECK wrote bench_pipeline.json (${out.length} chars)")
    spark.stop()
  }
}
