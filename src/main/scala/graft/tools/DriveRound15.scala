package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 drive: observe the new surfaces end-to-end from the public
  * API — the interleaved pipeline's text-dedup chain over real sf0.001
  * documents, and the broadcast-backed set guards at a size that takes
  * the broadcast arm. Prints CHECK lines. */
object DriveRound15 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("drive-r15").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Interleaved pipeline over REAL documents + synthetic image slots:
    // duplicate every 10th doc's text byte-for-byte so exact_dedup has
    // real work; each doc carries 1 block image.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("text").isNotNull).limit(400)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val withCopies = docs.union(
      docs.where(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val corpus = withCopies.as[(Long, String)].map { case (id, text) =>
      (id, text, Seq(graft.llm.Multimodal.encodeBlockImage(id % 1000000L)))
    }.toDF("doc_id", "text", "images")
    val r = graft.llm.Pipeline.curateInterleaved(corpus, "doc_id", "text", "images")
    val stages = r.stats.orderBy("ord")
      .select("stage", "docs_out", "images_out").collect()
      .map(x => s"${x.getString(0)}=${x.getLong(1)}/${x.getLong(2)}").mkString(" ")
    println(s"CHECK interleaved stages: $stages")
    val exact = r.stats.where(col("stage") === "exact_dedup").collect()(0)
    val lineD = r.stats.where(col("stage") === "line_dedup").collect()(0)
    println(s"CHECK exact_dedup dropped ${lineD.getLong(2) - exact.getLong(2)} text byte-copies (expect > 0)")
    println(s"CHECK survivors=${r.docs.count()} all_have_images=" +
      r.docs.agg(min(size(col("images"))) >= 1).collect()(0).getBoolean(0))

    // Broadcast-backed guard at 2M grams (16 MB > threshold): verdicts
    // must equal the embedded kernel's, and the plan must carry a handle.
    val grams = Array.tabulate(2000000)(i => i.toLong * 7L)
    val probe = spark.range(0, 100000).toDF("id")
      .withColumn("arr", array(col("id") * 7L, col("id") * 7L + 1L))
    val kernels = graft.functions.SetKernels
    val nAuto = probe.where(kernels.anyInSetAuto(spark, col("arr"), grams)).count()
    val nEmb = probe.where(kernels.anyInSet(col("arr"), grams)).count()
    println(s"CHECK broadcast guard verdicts: auto=$nAuto embedded=$nEmb equal=${nAuto == nEmb}")
    spark.stop()
  }
}
