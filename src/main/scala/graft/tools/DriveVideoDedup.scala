package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Decontamination, Multimodal}

/** Scratch drive (verify recipe): exercise the r14 video fingerprint and
  * the single-pass decontaminate through the public API and print CHECK
  * lines an operator can eyeball. */
object DriveVideoDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- video near-dup over a generated corpus -------------------------
    val sizes = (0 until 24).map(i => 32 + (i * 7) % 40)
    val media = spark.range(0, 160).select(col("id")).as[Long]
      .map { id =>
        val fam = id / 4
        val bytes = (id % 4) match {
          case 0L => Multimodal.encodeMp4Media(fam, sizes, Seq.fill(6)(4))
          case 1L =>
            if (fam % 3 == 2) s"not-an-mp4-$id".getBytes("UTF-8")
            else Multimodal.encodeMp4Media(fam, sizes, Seq.fill(8)(3), timescale = 90000)
          case 2L => Multimodal.encodeMp4Media(fam, sizes, Seq.fill(6)(4),
            alteredFrames = Set(7))
          case _ => Multimodal.encodeMp4Media(fam + 9000L, sizes, Seq.fill(6)(4))
        }
        (id, bytes)
      }.toDF("doc_id", "payload")
    val hashed = Multimodal.videoHashes(media, "payload")
    val nNull = hashed.where(col("vhash").isNull).count()
    println(s"CHECK video_null_hashes=$nNull (expect 13: garbage slot of every 3rd family)")
    val pairs = Dedup.nearDupHamming64(hashed, "doc_id", "vhash",
      maxDistance = 4, pieces = 8)
    val nPairs = pairs.count()
    println(s"CHECK video_pairs=$nPairs (expect 27*3 + 13*1 = 94)")
    val crossFam = pairs.where(col("id_a").divide(4).cast("long") =!=
      col("id_b").divide(4).cast("long")).count()
    println(s"CHECK video_cross_family_pairs=$crossFam (expect 0)")

    // --- decontaminate single-pass plan shape ---------------------------
    val train = spark.range(0, 2000).toDF("id").withColumn("text",
      concat_ws(" ", (0 until 20).map(k => concat(lit("w"),
        pmod(xxhash64(col("id"), lit(k)), lit(900)).cast("string"))): _*))
    val eval = train.where(col("id") >= 1990)
    val kept = Decontamination.decontaminate(train, eval, "id", "text", n = 7)
    val keptN = kept.count()
    println(s"CHECK decon_kept=$keptN (expect 1990: the 10 eval-verbatim docs drop)")
    val plan = kept.queryExecution.executedPlan.toString
    val shingleScans = "graft_shingle_sketch".r.findAllIn(plan).size
    println(s"CHECK decon_shingle_kernels_in_plan=$shingleScans (expect <= 2: one train pass + one eval pass)")
    spark.stop()
  }
}
