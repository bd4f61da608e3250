package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the DrivePipelineMm plant's collision budgets:
  * (a) pHash distance of a 48×48 resize vs its 64×64 block-image source
  * (must sit inside the image near-dup radius), (b) the background
  * pairwise pHash distance distribution across block-image families
  * (accidental-pair rate at the chosen radius), (c) whether the audio
  * spectral hash is EXACTLY the chosen-band bit pattern (so the driver
  * can replay accidental radius-0 groups in pure arithmetic). */
object DriveMmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    // (a) resize-copy distances over 3000 families
    val resizeD = sc.parallelize(0L until 3000L, 32).map { fam =>
      val orig = graft.llm.Multimodal.sketch64Of(graft.llm.Multimodal.encodeBlockImage(fam), "phash")
      val rez = graft.llm.Multimodal.sketch64Of(graft.llm.Multimodal.resizeOne(graft.llm.Multimodal.encodeBlockImage(fam), 48, 48, "png"), "phash")
      java.lang.Long.bitCount(orig ^ rez)
    }.collect().sorted
    println(s"CHECK resize distances: max=${resizeD.last} p99=${resizeD((resizeD.length * 99) / 100)} median=${resizeD(resizeD.length / 2)}")

    // (b) background pairwise distances over 20k families
    val hs = sc.parallelize(0L until 20000L, 32)
      .map(fam => graft.llm.Multimodal.sketch64Of(graft.llm.Multimodal.encodeBlockImage(fam * 9L), "phash").longValue())
      .collect()
    var minD = 64
    val hist = new Array[Long](65)
    var i = 0
    while (i < hs.length) {
      var j = i + 1
      while (j < hs.length) {
        val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
        hist(d) += 1
        if (d < minD) minD = d
        j += 1
      }
      i += 1
    }
    println(s"CHECK image bg pairs=${hist.sum} min=$minD le4=${hist.take(5).sum} le6=${hist.take(7).sum} le10=${hist.take(11).sum}")

    // (c) audio spectral hash == chosen-band bits?
    val audioOk = sc.parallelize(0L until 2000L, 32).map { fam =>
      def mix(z0: Long): Long = {
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      var bits = 0L
      var k = 0
      while (k < 32) {
        bits |= 1L << (2 * k + (mix(fam * 127L + k) & 1L).toInt)
        k += 1
      }
      val actual = graft.llm.Multimodal.sketch64Of(graft.llm.Multimodal.encodeToneWav(fam, toneFrames = 2048), "audio_spectral")
      actual != null && actual.longValue() == bits
    }.collect()
    println(s"CHECK audio hash replication: ${audioOk.count(identity)}/2000 exact")
    // rescaled copy identity
    val rescOk = sc.parallelize(0L until 500L, 32).map { fam =>
      val a = graft.llm.Multimodal.sketch64Of(graft.llm.Multimodal.encodeToneWav(fam, toneFrames = 2048), "audio_spectral")
      val b = graft.llm.Multimodal.sketch64Of(graft.llm.Multimodal.encodeToneWav(fam, scaleShift = 1, toneFrames = 2048), "audio_spectral")
      a != null && a == b
    }.collect()
    println(s"CHECK audio rescale identity: ${rescOk.count(identity)}/500")
    spark.stop()
  }
}
