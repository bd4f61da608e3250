package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NormalizeKernel

/** NFKC normalization kernel + the canonical dedup folding. */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("nfkc: compatibility characters map to canonical forms") {
    val df = Seq(
      (1L, "Ｈｅｌｌｏ　Ｗｏｒｌｄ！"),     // fullwidth + ideographic space
      (2L, "eﬃcient ﬁle ﬂow"),             // ligatures
      (3L, "step ② of ③"),                 // circled digits
      (4L, "a b c"),              // NBSP + thin space
      (5L, "½ + ¼"),                        // vulgar fractions
      (6L, "café résumé"),                  // NFC stays NFC
      (7L, "plain ascii"),
      (8L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.withColumn("n", NormalizeKernel.nfkc(col("t")))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getString(2))
    assert(got(0) === "Hello World!")
    assert(got(1) === "efficient file flow")
    assert(got(2) === "step 2 of 3")
    assert(got(3) === "a b c") // both space variants fold to U+0020
    assert(got(4) === "1⁄2 + 1⁄4") // NFKC expands fractions with U+2044
    assert(got(5) === "café résumé")
    assert(got(6) === "plain ascii")
    assert(got(7) === null)
    // Idempotence over every produced value.
    got.filter(_ != null).foreach { s =>
      assert(java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFKC))
    }
  }

  test("foldForDedup: compatibility variants of the same text hash together") {
    val df = Seq(
      (1L, "  The ﬁle  SYSTEM works "),
      (2L, "the file system works"),
      (3L, "ＴＨＥ　ＦＩＬＥ　ＳＹＳＴＥＭ　ＷＯＲＫＳ"))
      .toDF("id", "t")
    val folded = df.select(NormalizeKernel.foldForDedup(col("t")).as("f"))
      .collect().map(_.getString(0)).toSet
    assert(folded === Set("the file system works"))
  }
}
