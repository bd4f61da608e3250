package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MojibakeKernel

class MojibakeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("mojibake-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Corrupt `s` the way the wild does: UTF-8 bytes decoded as cp1252. */
  private def corrupt(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  test("repairs classic UTF-8-as-cp1252 corruption, driver-side") {
    // (cp1252-decodable cases only: bytes 0x81/8D/8F/90/9D are UNDEFINED
    // in cp1252 and a cp1252 decoder destroys them to U+FFFD — that
    // corruption is lossy and unrepairable by construction.)
    for (clean <- Seq("café", "naïve — déjà vu", "über 5€", "日本語",
        "smart “quotes and …", "Ωμέγα")) {
      val broken = corrupt(clean)
      assert(broken != clean, s"corruption should change '$clean'")
      assert(MojibakeKernel.fix(broken) == clean, s"repair of '$broken'")
    }
  }

  test("repairs the Latin-1-decoded variant (C1 ghosts), incl. cp1252-lossy chars") {
    for (clean <- Seq("smart “quotes” and …", "déjà ‟vu”", "café")) {
      val broken = new String(clean.getBytes("UTF-8"), "ISO-8859-1")
      assert(broken != clean)
      assert(MojibakeKernel.fix(broken) == clean, s"repair of '$broken'")
    }
  }

  test("no-ops: ASCII, legitimate accents, already-clean unicode, invalid sequences") {
    for (s <- Seq("plain ascii text", "café au lait", // é alone: no lead byte
        "résumé naïve", "price 5€ only", // real € without Ã ghosts
        "ÃÃÃ", // lead bytes with no valid continuation -> invalid UTF-8
        "", "a")) {
      assert(MojibakeKernel.fix(s) == s, s"'$s' must pass through")
    }
  }

  test("column form: repaired equals driver repair; null contract; clean corpus untouched") {
    import spark.implicits._
    val rows = Seq((1L, corrupt("café")), (2L, "plain"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), MojibakeKernel.fixMojibake(col("t")).as("f"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "café")
    assert(rows(1).getString(1) == "plain")
    assert(rows(2).isNullAt(1))
  }

  test("one round only: double corruption repairs one layer") {
    val once = corrupt("é")
    val twice = corrupt(once)
    assert(MojibakeKernel.fix(twice) == once)
    assert(MojibakeKernel.fix(once) == "é")
  }
}
