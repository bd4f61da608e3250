package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** PassJoin-blocked bounded edit-distance join: exhaustive completeness
  * against brute force over a small string universe (the property that
  * matters — blocking must never LOSE a true pair), plus code-point
  * segmentation and edge shapes. */
class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteForce(strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def ed(a: String, b: String): Int = {
      val (m, n) = (a.length, b.length)
      val dp = Array.tabulate(m + 1)(i => Array.tabulate(n + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to m; j <- 1 to n)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(m)(n)
    }
    (for {
      (ia, a) <- strs; (ib, b) <- strs if ia < ib
      dist = ed(a, b) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  private def run(strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    Dedup.editDistancePairs(strs.toDF("id", "t"), "id", "t", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("exhaustive completeness vs brute force over {a,b}^0..5, d = 1 and 2") {
    // Every string over a 2-letter alphabet up to length 5 (63 strings):
    // dense enough that every blocking branch (short block, uneven
    // segments, all shift windows) fires.
    val strs = (0 to 5).flatMap(l =>
      (0 until (1 << l)).map(bits =>
        (0 until l).map(i => if ((bits >> i & 1) == 0) 'a' else 'b').mkString))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (d <- Seq(1, 2))
      assert(run(strs, d) === bruteForce(strs, d), s"mismatch at d=$d")
  }

  test("longer mixed-length strings, d = 2") {
    val strs = Seq("synthetic data engine", "synthetic date engine",
      "synthetic data engines", "a synthetic data engine", "spark graft",
      "spark kraft", "spark graft!", "completely different text here",
      "spark", "sparkle", "park", "").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    assert(run(strs, 2) === bruteForce(strs, 2))
  }

  test("code-point segmentation: surrogate pairs count as one edit unit") {
    // "ab<emoji>cd" vs "abXcd": one substitution at the code-point level
    // (Spark's levenshtein unit) even though the emoji is two UTF-16
    // chars — byte/char-based blocking windows would be misaligned.
    val strs = Seq((1L, "ab😀cd"), (2L, "abXcd"), (3L, "ab😀cdE"))
      .toDF("id", "t")
    val got = Dedup.editDistancePairs(strs, "id", "t", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("null text rows are ignored; exact duplicates report dist 0") {
    val strs = Seq((1L, "hello"), (2L, "hello"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = Dedup.editDistancePairs(strs, "id", "t", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 0)))
  }

  test("maxDist bounds are enforced") {
    val df = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df, "id", "t", maxDist = 0))
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df, "id", "t", maxDist = 5))
  }
}
