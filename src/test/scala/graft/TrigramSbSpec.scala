package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

class TrigramSbSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("trigram-sb-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Train corpus: one doc "a b c a b c".
  //   c1: a=2 b=2 c=2; N=6, V=3
  //   c2: ab=2 bc=2 ca=1
  //   c3: abc=2 bca=1 cab=1
  private def trainDf = {
    import spark.implicits._
    Seq((0L, "a b c a b c")).toDF("doc_id", "text")
  }

  test("all three backoff branches score their hand-computed values") {
    import spark.implicits._
    val score = Seq(
      (1L, "a b c x b"), // (a,b,c) direct; (b,c,x),(c,x,b) unigram backoff
      (3L, "x a b"),     // (x,a,b): trigram unseen, bigram (a,b) seen
      (5L, "ab"),        // < 3 tokens -> omitted
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.trigramSbNll(trainDf, score, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))

    // doc 1: s(a,b,c) = c3/c2(ab) = 2/2 = 1
    //        s(b,c,x) = 0.4 * 0.4 * (0+1)/(6+3+1)   (x OOV)
    //        s(c,x,b) = 0.4 * 0.4 * (2+1)/(6+3+1)
    val exp1 = (-math.log(1.0) +
      -math.log(0.4 * (0.4 * (1.0 / 10.0))) +
      -math.log(0.4 * (0.4 * (3.0 / 10.0)))) / 3.0
    assert(got(0).getLong(1) == 3L)
    assert(math.abs(got(0).getDouble(2) - exp1) < 1e-12)

    // doc 3: s(x,a,b) = 0.4 * c2(ab)/c1(a) = 0.4 * 2/2 = 0.4
    assert(got(1).getLong(1) == 1L)
    assert(math.abs(got(1).getDouble(2) - (-math.log(0.4))) < 1e-12)
  }

  test("self-scoring the train corpus never backs off and is deterministic") {
    import spark.implicits._
    val got = TextAnalysis.trigramSbNll(trainDf, trainDf, "doc_id", "text")
      .collect()
    assert(got.length == 1)
    // Four trigrams: abc (c3=2/c2(ab)=2), bca (1/c2(bc)=2),
    // cab (1/c2(ca)=1), abc (2/2).
    val exp = (-math.log(1.0) - math.log(0.5) - math.log(1.0) - math.log(1.0)) / 4.0
    assert(got(0).getLong(1) == 4L)
    assert(math.abs(got(0).getDouble(2) - exp) < 1e-12)
    val again = TextAnalysis.trigramSbNll(
      trainDf.repartition(5), trainDf, "doc_id", "text").collect()
    assert(again(0).getDouble(2) == got(0).getDouble(2))
  }

  test("backoff parameter is validated") {
    intercept[IllegalArgumentException] {
      TextAnalysis.trigramSbNll(trainDf, trainDf, "doc_id", "text", backoff = 0.0)
    }
  }
}
