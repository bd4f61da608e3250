package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ShingleSketch
import graft.llm.Dedup

/** The fused shingle sketch must be BIT-IDENTICAL to the explode+aggregate
  * pipeline it replaces (pinned dedup oracles depend on the signatures). */
class ShingleSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three"),                      // n == width boundary
    (3L, "solo"),                               // single token
    (4L, ""),                                   // empty text -> [""] token
    (5L, "dup dup dup dup dup"),                // repeated shingles collapse in sh
    (6L, "  padded   whitespace\ttabs\nnewlines  ")
  ).toDF("doc_id", "text")

  test("fused sketch equals the explode+aggregate pipeline bit-for-bit") {
    val old = Dedup.minHashSignatures(docs, "doc_id", "text", numHashes = 32, shingleWidth = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))).toMap
    val toks = split(trim(lower(col("text"))), "\\s+")
    val fused = docs.where(col("text").isNotNull)
      .select(col("doc_id"), ShingleSketch.sketch(toks, 3, 32).as("sk"))
      .select(col("doc_id"), col("sk.sh"), col("sk.sig"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))).toMap
    assert(fused.keySet === old.keySet)
    fused.keySet.foreach { id =>
      assert(fused(id)._1 === old(id)._1, s"sh mismatch for doc $id")
      assert(fused(id)._2 === old(id)._2, s"sig mismatch for doc $id")
    }
  }

  test("interpreted path agrees with codegen") {
    val toks = split(trim(lower(col("text"))), "\\s+")
    def run(): Map[Long, List[Long]] = docs
      .select(col("doc_id"), ShingleSketch.sketch(toks, 3, 16).getField("sig").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val a = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() === a)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("fused simhash equals the vote-aggregate pipeline bit-for-bit") {
    // Rebuild the legacy 64-vote aggregate inline and compare.
    val exploded = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"v$b")
    }
    val legacy = exploded.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce((x, y) => x.bitwiseOR(y)).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Dedup.simHashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === legacy)
  }

  test("fused hyperplane keys equal the projection-aggregate pipeline bit-for-bit") {
    // Pseudo-random 16-dim vectors incl. exact zeros; planes=6, probes=4.
    val vecs = spark.range(50).select(col("id"),
      transform(sequence(lit(0), lit(15)), i =>
        when(pmod(xxhash64(col("id"), i), lit(7)) === 0, lit(0.0))
          .otherwise(pmod(xxhash64(i, col("id")), lit(1000)).cast("double") / 250.0 - 2.0))
        .as("vec"))
    val (planes, probes) = (6, 4)
    // Legacy pipeline, rebuilt inline.
    val exploded = vecs
      .select(col("id"), posexplode(col("vec").cast("array<double>")).as(Seq("pos", "x")))
    def component(p: Int, l: Int) =
      pmod(xxhash64(lit(p), lit(l), col("pos")), lit(1000000L))
        .cast("double") / 1000000.0 - 0.5
    val projAggs = for (p <- 0 until probes; l <- 0 until planes)
      yield sum(col("x") * component(p, l)).as(s"pj_${p}_$l")
    val legacy = exploded.groupBy("id").agg(projAggs.head, projAggs.tail: _*)
      .select(col("id"), array((0 until probes).map { p =>
        concat(lit(s"$p#") +: (0 until planes).map(l =>
          when(col(s"pj_${p}_$l") >= 0, lit("1")).otherwise(lit("0"))): _*)
      }: _*).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val fused = graft.llm.Similarity.hyperplaneSketches(vecs, "id", "vec", planes, probes)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(fused === legacy)
  }

  test("dropNearDupsSimHash / dropNearDupsCosine keep the smaller id per pair") {
    val txt = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 1
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("id", "text")
    val keptTxt = Dedup.dropNearDupsSimHash(txt, "id", "text", maxDistance = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptTxt === Set(1L, 3L))

    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(1.0, 1e-9, 0.0, 0.0)),  // near-dup of 1
      (3L, Array(0.0, 0.0, 1.0, 0.0))
    ).toDF("id", "vec")
    val keptEmb = Dedup.dropNearDupsCosine(emb, "id", "vec", threshold = 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptEmb === Set(1L, 3L))
  }

  test("null text yields a null sketch; zero hash families allowed") {
    val d = Seq((1L, Option("a b c d")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val r = d.select(col("doc_id"), ShingleSketch.sketch(toks, 3, 0).as("sk"))
      .orderBy("doc_id").collect()
    assert(!r(0).isNullAt(1))
    assert(r(0).getStruct(1).getSeq[Long](1).isEmpty, "numHashes=0 -> empty sig")
    assert(r(1).isNullAt(1))
  }
}
