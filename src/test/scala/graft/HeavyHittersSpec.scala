package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.CorpusStats
import graft.llm.CorpusStats.MisraGries

/** Mergeable Misra-Gries frequent-items summary: hand-traced stream and
  * merge shrinks, the undercount sandwich, the tracked-iff-frequent
  * guarantee, and the mergeable-summaries error bound, plus the
  * distributed treeAggregate path against exact counts. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact regime: capacity >= distinct items keeps true counts, dec = 0") {
    val mg = new MisraGries(8)
    "a b a c a b".split(" ").foreach(mg.add(_))
    assert(mg.dec === 0L)
    assert(mg.weight === 6L)
    assert(mg.items === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("stream shrink: hand-traced decrement at capacity") {
    val mg = new MisraGries(2)
    Seq("a", "a", "a", "b", "c").foreach(mg.add(_))
    // insert c -> {a:3, b:1, c:1} over capacity; min=1 subtracts:
    assert(mg.items === Seq(("a", 2L)))
    assert(mg.dec === 1L)
    assert(mg.weight === 5L)
    // sandwich for tracked a: 2 <= 3 <= 2+1; untracked b/c: true 1 <= dec.
  }

  test("merge: pointwise add then (k+1)-th-largest shrink, errors add") {
    val m1 = new MisraGries(2); m1.add("a", 2); m1.add("b", 2)
    val m2 = new MisraGries(2); m2.add("a", 1); m2.add("c", 2)
    m1.merge(m2)
    // {a:3, b:2, c:2} -> 3rd largest = 2 subtracts -> {a:1}, dec = 2.
    assert(m1.items === Seq(("a", 1L)))
    assert(m1.dec === 2L)
    assert(m1.weight === 7L)
    assert(m1.dec * 3 <= m1.weight)
    intercept[IllegalArgumentException](m1.merge(new MisraGries(3)))
  }

  test("distributed: sandwich, guarantee, and error bound vs exact counts") {
    // Zipf-ish corpus: token t_i appears ~ 200/i times, plus a long tail.
    val words = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i")) ++
      (1 to 300).map(i => s"tail$i")
    val docs = words.grouped(17).map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(7)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val w = words.size.toLong
    val mg = CorpusStats.heavyHitters(docs, "text", k = 16)
    assert(mg.weight === w)
    assert(mg.dec * 17 <= w)
    mg.items.foreach { case (t, est) =>
      val tr = exact(t)
      assert(est <= tr && tr <= est + mg.dec, s"sandwich broke for $t")
    }
    val tracked = mg.items.map(_._1).toSet
    exact.foreach { case (t, tr) =>
      if (tr > mg.dec) assert(tracked(t), s"frequent $t (count $tr) untracked")
    }
    // Exact confirmation pass agrees with the brute-force counts.
    val confirmed = CorpusStats.exactCounts(docs, "text", mg.items.map(_._1))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    confirmed.foreach { case (t, c) => assert(c === exact(t)) }
  }
}
