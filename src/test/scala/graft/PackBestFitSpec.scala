package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Packing

/** Best-fit-decreasing bin packing. */
class PackBestFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand instance: tightest-fit placement, pack sums, oversized singleton") {
    // Tokens 5,4,3,3,2,1 at budget 7. BFD: 5->p0(2), 4->p1(3), 3->p1(0),
    // 3->p2(4), 2->p0(0), 1->p2(3). Pack sums {7, 7, 4} in 3 packs —
    // next-fit needs >= 3 and typically 4 on this instance.
    val df = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 3L), (5L, 2L), (6L, 1L))
      .toDF("id", "tok")
    val packed = Packing.binPackBestFit(df, Seq("id"), "tok", maxTokens = 7, shards = 1)
    val sums = packed.groupBy("pack_id").agg(sum("tok").as("s"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(sums === Seq(4L, 7L, 7L))

    // Within-pack positions follow descending token order.
    val rows = packed.select("pack_id", "pack_pos", "tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values
    rows.foreach { g =>
      val byPos = g.sortBy(_._2).map(_._3)
      assert(byPos === byPos.sortBy(-_), s"pack not in descending token order: $byPos")
    }

    // Oversized doc gets its own pack; others still pack tightly.
    val big = Seq((1L, 10L), (2L, 7L), (3L, 3L)).toDF("id", "tok")
    val bp = Packing.binPackBestFit(big, Seq("id"), "tok", maxTokens = 7, shards = 1)
    val byId = bp.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(1L) != byId(2L) && byId(2L) != byId(3L) && byId(1L) != byId(3L))
  }

  test("degenerate tokens: zeros, nulls and negatives attach without opening packs") {
    // 0/null/negative counts normalize to 0 tokens; they must neither
    // overflow a pack nor open one of their own when any pack exists.
    val df = Seq((1L, java.lang.Long.valueOf(5L)), (2L, java.lang.Long.valueOf(0L)),
      (3L, null.asInstanceOf[java.lang.Long]), (4L, java.lang.Long.valueOf(-3L)),
      (5L, java.lang.Long.valueOf(7L))).toDF("id", "tok")
    val packed = Packing.binPackBestFit(df, Seq("id"), "tok", maxTokens = 7, shards = 1)
    val nPacks = packed.select("pack_id").distinct().count()
    assert(nPacks === 2, "only the 5- and 7-token docs may open packs")
    assert(packed.count() === 5)
    // An all-degenerate shard still packs every row (one pack, zero load).
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("id", "tok")
    val zp = Packing.binPackBestFit(zeros, Seq("id"), "tok", 7, shards = 1)
    assert(zp.count() === 2)
    assert(zp.select("pack_id").distinct().count() === 1)

    // Regression: full/oversized packs (remaining 0) are retired from the
    // capacity index, so a zero-token row after an OVERSIZED doc does NOT
    // attach to the oversized singleton — it opens its own (empty) pack.
    // (Historically the capacity-0 bucket both NPE'd on the raw negative
    // remainder and, once clamped, violated the singleton contract.)
    val over = Seq((1L, 10L), (2L, 0L)).toDF("id", "tok")
    val op = Packing.binPackBestFit(over, Seq("id"), "tok", 7, shards = 1)
    assert(op.count() === 2)
    assert(op.select("pack_id").distinct().count() === 2)
    // The oversized doc remains alone in its pack.
    val byId2 = op.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId2(1L) !== byId2(2L))
    // And a doc that exactly fills its pack also retires it: the next
    // zero-token row opens a new pack instead of joining the full one.
    val full = Seq((1L, 7L), (2L, 0L)).toDF("id", "tok")
    val fp = Packing.binPackBestFit(full, Seq("id"), "tok", 7, shards = 1)
    assert(fp.select("pack_id").distinct().count() === 2)
  }

  test("determinism, partition independence, shard reset") {
    val df = (1L to 500L).map(i => (i, (i * 37 % 97) + 1)).toDF("id", "tok")
    val a = Packing.binPackBestFit(df, Seq("id"), "tok", 128, shards = 4)
      .select("id", "pack_shard", "pack_id", "pack_pos").collect().toSet
    val b = Packing.binPackBestFit(df.repartition(13), Seq("id"), "tok", 128, shards = 4)
      .select("id", "pack_shard", "pack_id", "pack_pos").collect().toSet
    assert(a === b, "pack assignment must not depend on input partitioning")
  }

  test("real corpus: no overflow, all packed, never more packs than next-fit") {
    import graft.llm.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")).cast("long"))
    val budget = 512L
    val bfd = Packing.binPackBestFit(docs, Seq("doc_id"), "n_tok", budget, shards = 8)
    val agg = bfd.groupBy("pack_shard", "pack_id")
      .agg(sum("n_tok").as("tok"), count(lit(1)).as("ndocs"))
    assert(agg.where(col("tok") > budget && col("ndocs") > 1).count() === 0)
    assert(bfd.count() === docs.count())
    val nBfd = agg.count()
    val nNf = Packing.binPack(docs, Seq("doc_id"), "n_tok", budget, shards = 8)
      .select("pack_shard", "pack_id").distinct().count()
    info(s"packs: best-fit-decreasing $nBfd vs next-fit $nNf")
    assert(nBfd <= nNf)
  }
}
