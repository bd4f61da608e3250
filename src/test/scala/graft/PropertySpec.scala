package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.columns.ColumnCompiler
import graft.engine.Generator
import graft.seed.Seeds
import graft.spec._
import graft.spec.ColumnStrategy._

/** Property-style tests — invariants that must hold for ALL seeds and grid
  * sizes, not just the fixtures (SURVEY.md §5 upgrade over the reference's
  * example-based suite). Driver-side properties sweep hundreds of
  * deterministically-sampled cases; Spark-side ones sample fewer seeds but
  * assert over every generated row.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ------------------------------------------------------- driver-side

  test("affine scatter multiplier is coprime with every grid size") {
    val rnd = new scala.util.Random(11)
    val grids = (2L to 200L) ++ Seq.fill(300)(2L + math.abs(rnd.nextLong() % 1000000000L))
    def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
    grids.foreach { grid =>
      val a = ColumnCompiler.coprimeNearGoldenRatio(grid)
      assert(a > 0 && gcd(a, grid) === 1L, s"grid=$grid a=$a not coprime")
    }
  }

  test("column seed derivation is deterministic and name-sensitive") {
    val rnd = new scala.util.Random(13)
    (1 to 300).foreach { _ =>
      val table = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val colName = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val seed = rnd.nextLong()
      val s1 = Seeds.deriveColumnSeed(seed, table, colName)
      assert(s1 === Seeds.deriveColumnSeed(seed, table, colName))
      assert(Seeds.deriveColumnSeed(seed, table, colName + "x") !== s1)
    }
  }

  // -------------------------------------------------------- spark-side

  private def bounds(seed: Long, min: Long, max: Long, step: Long): Unit = {
    val df = Generator.generate(spark, DataGenPlan(Seq(
      TableSpec("t", 2000, Seq(
        ColumnSpec("v", "bigint", Range(BigDecimal(min), BigDecimal(max), Some(BigDecimal(step))))))),
      seed))("t")
    val bad = df.where(col("v") < min || col("v") > max ||
      pmod(col("v") - min, lit(step)) =!= 0).count()
    assert(bad === 0, s"seed=$seed range=[$min,$max] step=$step produced off-lattice values")
  }

  test("range lattice bounds hold across random seeds and ranges") {
    val cases = Seq(
      (1L, 0L, 100L, 1L), (-7L, -500L, 500L, 7L), (Long.MaxValue / 2, 10L, 11L, 1L),
      (42L, -1000000L, 1000000L, 13L), (999L, 5L, 5L, 1L))
    cases.foreach { case (seed, min, max, step) => bounds(seed, min, max, step) }
  }

  test("scatter permutes the lattice without changing its cardinality") {
    // Scatter applies an affine bijection to the drawn index: the set of
    // distinct values may not cover the whole grid (draws are random with
    // replacement, as in the reference's random-unique mode), but the
    // distinct COUNT must match the unscattered draw exactly, and values
    // must actually move.
    for (grid <- Seq(10L, 97L, 4096L)) {
      def make(scatter: Boolean) = Generator.generate(spark, DataGenPlan(Seq(
        TableSpec("t", grid * 3, Seq(
          ColumnSpec("pk", "bigint", Sequence()),
          ColumnSpec("v", "bigint", Range(0, grid - 1, Some(1)))
            .copy(uniqueValues = Some(grid), scatter = scatter)))), 5L))("t")
      val plain = make(false); val scat = make(true)
      val nPlain = plain.select(countDistinct(col("v"))).head.getLong(0)
      val nScat = scat.select(countDistinct(col("v"))).head.getLong(0)
      assert(nPlain === nScat, s"grid=$grid scatter changed cardinality")
      val moved = plain.alias("p").join(scat.alias("s"), col("p.pk") === col("s.pk"))
        .where(col("p.v") =!= col("s.v")).count()
      assert(moved > 0, s"grid=$grid scatter was the identity")
    }
  }

  test("determinism: same plan twice is byte-identical for sampled seeds") {
    for (seed <- Seq(0L, -1L, 123456789L)) {
      val plan = DataGenPlan(Seq(TableSpec("t", 500, Seq(
        ColumnSpec("a", "bigint", Range(0, 999, Some(1))),
        ColumnSpec("b", "string", Pattern("X-{digit:3}-{alpha:2}")),
        ColumnSpec("cc", "double", Range(0, 1, continuous = true))))), seed)
      val h1 = Generator.generate(spark, plan)("t")
        .select(sum(pmod(xxhash64(struct(col("a"), col("b"), col("cc"))), lit(1000003L))))
        .head.getLong(0)
      val h2 = Generator.generate(spark, plan)("t")
        .select(sum(pmod(xxhash64(struct(col("a"), col("b"), col("cc"))), lit(1000003L))))
        .head.getLong(0)
      assert(h1 === h2, s"seed=$seed not deterministic")
    }
  }
}
