package graft.columns

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.seed.Seeds

/** Shared lookup-table char generation: one xxhash64 drives a whole group
  * of chars by indexing a precomputed table of every `groupSize`-length
  * combination of the charset (`element_at` over a `typedLit` array is a
  * plan reference object, not generated code — the inline alternative costs
  * ~3KB of Java per char because every char needs its own hash, and wide
  * text columns then overflow the 64KB whole-stage-codegen method limit).
  *
  * Tables are built once per (charset, groupSize) on the driver:
  * 26^3 = 17,576 three-char strings for an alpha class, 36^3 = 46,656 for
  * alphanumerics — megabytes at worst, broadcast with the plan.
  */
object CharTables {

  /** Max combos worth materializing (3 chars of a 36-char class). */
  private val MaxGroup = 3

  private val cache = scala.collection.concurrent.TrieMap.empty[(String, Int), Seq[String]]

  private def table(cs: String, g: Int): Seq[String] =
    cache.getOrElseUpdate((cs, g), {
      val L = cs.length
      val n = math.pow(L, g).toInt
      (0 until n).map { v =>
        val sb = new StringBuilder
        var x = v
        var j = 0
        while (j < g) { sb.append(cs.charAt(x % L)); x /= L; j += 1 }
        sb.toString
      }
    })

  /** A run of `n` chars uniformly drawn from `cs`, grouped `MaxGroup` chars
    * per hash. `runSeed` must be unique per run within the column. */
  def run(cs: String, n: Int, runSeed: Long, id: Column): Column = {
    val groups = (0 until n).grouped(MaxGroup).zipWithIndex.map { case (grp, gi) =>
      val g = grp.size
      val combos = table(cs, g)
      element_at(typedLit(combos),
        pmod(Seeds.cellSeed(Seeds.subSeed(runSeed, gi), id), lit(combos.length.toLong))
          .cast("int") + 1)
    }.toSeq
    if (groups.length == 1) groups.head else concat(groups: _*)
  }
}
