package graft.dist

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.seed.Seeds
import graft.spec.Distribution

/** Closed-form inverse-CDF distributions as pure Column expressions.
  *
  * Given a per-cell 64-bit seed, produce an index in `[0, n)` (or a value in
  * continuous space). All formulas are deterministic hash → inverse-CDF
  * transforms: no RNG state, no UDFs, whole-stage-codegen friendly.
  * Semantics follow dbldatagen/core/engine/distributions.py:45-240. Gamma and
  * Beta — whose inverse CDFs have no elementary closed form — go through the
  * exact numerical quantile kernel ([[graft.functions.DistKernels]]), so all
  * nine laws are distribution-exact.
  */
object Distributions {

  /** Two decorrelated uniforms for Box-Muller-style draws. */
  private def u1(columnSeed: Long, id: Column): Column =
    Seeds.uniformFraction(Seeds.subSeed(columnSeed, 0), id)
  private def u2(columnSeed: Long, id: Column): Column =
    Seeds.uniformFraction(Seeds.subSeed(columnSeed, 1), id)

  /** Clamp to [0, 1) open above so downstream floor(n*u) stays < n. */
  private def openUnit(u: Column): Column = least(u, lit(1.0 - 1e-12))

  /** Standard normal draw via Box-Muller: sqrt(-2 ln u1) * cos(2 pi u2).
    * u1 is nudged away from 0 to keep ln finite. */
  def standardNormal(columnSeed: Long, id: Column): Column = {
    val a = greatest(u1(columnSeed, id), lit(1e-15))
    sqrt(lit(-2.0) * log(a)) * cos(lit(2.0 * math.Pi) * u2(columnSeed, id))
  }

  /** Uniform fraction in [0,1). */
  def fraction(columnSeed: Long, id: Column): Column =
    Seeds.uniformFraction(columnSeed, id)

  private def clampIndex(idx: Column, n: Long): Column =
    greatest(least(idx, lit(n - 1)), lit(0L))

  /** Index in [0, n) distributed per `dist`. `n` must be >= 1. */
  def index(dist: Distribution, columnSeed: Long, id: Column, n: Long): Column = {
    require(n >= 1, s"distribution domain must be >= 1, got $n")
    if (n == 1) lit(0L)
    else dist match {
      case Distribution.Uniform =>
        pmod(Seeds.cellSeed(columnSeed, id), lit(n))

      case Distribution.Normal(mean, stddev) =>
        // Index-space default: centered at (n-1)/2 with std n/6 so ~99.7% of
        // mass lands in range before clamping.
        val m = mean.getOrElse((n - 1) / 2.0)
        val s = stddev.getOrElse(n / 6.0)
        val z = standardNormal(columnSeed, id)
        clampIndex(floor(z * lit(s) + lit(m)).cast("long"), n)

      case Distribution.Zipf(alpha) =>
        // Inverse CDF of a bounded continuous power law on [1, n+1] with
        // shape (alpha-1): low indexes are heavily favored; exact for the
        // continuous relaxation, clamped to the lattice.
        val a = alpha - 1.0
        val u = openUnit(fraction(columnSeed, id))
        val hMax = 1.0 - math.pow(1.0 / (n + 1.0), a)
        val x = pow(lit(1.0) - u * lit(hMax), lit(-1.0 / a))
        clampIndex(floor(x).cast("long") - lit(1L), n)

      case Distribution.Exponential(rate) =>
        // -ln(1-u)/rate scaled so the mean index sits near n/5 at rate=1
        // (matches the reference's n/5 scaling).
        val u = openUnit(fraction(columnSeed, id))
        val x = (negate(log(lit(1.0) - u)) / lit(rate)) * lit(n / 5.0)
        clampIndex(floor(x).cast("long"), n)

      case Distribution.LogNormal(mu, sigma) =>
        // exp(N(mu, sigma)) scaled by n / (e^mu * 10): median mass near n/10.
        val z = standardNormal(columnSeed, id)
        val scale = n / (math.exp(mu) * 10.0)
        val x = exp(z * lit(sigma) + lit(mu)) * lit(scale)
        clampIndex(floor(least(x, lit(9.0e18))).cast("long"), n)

      case Distribution.Gamma(shape, scale) =>
        clampIndex(floor(gammaDraw(shape, scale, columnSeed, id)).cast("long"), n)

      case Distribution.Beta(al, be) =>
        val b = betaDraw(al, be, columnSeed, id)
        clampIndex(floor(b * lit(n.toDouble)).cast("long"), n)

      case Distribution.Pareto(alpha) =>
        // Bounded Pareto on [1, n+1]: inverse CDF with tail exponent alpha
        // (pdf ~ x^-(alpha+1)). Bounding (like Zipf above) avoids clamping a
        // mass spike onto the last index.
        val u = openUnit(fraction(columnSeed, id))
        val hMax = 1.0 - math.pow(1.0 / (n + 1.0), alpha)
        val x = pow(lit(1.0) - u * lit(hMax), lit(-1.0 / alpha))
        clampIndex(floor(x).cast("long") - lit(1L), n)
    }
  }

  /** Convert user-facing value-space distribution parameters into index
    * space for a lattice `{min, min+step, ...}` — the reference interprets
    * Normal mean/stddev in VALUE units (normal_value_expr,
    * core/engine/distributions.py:105-159); the index() domain is lattice
    * indexes, so `meanIdx = (mean - min)/step`, `stdIdx = std/step`. */
  def toIndexSpace(dist: Distribution, min: Double, step: Double): Distribution = dist match {
    case Distribution.Normal(mean, stddev) =>
      Distribution.Normal(mean.map(m => (m - min) / step), stddev.map(_ / step))
    case other => other
  }

  /** Continuous value in [0, 1) shaped by `dist` (for float/double ranges). */
  def continuousFraction(dist: Distribution, columnSeed: Long, id: Column): Column = dist match {
    case Distribution.Uniform => fraction(columnSeed, id)
    case Distribution.Normal(mean, stddev) =>
      // Value-space: auto-center at 0.5 with span/6 std, clamp to [0,1).
      val m = mean.getOrElse(0.5)
      val s = stddev.getOrElse(1.0 / 6.0)
      val z = standardNormal(columnSeed, id)
      greatest(least(z * lit(s) + lit(m), lit(1.0 - 1e-12)), lit(0.0))
    case Distribution.Beta(al, be) => betaDraw(al, be, columnSeed, id)
    case other =>
      // Fall back through the high-resolution index lattice.
      index(other, columnSeed, id, Seeds.FractionDenominator)
        .cast("double") / lit(Seeds.FractionDenominator.toDouble)
  }

  /** Exact Gamma(k, theta) draw: theta * InvP(k, u) via the bracketed-Newton
    * inverse regularized incomplete gamma (DistKernels), applied to the
    * deterministic per-cell uniform. Replaces the round-1..6 Wilson-Hilferty
    * cube (tail mass was off by a few percent). */
  private def gammaDraw(shape: Double, scale: Double, columnSeed: Long, id: Column): Column =
    graft.functions.DistKernels.gammaQuantileCol(
      openUnit(fraction(columnSeed, id)), shape, scale)

  /** Exact Beta(a,b) draw: InvI(a, b, u) via the inverse regularized
    * incomplete beta (DistKernels). Replaces the gamma-ratio approximation. */
  private def betaDraw(a: Double, b: Double, columnSeed: Long, id: Column): Column =
    least(graft.functions.DistKernels.betaQuantileCol(
      openUnit(fraction(columnSeed, id)), a, b), lit(1.0 - 1e-12))

  /** Weighted choice via a quantized slot table: weights are normalized to
    * `Granularity` slots (largest-remainder rounding, so every positive
    * weight keeps at least one slot and totals are exact), and a single
    * hash indexes the slot array. The reference documents the same 1e-4
    * weight granularity (function_builder.py:41-133, statistical contract
    * :59-63). Compared to a cumulative when-chain this is one hash + one
    * array lookup — the when-chain re-inlined the uniform draw in every
    * branch (conditional branches block subexpression elimination), costing
    * ~2.7KB of generated code per value and overflowing whole-stage-codegen
    * methods on wide tables. */
  val Granularity = 10000

  def weightedIndex(weights: Seq[Double], columnSeed: Long, id: Column): Column = {
    require(weights.nonEmpty && weights.forall(_ >= 0) && weights.sum > 0,
      "weights must be non-negative and sum > 0")
    val slots = quantize(weights, Granularity)
    val table: Seq[Int] = slots.zipWithIndex.flatMap { case (n, i) => Seq.fill(n)(i) }
    element_at(typedLit(table),
      pmod(Seeds.cellSeed(columnSeed, id), lit(Granularity.toLong)).cast("int") + 1)
  }

  /** Largest-remainder apportionment of `total` slots; positive weights get
    * at least one slot. */
  private[graft] def quantize(weights: Seq[Double], total: Int): Seq[Int] = {
    val sum = weights.sum
    val ideal = weights.map(w => w / sum * total)
    val floors = weights.zip(ideal).map { case (w, x) => if (w > 0) math.max(1, x.toInt) else 0 }
    val remainder = total - floors.sum
    if (remainder == 0) floors
    else if (remainder > 0) {
      val order = ideal.zip(floors).zipWithIndex
        .sortBy { case ((x, f), _) => -(x - f) }.map(_._2)
      val bump = order.take(remainder).toSet
      floors.zipWithIndex.map { case (f, i) => if (bump(i)) f + 1 else f }
    } else {
      // over-allocated by the >=1 floor on tiny weights: shave the largest
      val mutable = floors.toArray
      var excess = -remainder
      val order = ideal.zipWithIndex.sortBy { case (x, _) => -x }.map(_._2)
      var j = 0
      while (excess > 0) {
        val i = order(j % order.length)
        if (mutable(i) > 1) { mutable(i) -= 1; excess -= 1 }
        j += 1
      }
      mutable.toSeq
    }
  }
}
