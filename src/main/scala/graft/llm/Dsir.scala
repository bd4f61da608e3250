package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DsirKernels

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): pick the raw-corpus documents whose hashed-n-gram distribution
  * looks like a small high-quality TARGET corpus (Wikipedia, textbooks,
  * a curated eval mix), the data-selection method behind several public
  * pretraining pipelines. Each document x gets an importance log-weight
  *
  *   log w(x) = Σ_gram log( p_target(bucket) / p_raw(bucket) )
  *
  * under bag-of-hashed-n-grams multinomials fit on the two corpora, and
  * the selection draws n documents WITHOUT replacement with probability
  * ∝ w(x) — realized as Gumbel top-k (add independent Gumbel noise to
  * each log-weight, keep the n largest: the standard reparameterization
  * of weighted sampling without replacement).
  *
  * Scale design:
  *  - the two multinomials are `dim`-bounded: [[bucketCounts]] explodes
  *    occurrence buckets and counts with map-side combine, so the shuffle
  *    carries ≤ dim keys per map partition and the driver collects ≤ dim
  *    (bucket, count) rows per corpus — never documents;
  *  - scoring is the fused zero-shuffle [[DsirKernels.DsirLogWeight]]
  *    pass (the log-ratio table rides the plan as one reference object,
  *    ~8·dim bytes);
  *  - selection is `orderBy(key desc).limit(n)` → TakeOrderedAndProject,
  *    a per-partition top-n + driver merge, never a global sort — the
  *    [[Sampling.sampleN]] plan shape;
  *  - the Gumbel noise is a DETERMINISTIC hash draw
  *    ([[Sampling.hashFraction]]), so the selection is rerun-stable and
  *    partition-independent, the repo-wide sampling contract.
  *
  * Null contract: null-text rows score null and never survive selection;
  * empty text scores 0 (equally likely under both distributions).
  *
  * Measured (bench_ops_scale.json): the multinomial fit is 12.2s at 10M
  * 32-token docs (dim 2^16, orders 1-2); the fused scoring pass is below
  * the 50ms measurement floor against its input synthesis at 10M docs —
  * selection cost is the scan itself.
  */
object Dsir {

  /** Hashed-n-gram occurrence counts of a corpus: `(bucket int, cnt
    * long)`, at most `dim` rows. One two-phase aggregate; the exploded
    * occurrences never leave their map partition unaggregated. */
  def bucketCounts(df: DataFrame, textCol: String,
      dim: Int = 1 << 16, ngrams: Int = 2): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(DsirKernels.ngramBuckets(col(textCol), dim, ngrams)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Laplace-smoothed multinomial log-probabilities over the `dim`
    * buckets of a corpus — a driver-side array built from the ≤ dim
    * aggregated counts (`alpha` pseudo-count per bucket keeps unseen
    * buckets finite). */
  def bucketLogProbs(df: DataFrame, textCol: String,
      dim: Int = 1 << 16, ngrams: Int = 2, alpha: Double = 1.0): Array[Double] = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val counts = new Array[Double](dim)
    java.util.Arrays.fill(counts, alpha)
    var total = alpha * dim
    bucketCounts(df, textCol, dim, ngrams).collect().foreach { r =>
      val c = r.getLong(1).toDouble
      counts(r.getInt(0)) += c
      total += c
    }
    counts.map(c => math.log(c / total))
  }

  /** The DSIR log-ratio table: log p_target − log p_raw per bucket, fit
    * on the two corpora under the same hashing config. */
  def logRatioTable(target: DataFrame, raw: DataFrame, textCol: String,
      dim: Int = 1 << 16, ngrams: Int = 2, alpha: Double = 1.0)
      : DsirKernels.LogRatioTable = {
    val pt = bucketLogProbs(target, textCol, dim, ngrams, alpha)
    val pr = bucketLogProbs(raw, textCol, dim, ngrams, alpha)
    val ratios = new Array[Double](dim)
    var i = 0
    while (i < dim) { ratios(i) = pt(i) - pr(i); i += 1 }
    new DsirKernels.LogRatioTable(ratios, ngrams)
  }

  /** Per-document importance log-weight column (fused, zero shuffle). */
  def importanceLogWeight(text: Column, table: DsirKernels.LogRatioTable): Column =
    DsirKernels.dsirLogWeight(text, table)

  /** Attach `dsir_logw` to every raw document — the composable form (feed
    * it to [[Sampling.sampleWeightedNPerGroup]], threshold it, inspect
    * it). */
  def scoreAgainst(raw: DataFrame, target: DataFrame, textCol: String,
      dim: Int = 1 << 16, ngrams: Int = 2, alpha: Double = 1.0,
      outCol: String = "dsir_logw"): DataFrame =
    raw.withColumn(outCol,
      importanceLogWeight(col(textCol), logRatioTable(target, raw, textCol, dim, ngrams, alpha)))

  /** Select `n` documents from `raw` without replacement with probability
    * ∝ exp(logWeightCol) — Gumbel top-k with a deterministic hash-Gumbel
    * per key. Ties (identical weight AND identical hash draw) break on
    * the key columns for full determinism. */
  def gumbelTopK(scored: DataFrame, keyCols: Seq[String], logWeightCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    require(keyCols.nonEmpty, "gumbelTopK needs at least one key column")
    // u in (0, 1): clamp away exact 0 (log of which is -inf twice over).
    val u = greatest(Sampling.hashFraction(keyCols.map(col), seed), lit(1e-12))
    val gumbel = -log(-log(u))
    val key = col(logWeightCol).cast("double") + gumbel
    scored.where(col(logWeightCol).isNotNull)
      .orderBy(key.desc +: keyCols.map(col(_).asc): _*).limit(n)
  }

  /** The whole DSIR pipeline: fit both multinomials, score `raw`, Gumbel
    * top-k select `n`. Returns the selected rows with their `dsir_logw`
    * attached. */
  def resampleN(raw: DataFrame, target: DataFrame, textCol: String,
      keyCols: Seq[String], n: Int, dim: Int = 1 << 16, ngrams: Int = 2,
      alpha: Double = 1.0, seed: Long = 42L): DataFrame =
    gumbelTopK(scoreAgainst(raw, target, textCol, dim, ngrams, alpha),
      keyCols, "dsir_logw", n, seed)

  /** [[resampleN]] with a SLIM top-k pass for corpus-scale frames (r15):
    * `gumbelTopK`'s orderBy+limit compiles to TakeOrdered, which holds the
    * n winners on the driver — n FULL documents (texts and all) in the
    * direct form. Here the top-k runs over the `(keyCols, dsir_logw)`
    * projection only (n ids × ~16 bytes on the driver) and the full rows
    * come back through one semi-join on the keys, which AQE broadcasts at
    * any realistic n. The log-ratio table fits ONCE (scoreAgainst builds
    * it eagerly); the raw corpus is scanned twice (slim scoring pass +
    * semi-join pass) — both pure projections, the price of never holding
    * documents on the driver. Same winners as [[resampleN]]: identical
    * weights, identical hash-Gumbel draws, identical tie-break. */
  def resampleNSlim(raw: DataFrame, target: DataFrame, textCol: String,
      keyCols: Seq[String], n: Int, dim: Int = 1 << 16, ngrams: Int = 2,
      alpha: Double = 1.0, seed: Long = 42L): DataFrame = {
    val scored = scoreAgainst(raw, target, textCol, dim, ngrams, alpha)
    val winners = gumbelTopK(
      scored.select((keyCols.map(col) :+ col("dsir_logw")): _*),
      keyCols, "dsir_logw", n, seed).select(keyCols.map(col): _*)
    scored.join(winners, keyCols, "left_semi")
  }
}
