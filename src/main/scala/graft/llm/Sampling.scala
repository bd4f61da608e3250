package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling, split assignment and weighted corpus mixing —
  * the selection layer of a training-data pipeline.
  *
  * Everything here derives from `xxhash64(keys, salt)`, never from
  * `rand()`: at 100 TB a sample must be reproducible across reruns,
  * retries and repartitions (a task that retries with `rand()` silently
  * changes the sample), auditable ("why is this row in val?"), and stable
  * under incremental reruns (yesterday's rows keep yesterday's split).
  * Hash-based selection gives all three for free and needs no shuffle —
  * every operator below is a narrow map/filter over the input.
  */
object Sampling {

  private val Buckets = 1L << 40

  /** Uniform fraction in [0, 1) from the key columns and a salt —
    * deterministic, partition-independent. */
  def hashFraction(keys: Seq[Column], salt: Long): Column =
    pmod(xxhash64(keys :+ lit(salt): _*), lit(Buckets)).cast("double") / Buckets.toDouble

  /** Deterministic Bernoulli sample: keeps a row iff the hash fraction of
    * its keys falls below `fraction`. Rows sharing the key columns are kept
    * or dropped together (sample by document, not by chunk). */
  def sample(df: DataFrame, keyCols: Seq[String], fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.where(hashFraction(keyCols.map(col), seed) < fraction)
  }

  /** Deterministic exact-size sample: the `n` rows with the smallest key
    * hashes — a frozen "random" subset that is stable across reruns and
    * grows monotonically with `n` (the top-100 sample contains the
    * top-50). Plans as TakeOrderedAndProject: one narrow pass keeping n
    * rows per partition, one n-row merge on the driver side of the
    * shuffle — never a full sort. */
  def sampleN(df: DataFrame, keyCols: Seq[String], n: Int,
      seed: Long = 42L): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    df.orderBy(hashFraction(keyCols.map(col), seed).asc +: keyCols.map(col(_).asc): _*)
      .limit(n)
  }

  /** Deterministic per-group exact-size sample (stratified sampling): for
    * each distinct value of `groupCols`, the `n` rows with the smallest
    * key hashes — "500 documents per language/source" selection with the
    * same determinism story as [[sampleN]] (stable across reruns and
    * repartitions, monotone in n). One shuffle: the window partition by
    * group; rank is evaluated streaming per group, no per-group
    * materialization. Groups smaller than n keep all their rows. */
  def sampleNPerGroup(df: DataFrame, keyCols: Seq[String], groupCols: Seq[String],
      n: Int, seed: Long = 42L): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    require(groupCols.nonEmpty, "sampleNPerGroup needs at least one group column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashFraction(keyCols.map(col), seed).asc +: keyCols.map(col(_).asc): _*)
    df.withColumn("__graft_rk", row_number().over(w))
      .where(col("__graft_rk") <= n).drop("__graft_rk")
  }

  /** Deterministic weighted sample without replacement (the
    * Efraimidis–Spirakis A-ES scheme): each row draws its reproducible
    * uniform `u = hashFraction(keys, seed)` and scores `u^(1/w)`; the `n`
    * largest scores are the sample. Higher weight pulls the score toward
    * 1, so inclusion odds grow with weight — quality-weighted or
    * recency-weighted corpus selection with the same determinism story as
    * [[sampleN]] (rerun-stable, partition-independent, and monotone in n:
    * scores are fixed per row, so the top-100 contains the top-50).
    *
    * Scale shape: plans as TakeOrderedAndProject — one narrow pass keeping
    * n rows per partition, one n-row merge; never a full sort. Weights
    * must be strictly positive: a non-positive weight fails the job
    * loudly (raise_error) instead of silently skewing the sample. */
  def sampleWeightedN(df: DataFrame, keyCols: Seq[String], weightCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    val w = col(weightCol).cast("double")
    val u = hashFraction(keyCols.map(col), seed)
    val score = when(w > 0.0, pow(u, lit(1.0) / w))
      .otherwise(raise_error(concat(
        lit(s"sampleWeightedN: weight column '$weightCol' must be > 0, got "),
        w.cast("string"))))
    df.orderBy(score.desc +: keyCols.map(col(_).asc): _*).limit(n)
  }

  /** Per-group weighted sample without replacement: [[sampleWeightedN]]'s
    * A-ES score ranked within each `groupCols` value — "the n
    * highest-quality documents per source/language" selection. Same
    * determinism story (rerun-stable, partition-independent, monotone in
    * n); one shuffle (the group window) with a streaming rank, like
    * [[sampleNPerGroup]]. Groups smaller than n keep all rows. */
  def sampleWeightedNPerGroup(df: DataFrame, keyCols: Seq[String],
      groupCols: Seq[String], weightCol: String, n: Int,
      seed: Long = 42L): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    require(groupCols.nonEmpty, "sampleWeightedNPerGroup needs at least one group column")
    val w = col(weightCol).cast("double")
    val u = hashFraction(keyCols.map(col), seed)
    val score = when(w > 0.0, pow(u, lit(1.0) / w))
      .otherwise(raise_error(concat(
        lit(s"sampleWeightedNPerGroup: weight column '$weightCol' must be > 0, got "),
        w.cast("string"))))
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(score.desc +: keyCols.map(col(_).asc): _*)
    df.withColumn("__graft_rk", row_number().over(win))
      .where(col("__graft_rk") <= n).drop("__graft_rk")
  }

  /** Leakage-safe split assignment: appends `splitCol` with the split name
    * chosen by where the key-hash fraction lands among the cumulative
    * weights (normalized). All rows sharing the key columns land in the
    * same split — the standard guard against train/test contamination when
    * a document, user or session spans many rows. Weights need not sum to
    * 1; they are normalized.
    */
  def assignSplits(df: DataFrame, keyCols: Seq[String],
      splits: Seq[(String, Double)], seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "assignSplits needs at least one split, all weights > 0")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val frac = hashFraction(keyCols.map(col), seed)
    // fold: first cut whose bound exceeds the fraction wins; the last
    // split takes the remainder (cuts.last == 1.0 up to FP rounding).
    val expr0 = splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(frac < cut, name).otherwise(rest)
    }
    df.withColumn(splitCol, expr0)
  }

  /** NEAR-DUP-leakage-safe split: [[assignSplits]] guards rows sharing a
    * KEY; this guards rows sharing a near-dup CLUSTER — the eval-set
    * contamination that survives key-level splitting (a paraphrased or
    * lightly-edited copy of a train doc landing in test). The pair frame
    * (any `(id_a, id_b)` near-dup output — minhash, simhash, cosine,
    * edit-distance) closes transitively via
    * [[Dedup.connectedComponents]]; every row splits by the hash of its
    * component REPRESENTATIVE (its own id when unpaired), so whole
    * clusters move atomically and the defining invariant — no near-dup
    * pair straddles two splits — holds by construction, even for pairs
    * only connected through intermediates. Scale shape: the CC cost is
    * the pair graph's (pairs are sparse after blocking), the assignment
    * itself is one left join + a pure projection. */
  def assignSplitsByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    // Ids keep their own type (long, string, UUID — whatever the pair
    // frame's near-dup family produced): a cast here would null out
    // non-numeric ids under non-ANSI and silently void the no-straddle
    // guarantee. Contract: pairs' id_a/id_b carry the same type as
    // df(idCol), which every Dedup pair function preserves.
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as(idCol), col("component").as("__graft_comp"))
    val rep = coalesce(col("__graft_comp"), col(idCol))
    assignSplits(
      df.join(cc, Seq(idCol), "left").withColumn("__graft_rep", rep),
      Seq("__graft_rep"), splits, seed, splitCol)
      .drop("__graft_comp", "__graft_rep")
  }

  /** Weighted corpus mixture with deterministic epoch oversampling — the
    * data-mixture step of LLM training runs ("2.3 epochs of corpus A, 0.5
    * of corpus B"). A weight w contributes floor(w) full copies (tagged
    * `mix_epoch` 0..floor(w)-1) plus one hash-sampled copy of rate
    * frac(w) at epoch floor(w). Sampling salts the hash with (seed, epoch),
    * so the fractional epoch is a fresh, reproducible subsample —
    * disjointness across epochs is by tag, not by row identity.
    *
    * All inputs must share one schema (unionByName). Output adds
    * `mix_source` and `mix_epoch`. The plan is a union of AT MOST TWO
    * narrow branches per source — full epochs are replicated by
    * `explode(sequence(0, floor(w)-1))` inside one branch (generator-style
    * row replication, no shuffle), the fractional epoch is one
    * hash-filtered branch — so a weight of 1000 epochs costs one plan
    * branch, not a thousand. Catalyst pushes the per-source filters into
    * the scans. `maxEpochs` guards against a runaway weight (a tiny
    * source under a huge budget): exceeding it fails fast at plan build
    * with the knob named, instead of silently materializing
    * floor(w) x n rows nobody intended.
    */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)],
      keyCols: Seq[String], seed: Long = 42L,
      maxEpochs: Double = 10000.0): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    require(sources.forall(_._3 > 0), "mixCorpora weights must be > 0")
    val over = sources.filter(_._3 > maxEpochs)
    require(over.isEmpty,
      s"mixCorpora epoch weight exceeds maxEpochs=$maxEpochs for " +
        s"${over.map(x => s"${x._1} (w=${x._3})").mkString(", ")}; " +
        "raise the maxEpochs parameter if this replication is intended")
    val branches = sources.flatMap { case (name, df, w) =>
      val full = math.floor(w).toLong
      val frac = w - full
      val fullCopies =
        if (full > 0)
          Seq(df.withColumn("mix_source", lit(name))
            .withColumn("mix_epoch", explode(sequence(lit(0L), lit(full - 1)))))
        else Nil
      val fracCopy =
        if (frac > 0)
          Seq(df.where(hashFraction(keyCols.map(col), seed ^ (full * 0x9E3779B97F4A7C15L)
              ^ name.hashCode.toLong) < frac)
            .withColumn("mix_source", lit(name)).withColumn("mix_epoch", lit(full)))
        else Nil
      fullCopies ++ fracCopy
    }
    branches.reduce(_.unionByName(_))
  }

  /** Temperature-derived mixture weights — the multilingual/multi-corpus
    * sampling rule (probability mass p_i ∝ n_i^alpha): alpha = 1 is
    * size-proportional, alpha -> 0 approaches uniform-over-sources, the
    * usual 0.3-0.7 band up-weights small corpora without drowning large
    * ones. Returned as EPOCH weights for [[mixCorpora]], scaled so the
    * mixture's expected row count is `budgetRows`:
    * `w_i = budgetRows * p_i / n_i` (a weight above 1 oversamples —
    * multiple epochs — exactly how small corpora get their boost).
    * Pure driver arithmetic on the (name, size) list. */
  def temperatureWeights(sizes: Seq[(String, Long)], alpha: Double,
      budgetRows: Long): Seq[(String, Double)] = {
    require(sizes.nonEmpty, "temperatureWeights needs at least one source")
    require(sizes.forall(_._2 > 0), "temperatureWeights needs positive sizes")
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(budgetRows > 0, s"budgetRows must be > 0, got $budgetRows")
    val mass = sizes.map { case (n, s) => n -> math.pow(s.toDouble, alpha) }
    val z = mass.map(_._2).sum
    mass.zip(sizes).map { case ((name, m), (_, size)) =>
      name -> (budgetRows.toDouble * (m / z) / size.toDouble)
    }
  }

  /** Temperature-weighted mixture in one call: counts each source (one
    * metadata-only job over parquet), derives the weights, and mixes.
    * The expected output row count is `budgetRows`. When the per-source
    * sizes are already known (e.g. from a single groupBy over a shared
    * table), prefer [[temperatureWeights]] + [[mixCorpora]] directly and
    * skip the per-source count jobs. */
  def mixByTemperature(sources: Seq[(String, DataFrame)], keyCols: Seq[String],
      alpha: Double, budgetRows: Long, seed: Long = 42L,
      maxEpochs: Double = 10000.0): DataFrame = {
    val ws = temperatureWeights(
      sources.map { case (n, df) => n -> df.count() }, alpha, budgetRows).toMap
    mixCorpora(sources.map { case (n, df) => (n, df, ws(n)) }, keyCols, seed,
      maxEpochs)
  }

  /** Deterministic TOKEN-budget sample: training budgets are token
    * counts, not document counts ("take 50B tokens from this source"),
    * and document lengths vary by orders of magnitude — a row-count
    * sample misses the budget by the length skew. Semantics: order rows
    * by (hash, keys) and keep the longest prefix whose cumulative
    * `tokenCol` stays ≤ `budgetTokens` (greedy prefix-stop: the first
    * row that would overflow ends the sample). Deterministic,
    * partition-independent, and MONOTONE in the budget (a bigger budget
    * keeps a superset) — the [[sampleN]] contract in token space.
    *
    * Scale design — the naive form is a GLOBAL running-sum window
    * (single-partition sort of the corpus); instead, two passes:
    *  1. bucket rows by `floor(u·buckets)` and aggregate per-bucket token
    *     sums — one map-side-combined aggregate, ≤ `buckets` rows to the
    *     driver;
    *  2. every bucket strictly below the budget-crossing bucket is kept
    *     wholesale by a narrow filter (zero shuffle); ONLY the crossing
    *     bucket's rows (≈ corpus/buckets — 0.02% at the default 4096)
    *     pass through the running-sum window, sized to a single
    *     partition by construction.
    * Rows with null `tokenCol` are dropped (an unknown cost cannot be
    * budgeted); negative counts fail fast.
    *
    * @return the selected rows (original schema). */
  def sampleTokenBudget(df: DataFrame, keyCols: Seq[String], tokenCol: String,
      budgetTokens: Long, seed: Long = 42L, buckets: Int = 4096): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(keyCols.nonEmpty, "sampleTokenBudget needs at least one key column")
    val toks = col(tokenCol).cast("long")
    val base = df.where(toks.isNotNull)
    val guarded = when(toks < 0, raise_error(concat(
      lit(s"sampleTokenBudget: token column '$tokenCol' must be >= 0, got "),
      toks.cast("string")))).otherwise(toks)
    val u = hashFraction(keyCols.map(col), seed)
    val bucket = floor(u * buckets).cast("int")
    val perBucket = base.groupBy(bucket.as("__b"))
      .agg(sum(guarded).as("__t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sums = Array.tabulate(buckets)(b => perBucket.getOrElse(b, 0L))
    var cum = 0L
    var crossing = -1
    var kept = 0L
    var b = 0
    while (b < buckets && crossing < 0) {
      if (cum + sums(b) > budgetTokens) { crossing = b; kept = cum }
      else cum += sums(b)
      b += 1
    }
    if (crossing < 0) base // whole corpus fits the budget
    else {
      val below = base.where(bucket < crossing)
      val remaining = budgetTokens - kept
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(u.asc +: keyCols.map(col(_).asc): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = base.where(bucket === crossing)
        .withColumn("__run", sum(guarded).over(w))
        .where(col("__run") <= remaining).drop("__run")
      below.unionByName(boundary)
    }
  }

  /** Per-source token budgets in one frame ("50B tokens of A, 20B of B"):
    * a [[sampleTokenBudget]] per source, tagged `mix_source`. All inputs
    * must share one schema. */
  def mixByTokenBudget(sources: Seq[(String, DataFrame, Long)],
      keyCols: Seq[String], tokenCol: String, seed: Long = 42L,
      buckets: Int = 4096): DataFrame = {
    require(sources.nonEmpty, "mixByTokenBudget needs at least one source")
    sources.map { case (name, df, budget) =>
      sampleTokenBudget(df, keyCols, tokenCol, budget,
        seed ^ name.hashCode.toLong, buckets)
        .withColumn("mix_source", lit(name))
    }.reduce(_.unionByName(_))
  }
}
