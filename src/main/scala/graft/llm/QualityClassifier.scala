package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.LogRegKernels

/** Model-based document quality classification — the GPT-3 / CCNet-style
  * linear filter (Brown et al. 2020 appendix A; Wenzek et al., CCNet,
  * LREC 2020): train a logistic regression over hashed bag-of-n-grams to
  * separate reference-quality documents from crawl noise, then score the
  * whole corpus and keep what clears a threshold (optionally with the
  * GPT-3 Pareto-lottery acceptance rule, which keeps a noisy band around
  * the threshold instead of a hard cut).
  *
  * Why this shape at 100 TB:
  *  - TRAINING is bounded: `maxTrainRows` caps the labeled frame with the
  *    same deterministic hash-fraction sample as ANN training
  *    ([[Similarity]]), so cost is independent of corpus size. Each of
  *    the `iterations` full-batch gradient steps is one narrow scoring
  *    map over the (checkpointed, featurized) training frame plus one
  *    aggregation whose shuffle carries at most `dim` partial sums per
  *    task — the corpus itself is never re-shuffled. Driver state is one
  *    dense `dim`-vector (2^18 doubles = 2 MB), never row data.
  *  - SCORING is free-standing: a zero-shuffle codegen'd map
  *    ([[LogRegKernels.LogRegScore]]) with the weights shipped once per
  *    plan as a reference object. Filtering 100 TB is a scan.
  *
  * Determinism: featurization and the training sample are exactly
  * deterministic (hash-based). Gradient sums commute only up to
  * floating-point association, so weights are stable to ~1e-15 across
  * runs but not bit-pinned; quality gates should therefore pin
  * tolerance-band facts (AUC, separation), not weight bits.
  *
  * The reference package has no model-based filter; this extends the
  * beyond-reference LLM-pipeline surface (SURVEY §2.11) alongside the
  * heuristic [[TextAnalysis.qualityScore]]. Measured
  * (bench_ops_scale.json): scoring 1.4M docs/s marginal at 10M
  * 32-token docs.
  */
object QualityClassifier {

  /** Trained classifier: hashing config + dense weights + bias, plus the
    * per-iteration mean log-loss trace (head = first iteration's loss,
    * computed BEFORE its update — a monotone-ish decreasing trace is the
    * cheap sanity signal that optimization did something). */
  final case class Model(dim: Int, ngrams: Int, weights: Array[Double],
      bias: Double, lossTrace: Seq[Double]) {
    require(weights.length == dim, s"weight length ${weights.length} != dim $dim")
  }

  /** Sparse hashed-n-gram features for a text column:
    * `struct(indices array<int>, values array<double>)`, L2-normalized
    * sublinear tf. See [[LogRegKernels.HashedFeatures]] for the token and
    * hashing contract. */
  def featurize(text: Column, dim: Int = 1 << 16, ngrams: Int = 2): Column =
    LogRegKernels.hashedFeatures(text, dim, ngrams)

  /** `sigmoid(w·x + b)` of `text` under `model` — the quality
    * probability. Zero shuffle; weights ride the closure once. */
  def score(text: Column, model: Model): Column =
    LogRegKernels.logRegScore(featurize(text, model.dim, model.ngrams),
      model.weights, model.bias)

  /** Train by full-batch gradient descent with L2 regularization.
    *
    * @param df       labeled frame
    * @param textCol  document text column
    * @param labelCol boolean/numeric column; truthy = positive
    *                 ("reference-quality")
    * @param dim      hashed feature space size (power of two conventional)
    * @param ngrams   max n-gram order (1 = unigrams only)
    * @param iterations gradient steps (each = 2 bounded jobs)
    * @param learningRate step size on the mean-gradient scale
    * @param l2       ridge penalty on weights (not bias)
    * @param maxTrainRows cap on labeled rows actually used (deterministic
    *                 hash-fraction sample over `sampleKeyCols`, the
    *                 [[Sampling.sample]] keyed semantics — rows sharing a
    *                 key go in or out together; <=0 disables the cap)
    * @param sampleKeyCols sampling key for the cap; default the text
    *                 itself (duplicate documents then sample as a unit —
    *                 pass the id column for per-row draws)
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 16, ngrams: Int = 2, iterations: Int = 20,
      learningRate: Double = 2.0, l2: Double = 1e-4,
      maxTrainRows: Long = 2000000L,
      sampleKeyCols: Seq[String] = Nil): Model = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val capped =
      if (maxTrainRows <= 0) df
      else {
        val total = df.count()
        if (total <= maxTrainRows) df
        else {
          val keys = if (sampleKeyCols.nonEmpty) sampleKeyCols else Seq(textCol)
          df.where(Sampling.hashFraction(keys.map(col), 0x51ab_9e3779b9L) <
            maxTrainRows.toDouble / total)
        }
      }
    val labeled0 = capped.select(
      featurize(col(textCol), dim, ngrams).as("f"),
      col(labelCol).cast("boolean").cast("int").cast("double").as("y"))
      .where(col("f").isNotNull && col("y").isNotNull)
    // Featurize once; every iteration re-reads the pinned narrow frame.
    val labeled = labeled0.localCheckpoint()
    try {
      val n = labeled.count()
      require(n > 0, "no labeled rows to train on")

      val w = new Array[Double](dim)
      var bias = 0.0
      val losses = Seq.newBuilder[Double]
      val eps = 1e-12

      // Per-iteration gradient plan (r18 optimization): one partition-local
      // dense scatter-add pass over the checkpoint's INTERNAL-ROW RDD
      // ([[graft.functions.GradAggKernels.logRegGradUpdate]] — score,
      // residual, log-loss and every gradient sum in a single row walk),
      // planned exactly once before the loop; partials are collected and
      // summed on the driver — the classic distributed-GD aggregate.
      // Identical math to the explode plan it replaced: grad_k =
      // Σ v_k·(p−y) over the same rows; absent features keep w = 0 under
      // decay in both shapes, so only floating-point association differs
      // (the operator's documented tolerance; Round18OptSpec pins the two
      // paths equal to 1e-9). The old plan re-paid Catalyst analysis, AQE
      // stage planning, the SQL listener's plan stringification AND a
      // rows × (features+2) explode + dim-keyed shuffle EVERY step — at 60
      // iterations that overhead was ~2x the gradient compute itself (r18
      // profile; guide §1.2 "per-task work", §2.3/§2.4, §7.3). Past the
      // dense-buffer bound the explode plan remains and is the fallback.
      val dense = graft.functions.GradAggKernels.enabled &&
        dim + 2 <= graft.functions.GradAggKernels.MaxDenseSlots
      val rowRdd =
        if (dense) labeled.queryExecution.toRdd else null
      var it = 0
      while (it < iterations) {
        if (dense) {
          // Broadcast the weight snapshot (r19, ADVICE r18): captured in
          // the closure it ships per TASK per iteration (dim doubles —
          // 512 KB at dim=2^16, x tasks x iterations of driver egress on a
          // real cluster); a broadcast ships it once per executor per
          // iteration and is destroyed right after the collect.
          val wBc = labeled.sparkSession.sparkContext.broadcast(w.clone())
          val biasSnap = bias
          val d = dim
          val partials =
            try rowRdd.mapPartitions { rows =>
              val wSnap = wBc.value
              val buf = new Array[Double](d + 2)
              while (rows.hasNext)
                graft.functions.GradAggKernels.logRegGradUpdate(
                  buf, rows.next(), wSnap, biasSnap)
              Iterator.single(buf)
            }.collect()
            finally wBc.destroy()
          val g = new Array[Double](dim + 2)
          partials.foreach { p =>
            var i = 0
            while (i < g.length) { g(i) += p(i); i += 1 }
          }
          losses += g(dim + 1) / n
          var k = 0
          while (k < dim) {
            w(k) -= learningRate * (g(k) / n + l2 * w(k))
            k += 1
          }
          bias -= learningRate * (g(dim) / n)
        } else {
          val scored = labeled.select(col("f"), col("y"),
            LogRegKernels.logRegScore(col("f"), w, bias).as("p"))
          // Residual r = p - y drives both gradients; log-loss rides along.
          val resid = scored.select(col("f"), (col("p") - col("y")).as("r"),
            (-(col("y") * log(greatest(col("p"), lit(eps))) +
              (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(eps)))))
              .as("ll"))
          // ONE job per iteration: the per-feature gradient entries ride the
          // same explode as two sentinel rows — id -1 carries the residual
          // (bias gradient), id -2 the log-loss — so one map-side-combined
          // hash aggregate (shuffle <= dim+2 sums per task) delivers loss,
          // bias gradient, and every weight gradient in <= dim+2 collected
          // rows. The per-entry value resolves POST-explode with a
          // codegen'd `when` — no `transform` lambda, which as a
          // higher-order function is CodegenFallback and would drop the
          // whole hot projection (score included) to interpreted eval.
          val grad = resid.select(col("r"), col("ll"), explode(concat(
            arrays_zip(col("f").getField("indices").as("i"),
              col("f").getField("values").as("v")),
            array(struct(lit(-1).as("i"), lit(0.0).as("v")),
              struct(lit(-2).as("i"), lit(0.0).as("v"))))).as("e"))
            .select(col("e.i").as("i"),
              when(col("e.i") >= 0, col("e.v") * col("r"))
                .when(col("e.i") === -1, col("r"))
                .otherwise(col("ll")).as("g"))
            .groupBy("i").agg(sum("g").as("g"))
            .collect()
          var biasGrad = 0.0
          var gi = 0
          while (gi < grad.length) {
            val row = grad(gi)
            val k = row.getInt(0)
            if (k == -1) biasGrad = row.getDouble(1) / n
            else if (k == -2) losses += row.getDouble(1) / n
            else w(k) -= learningRate * (row.getDouble(1) / n + l2 * w(k))
            gi += 1
          }
          bias -= learningRate * biasGrad
        }
        it += 1
      }
      Model(dim, ngrams, w, bias, losses.result())
    } finally {
      // Release exactly this training frame's checkpoint blocks (the
      // LogicalRDD leaf the eager localCheckpoint pinned).
      org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(labeled)
        .foreach(_.unpersist(blocking = false))
    }
  }

  /** Binned AUC of `scoreCol` against boolean `labelCol`: scores bucket
    * into `bins` equal-width cells of [0,1] (one hash-aggregate shuffle
    * carrying <= bins rows), the trapezoidal ROC area is computed on the
    * driver. Exact AUC needs a global rank (single-partition sort — a
    * scale hazard); at bins = 10^4 the discretization error is < 1e-3 for
    * any score distribution, which is inside any useful quality gate's
    * tolerance. */
  def binnedAuc(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10000): Double = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val cells = df.select(
      least(floor(col(scoreCol) * bins).cast("int"), lit(bins - 1)).as("b"),
      col(labelCol).cast("boolean").cast("int").as("y"))
      .where(col("b").isNotNull && col("b") >= 0)
      .groupBy("b").agg(sum("y").as("pos"), sum(lit(1) - col("y")).as("neg"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1) // descending score = ROC sweep order
    val nPos = cells.map(_._2).sum.toDouble
    val nNeg = cells.map(_._3).sum.toDouble
    if (nPos == 0 || nNeg == 0) return 1.0
    var tp = 0L; var fp = 0L; var auc = 0.0
    var prevTpr = 0.0; var prevFpr = 0.0
    cells.foreach { case (_, pos, neg) =>
      tp += pos; fp += neg
      val tpr = tp / nPos; val fpr = fp / nNeg
      auc += (fpr - prevFpr) * (tpr + prevTpr) / 2.0
      prevTpr = tpr; prevFpr = fpr
    }
    auc
  }

  /** GPT-3's Pareto acceptance rule (Brown et al. 2020 §A): keep a
    * document iff `score > 1 - x` with `x ~ Pareto(alpha)` — a soft
    * threshold that keeps most high-score docs while letting through a
    * heavy-tailed trickle of low scorers (preserving distributional
    * coverage). The draw is a deterministic per-document hash uniform
    * pushed through the Pareto inverse CDF, so the decision is stable
    * across reruns and repartitions (the engine-wide randomness
    * contract). */
  def paretoKeep(scored: Column, idCol: Column, alpha: Double = 9.0,
      seed: Long = 0x9127L): Column = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val u = Sampling.hashFraction(Seq(idCol), seed)
    // Pareto(alpha, xm=1) inverse CDF, shifted to measure exceedance:
    // x = (1-u)^(-1/alpha) - 1 >= 0; guard u -> 1 keeps x finite.
    val x = pow(greatest(lit(1.0) - u, lit(1e-15)), -1.0 / alpha) - 1.0
    scored > lit(1.0) - x
  }

  /** Persist a model as single-file JSON next to the corpus (same
    * [[graft.io.FsText]] channel as the BPE tokenizer). Weights serialize
    * sparsely (nonzero entries only) — an L2-regularized model over a
    * hashed space is mostly zeros. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("dim", model.dim)
    root.put("ngrams", model.ngrams)
    root.put("bias", model.bias)
    val lt = root.putArray("loss_trace")
    model.lossTrace.foreach(lt.add)
    val idx = root.putArray("indices")
    val vals = root.putArray("weights")
    var i = 0
    while (i < model.dim) {
      if (model.weights(i) != 0.0) { idx.add(i); vals.add(model.weights(i)) }
      i += 1
    }
    graft.io.FsText.write(spark, path, m.writeValueAsString(root))
  }

  /** Reload a persisted model. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val text = graft.io.FsText.read(spark, path).getOrElse(throw new
      java.io.FileNotFoundException(s"no quality-classifier model at $path"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val dim = root.get("dim").asInt
    val w = new Array[Double](dim)
    val idx = root.get("indices"); val vals = root.get("weights")
    var i = 0
    while (i < idx.size()) {
      w(idx.get(i).asInt) = vals.get(i).asDouble
      i += 1
    }
    import scala.jdk.CollectionConverters._
    Model(dim, root.get("ngrams").asInt, w, root.get("bias").asDouble,
      root.get("loss_trace").elements().asScala.map(_.asDouble).toSeq)
  }
}
