package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramKernels

/** Distributed unigram-LM tokenizer (the SentencePiece unigram model:
  * Kudo, "Subword Regularization", ACL 2018) — the other major subword
  * family next to [[Bpe]]. Pieces carry independent log-probabilities; a
  * word's likelihood marginalizes over all segmentations; training is
  * EM (forward-backward expected counts) over a seed vocabulary that is
  * iteratively pruned down to the target size; encoding is Viterbi.
  *
  * Scale design (the [[Bpe]] contract): training never iterates the
  * corpus. One corpus-wide shuffle folds text into the DISTINCT-WORD
  * table with counts; everything after runs over vocabulary-sized data:
  *  - seeding explodes word substrings (≤ maxPieceLen per position) and
  *    TakeOrders the top `seedMultiplier × vocabSize` by corpus
  *    frequency — one word-table-sized shuffle, one bounded collect;
  *  - each EM pass is ONE job: the fused lattice kernel
  *    ([[UnigramKernels.UnigramExpected]], vocabulary as a codegen
  *    reference object) emits posterior counts per distinct word, a
  *    map-side-combined hash aggregate sums them, and the driver
  *    collects ≤ |vocab| rows (plus the loglik sentinel). Driver state
  *    is two vocab-sized arrays, never row data;
  *  - pruning is a driver-side sort of those expected counts (single
  *    characters are never pruned, so every word stays segmentable —
  *    encode is total on the training corpus by construction, and total
  *    on arbitrary text via the kernel's OOV single-char fallback).
  * On a real corpus one trains on a deterministic sample
  * ([[Sampling.sampleN]] composes directly, the ANN-training pattern)
  * and encodes the full 100 TB with the zero-shuffle fused
  * [[UnigramKernels.UnigramEncode]] pass. Measured (bench_ops_scale.json):
  * encode 0.8M docs/s marginal at 10M 32-token docs; full train at 10M
  * docs 46s, dominated by the one corpus→distinct-word shuffle.
  *
  * Determinism: seeding ties break on (count desc, piece asc); EM is
  * deterministic up to floating-point summation order (shuffle-partial
  * association), so probabilities are stable to ~1e-15 but not
  * bit-pinned — gates pin tolerance bands and exact set-level facts
  * (vocab membership, segmentability), the [[QualityClassifier]] story.
  *
  * Reference scope: tokenizer training is beyond-reference surface
  * (SURVEY §2 extension list), like [[Bpe]].
  */
object UnigramLm {

  /** One vocabulary entry: `piece` with log-probability `logp`
    * (normalized: logsumexp over the vocab = 0). */
  final case class Piece(piece: String, logp: Double)

  /** Trained model: the vocabulary plus the EM objective trace —
    * `llTrace` holds, per EM pass, the corpus log-likelihood
    * `sum(cnt_w · log P(w))` computed under the weights AT THE START of
    * the pass. Within a fixed vocabulary EM is monotone, so consecutive
    * entries between prunes are non-decreasing (a pinned invariant);
    * across a prune the likelihood may step down. */
  final case class Model(pieces: Seq[Piece], llTrace: Seq[Double]) {
    def pieceArray: Array[String] = pieces.map(_.piece).toArray
    def logpArray: Array[Double] = pieces.map(_.logp).toArray
  }

  /** The word rule shared with [[Bpe]]: lowercased whitespace tokens. */
  private def wordsOf(textCol: Column): Column =
    split(lower(trim(textCol)), "\\s+")

  /** Train a unigram-LM vocabulary of (at most) `vocabSize` pieces.
    *
    * @param vocabSize      target piece count (floor: the single-character
    *                       alphabet is never pruned)
    * @param maxPieceLen    longest candidate piece
    * @param seedMultiplier seed vocabulary = seedMultiplier × vocabSize
    *                       top substrings (+ all single chars)
    * @param keepFraction   per-prune survivor fraction (0.75 = drop the
    *                       bottom quarter of multi-char pieces by
    *                       expected count each stage)
    * @param emPerStage     EM passes between prunes (≥2 lets the gate pin
    *                       within-stage monotonicity)
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, seedMultiplier: Int = 4,
      keepFraction: Double = 0.75, emPerStage: Int = 2): Model = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(seedMultiplier >= 1, s"seedMultiplier must be >= 1, got $seedMultiplier")
    require(keepFraction > 0 && keepFraction < 1,
      s"keepFraction must be in (0,1), got $keepFraction")
    require(emPerStage >= 1, s"emPerStage must be >= 1, got $emPerStage")

    // The one corpus-wide shuffle: distinct words + counts, pinned.
    val words = df.select(explode(wordsOf(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    try {
      // ---- Seed: all substrings up to maxPieceLen, scored by corpus
      // frequency (occurrences × word count). One vocab-sized shuffle.
      val subs = words.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1),
           |  s -> transform(sequence(1, least($maxPieceLen, length(w) - s)),
           |    l -> substring(w, s + 1, l))))""".stripMargin)).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("c"))
        .localCheckpoint(true)
      val (singles, multis) =
        try {
          val s = subs.where(length(col("piece")) === 1)
            .orderBy(col("c").desc, col("piece").asc)
            .collect().map(r => (r.getString(0), r.getLong(1)))
          val m = subs.where(length(col("piece")) > 1)
            .orderBy(col("c").desc, col("piece").asc)
            .limit(math.max(seedMultiplier * vocabSize - s.length, 0))
            .collect().map(r => (r.getString(0), r.getLong(1)))
          (s, m)
        } finally {
          org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(subs)
            .foreach(_.unpersist(blocking = false))
        }
      require(singles.nonEmpty, "empty corpus: no characters to seed from")

      var pieces: Array[String] = singles.map(_._1) ++ multis.map(_._1)
      var logps: Array[Double] = {
        val total = (singles.iterator ++ multis.iterator).map(_._2).sum.toDouble
        (singles.iterator ++ multis.iterator)
          .map(p => math.log(p._2 / total)).toArray
      }
      val nSingles = singles.length
      val llTrace = Seq.newBuilder[Double]

      // One EM pass: expected counts + loglik under the CURRENT weights.
      def emPass(): (Array[Double], Double) = {
        val rows = words.select(col("cnt"),
          explode(UnigramKernels.expected(col("w"), pieces, logps)).as("e"))
          .select(col("e.id").as("id"), (col("e.c") * col("cnt")).as("c"))
          .groupBy("id").agg(sum("c").as("c"))
          .collect()
        val counts = new Array[Double](pieces.length)
        var ll = 0.0
        rows.foreach { r =>
          val id = r.getInt(0)
          if (id == -1) ll = r.getDouble(1) else counts(id) = r.getDouble(1)
        }
        (counts, ll)
      }

      def mStep(counts: Array[Double]): Unit = {
        // Floor keeps never-used pieces finite (they become prune bait,
        // not NaNs).
        val floored = counts.map(c => if (c > 0) c else 1e-9)
        val total = floored.sum
        logps = floored.map(c => math.log(c / total))
      }

      var stageCounts: Array[Double] = null
      var continue = true
      while (continue) {
        var i = 0
        while (i < emPerStage) {
          val (counts, ll) = emPass()
          llTrace += ll
          mStep(counts)
          stageCounts = counts
          i += 1
        }
        if (pieces.length <= math.max(vocabSize, nSingles)) continue = false
        else {
          // Prune: singles survive unconditionally; multis rank by
          // expected count (desc, piece asc for determinism).
          val target = math.max(math.max(vocabSize, nSingles),
            (pieces.length * keepFraction).toInt)
          val keepMultis = math.max(target - nSingles, 0)
          val ranked = (nSingles until pieces.length)
            .sortBy(i => (-stageCounts(i), pieces(i)))
            .take(keepMultis)
            .sorted // original index order keeps singles-first layout stable
          val keepIdx = (0 until nSingles) ++ ranked
          pieces = keepIdx.map(pieces).toArray
          val keptLogps = keepIdx.map(logps).toArray
          // Renormalize the survivors (probability mass of pruned pieces
          // redistributes proportionally).
          val z = {
            var m = Double.NegativeInfinity
            keptLogps.foreach(l => if (l > m) m = l)
            m + math.log(keptLogps.map(l => math.exp(l - m)).sum)
          }
          logps = keptLogps.map(_ - z)
        }
      }
      Model(pieces.zip(logps).map { case (p, l) => Piece(p, l) }.toSeq,
        llTrace.result())
    } finally {
      org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(words)
        .foreach(_.unpersist(blocking = false))
    }
  }

  /** Attach the unigram piece array (`array<string>`) for a text column —
    * one fused Viterbi pass per row, zero shuffle. */
  def encode(df: DataFrame, textCol: String, model: Model,
      outCol: String = "unigram_tokens"): DataFrame =
    df.withColumn(outCol,
      UnigramKernels.encode(col(textCol), model.pieceArray, model.logpArray))

  /** Piece-count column for a text column. */
  def tokenCount(text: Column, model: Model): Column =
    size(UnigramKernels.encode(text, model.pieceArray, model.logpArray))

  /** Persist a trained model (piece/logp table + objective trace) as one
    * JSON document through the path's own Hadoop filesystem — the
    * [[Bpe.saveMerges]] lifecycle. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val arr = root.putArray("pieces")
    model.pieces.foreach { p =>
      val n = arr.addObject()
      n.put("piece", p.piece); n.put("logp", p.logp)
    }
    val lt = root.putArray("ll_trace")
    model.llTrace.foreach(lt.add)
    graft.io.FsText.write(spark, path, m.writeValueAsString(root))
  }

  /** Reload a persisted model. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    import scala.jdk.CollectionConverters._
    val text = graft.io.FsText.read(spark, path).getOrElse(throw new
      java.io.FileNotFoundException(s"no unigram tokenizer model at $path"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    Model(
      root.get("pieces").elements().asScala.map(n =>
        Piece(n.get("piece").asText, n.get("logp").asDouble)).toSeq,
      root.get("ll_trace").elements().asScala.map(_.asDouble).toSeq)
  }
}
