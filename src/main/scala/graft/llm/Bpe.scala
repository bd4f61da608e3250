package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeKernels

/** Distributed BPE (byte-pair-encoding) tokenizer training + corpus
  * encoding — the real merge-learning loop behind the "BPE-ish" token
  * counting in [[TextAnalysis.subwordCount]].
  *
  * Scale design: training never iterates the corpus. The first (and only
  * corpus-wide) step folds the text column into the DISTINCT-WORD table
  * with occurrence counts — one shuffle keyed on word, after which every
  * merge iteration runs over the vocabulary (orders of magnitude smaller
  * than a 100 TB corpus; the standard map-reduce BPE formulation). Each
  * sweep is: adjacent-pair counts (map-side-combined aggregate, weighted
  * by word count), a TakeOrdered for the winner(s), and one fused-kernel
  * pass ([[BpeKernels]]) applying the accepted merges to the symbol
  * arrays. `localCheckpoint` after each apply keeps the lineage flat
  * (without it sweep r would recompute all prior merges). `sweepSize > 1`
  * accepts several symbol-disjoint merges per sweep, bounding driver
  * round-trips at ~2·V/sweepSize jobs for a V-merge vocabulary. On a
  * real corpus one typically trains on a deterministic sample
  * ([[Sampling.sampleN]] composes directly) and encodes the full corpus
  * with the fused [[encode]] pass.
  *
  * Determinism: the winning pair breaks ties on (count desc, left asc,
  * right asc), so the merge sequence is a pure function of the corpus.
  * Chosen counts are non-increasing across ranks (a pair created by a
  * merge occurs at most as often as the pair it replaced) — the invariant
  * the oracle pins.
  *
  * Reference scope: the reference generates synthetic text
  * (`text_generators.py`); tokenizer training is part of this repo's
  * beyond-reference LLM-pipeline surface (SURVEY §2 extension list).
  */
object Bpe {

  /** One learned merge: `left`+`right` fuse at `rank`, with the corpus
    * pair count at selection time. `sweep` is the batch the merge was
    * selected in (always 0 at `sweepSize = 1`); counts are exact as of the
    * START of their sweep — non-increasing within a sweep, re-counted
    * between sweeps. */
  case class Merge(rank: Int, left: String, right: String, count: Long,
      sweep: Int = 0)

  /** Whitespace word stream, lowercased — the tokenization both the
    * trainer and [[BpeKernels.MergeTable.encode]] share. */
  private def wordsOf(textCol: Column): Column =
    split(lower(trim(textCol)), "\\s+")

  /** Learn `numMerges` merges over a text column. Stops early when the
    * best remaining pair occurs fewer than `minPairCount` times.
    *
    * `byteLevel = true` initializes words as GPT-2-style byte symbols
    * (256-symbol base alphabet, [[BpeKernels.byteToChar]]) instead of code
    * points, making a trained encoder TOTAL on arbitrary text — unseen
    * characters still decompose into known byte symbols.
    *
    * `sweepSize > 1` batches merge selection: each sweep ranks all pair
    * candidates once and greedily accepts up to `sweepSize` of them in
    * (count desc, left asc, right asc) order, skipping any candidate that
    * shares a symbol — left, right, or fused string — with one already
    * accepted in the sweep (symbol-disjoint merges cannot change each
    * other's occurrence counts, so applying them in one fused pass is
    * order-independent within the sweep). This is the standard batched-BPE
    * approximation: the sequence stays a pure deterministic function of
    * the corpus, but can differ from strict sequential selection when a
    * merge would have created a pair outranking a later batch member, and
    * recorded counts are the sweep-time (pre-batch) counts, so counts are
    * non-increasing only WITHIN a sweep. The default `sweepSize = 1` is
    * exact sequential BPE (the oracle's pinned behavior).
    *
    * Job bound: each sweep costs 2 Spark jobs (candidate TakeOrdered +
    * checkpoint materialize), so a vocabulary of V merges runs in about
    * `2*ceil(V/sweepSize)` driver round-trips — at sweepSize=64 a
    * 32k-merge vocab is ~1000 jobs instead of ~64k. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, byteLevel: Boolean = false,
      sweepSize: Int = 1): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(sweepSize >= 1, s"sweepSize must be >= 1, got $sweepSize")
    // Corpus -> vocabulary: the one corpus-wide shuffle. Eager checkpoints
    // pin vocabulary-sized RDD blocks; each iteration's blocks are
    // released once its successor has materialized — without this,
    // numMerges copies of the symbol table sit in the block manager until
    // session end. The checkpointed Dataset is tracked DIRECTLY (its
    // LogicalRDD leaf, via GraftSql.checkpointedRdd) so only this
    // trainer's blocks are ever unpersisted — diffing the context-wide
    // persistent-RDD registry misclassified RDDs persisted concurrently
    // by other code on the same session (ADVICE r10).
    var prevCkpt: DataFrame = null
    def ckpt(d: DataFrame): DataFrame = {
      val c = d.localCheckpoint(true)
      if (prevCkpt != null)
        org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(prevCkpt)
          .foreach(_.unpersist(blocking = false))
      prevCkpt = c
      c
    }
    var words = ckpt(df.select(explode(wordsOf(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(BpeKernels.initSyms(col("w"), byteLevel).as("syms"), col("cnt")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var sweep = 0
    var done = false
    while (merges.length < numMerges && !done) {
      val want = math.min(sweepSize, numMerges - merges.length)
      // Slack over the sweep size: conflicting candidates are skipped, not
      // queued. The window depends ONLY on sweepSize (never on the
      // remaining merge budget) so a (corpus, sweepSize) pair always
      // yields the same merge sequence — train(numMerges = 64) is a
      // prefix of train(numMerges = 256).
      val fetch = if (sweepSize == 1) 1 else math.max(sweepSize * 2, sweepSize + 8)
      val n = size(col("syms"))
      val top = words.where(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n - 1), slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r")).agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(fetch).collect()
        .filter(_.getLong(2) >= minPairCount)
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[Merge]
        var i = 0
        while (i < top.length && accepted.length < want) {
          val (l, r, c) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          val fused = l + r
          if (!used(l) && !used(r) && !used(fused)) {
            accepted += Merge(merges.length + accepted.length, l, r, c, sweep)
            used += l; used += r; used += fused
          }
          i += 1
        }
        merges ++= accepted
        sweep += 1
        words = ckpt(words.select(
          BpeKernels.applyMerges(col("syms"),
            accepted.map(m => (m.left, m.right)).toSeq).as("syms"),
          col("cnt")))
      }
    }
    if (prevCkpt != null)
      org.apache.spark.sql.graftshim.GraftSql.checkpointedRdd(prevCkpt)
        .foreach(_.unpersist(blocking = false))
    merges.toSeq
  }

  /** Attach the BPE token array (`array<string>`) for a text column — one
    * fused-kernel pass per row, zero shuffle; the merge table rides as a
    * codegen reference object. `byteLevel` must match training. */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "bpe_tokens", byteLevel: Boolean = false): DataFrame =
    df.withColumn(outCol,
      BpeKernels.encode(col(textCol), merges.map(m => (m.left, m.right)), byteLevel))

  /** BPE token count column for a text column. */
  def tokenCount(text: Column, merges: Seq[Merge],
      byteLevel: Boolean = false): Column =
    size(BpeKernels.encode(text, merges.map(m => (m.left, m.right)), byteLevel))

  // -------------------------------------------------- tokenizer lifecycle

  /** Persist a trained tokenizer: the ordered merge list PLUS the
    * byteLevel flag (an encode with the wrong flag is silently wrong, so
    * the flag must travel with the merges — the [[Similarity.IvfPqMeta]]
    * sidecar lesson). One JSON document through the path's own Hadoop
    * filesystem: train once on the corpus, encode from any later job.
    * Jackson handles merge-symbol escaping (symbols may be quotes,
    * backslashes, CJK, or byte-alphabet code points). */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], byteLevel: Boolean, path: String): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("byte_level", byteLevel)
    val arr = root.putArray("merges")
    merges.foreach { mg =>
      val n = arr.addObject()
      n.put("rank", mg.rank); n.put("left", mg.left); n.put("right", mg.right)
      n.put("count", mg.count); n.put("sweep", mg.sweep)
    }
    graft.io.FsText.write(spark, path, m.writeValueAsString(root))
  }

  /** Reload a persisted tokenizer: `(merges, byteLevel)` — feed both to
    * [[encode]]; merge ORDER is the serialized order (rank order), which
    * the encoder's greedy loop depends on. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[Merge], Boolean) = {
    import scala.jdk.CollectionConverters._
    val text = graft.io.FsText.read(spark, path).getOrElse(throw new
      java.io.FileNotFoundException(s"no BPE tokenizer model at $path"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val merges = root.get("merges").elements().asScala.map { n =>
      Merge(n.get("rank").asInt, n.get("left").asText, n.get("right").asText,
        n.get("count").asLong, n.get("sweep").asInt)
    }.toSeq
    (merges, root.get("byte_level").asBoolean)
  }
}
