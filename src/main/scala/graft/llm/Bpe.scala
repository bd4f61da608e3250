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
  * iteration is: adjacent-pair counts (map-side-combined aggregate,
  * weighted by word count), a TakeOrdered(1) for the winner, and one
  * fused-kernel pass ([[BpeKernels]]) applying the new merge to the
  * symbol arrays. `localCheckpoint` after each apply keeps the lineage
  * flat (without it iteration r would recompute all r prior merges). On a
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
    * pair count at selection time. */
  case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Whitespace word stream, lowercased — the tokenization both the
    * trainer and [[BpeKernels.MergeTable.encode]] share. */
  private def wordsOf(textCol: Column): Column =
    split(lower(trim(textCol)), "\\s+")

  /** Learn `numMerges` merges over a text column. Stops early when the
    * best remaining pair occurs fewer than `minPairCount` times. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // Corpus -> vocabulary: the one corpus-wide shuffle. "(?!^)" splits a
    // word into single-character symbols (codepoint boundaries — Java
    // regex match positions never fall inside a surrogate pair); Spark's
    // split keeps trailing empties (limit=-1), so strip them.
    // Eager checkpoints pin vocabulary-sized RDD blocks; release each
    // iteration's blocks once its successor has materialized — without
    // this, numMerges copies of the symbol table sit in the block manager
    // until session end. The persisted RDD is internal to the Dataset
    // (df.rdd would be a fresh unrelated RDD), so generations are tracked
    // by diffing the context's persistent-RDD registry.
    val sc = df.sparkSession.sparkContext
    val preexisting = sc.getPersistentRDDs.keySet.toSet
    var seen = preexisting
    var live: Set[Int] = Set.empty
    def rotateBlocks(): Unit = {
      val fresh = sc.getPersistentRDDs.keySet.toSet -- seen
      seen ++= fresh
      live.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      live = fresh
    }
    var words = df.select(explode(wordsOf(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(filter(split(col("w"), "(?!^)"), s => s =!= "").as("syms"), col("cnt"))
      .localCheckpoint(true)
    rotateBlocks()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val n = size(col("syms"))
      val top = words.where(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n - 1), slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r")).agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val m = Merge(merges.length, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += m
        words = words.select(
          BpeKernels.applyMerges(col("syms"), Seq((m.left, m.right))).as("syms"),
          col("cnt")).localCheckpoint(true)
        rotateBlocks()
      }
    }
    live.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    merges.toSeq
  }

  /** Attach the BPE token array (`array<string>`) for a text column — one
    * fused-kernel pass per row, zero shuffle; the merge table rides as a
    * codegen reference object. */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "bpe_tokens"): DataFrame =
    df.withColumn(outCol,
      BpeKernels.encode(col(textCol), merges.map(m => (m.left, m.right))))

  /** BPE token count column for a text column. */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    size(BpeKernels.encode(text, merges.map(m => (m.left, m.right))))
}
