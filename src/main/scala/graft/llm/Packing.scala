package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Sequence packing — the step between a filtered corpus and a training
  * run: documents are arranged into fixed-token-budget units so every
  * training sequence is (nearly) full. Two standard disciplines:
  *
  *  - [[chunkPack]] (concat-and-chunk): conceptually concatenate all
  *    documents in a deterministic order and cut every `chunkTokens`
  *    tokens; a document may straddle a chunk boundary. This is the
  *    classic causal-LM packing.
  *  - [[binPack]] (next-fit bins, no splitting): a document never splits;
  *    a new pack opens whenever the running total would overflow. Used
  *    when documents must stay intact (SFT examples, contrastive pairs).
  *
  * Both are deterministic (xxhash64 ordering, no `rand()`) and sharded:
  * documents are hashed into `shards` independent streams packed in
  * parallel, so the only coordination is within a shard. At 100 TB the
  * alternative — one global ordering — would funnel the corpus through a
  * single sort partition; sharding keeps the plan fully parallel at the
  * cost of at most one partially-filled pack per shard.
  *
  * `shards = 0` (the default) auto-sizes the shard count from the corpus
  * ROW COUNT ONLY — a fixed default would silently bound parallelism and
  * per-shard sort size at scale (the reference auto-computes partitions
  * instead of pinning them, dbldatagen/datasets/dataset_provider.py:291),
  * while folding in cluster parallelism would make pack assignment depend
  * on where the job runs. Same data -> same shard count -> same packs,
  * on a laptop or a 1000-executor cluster.
  */
object Packing {

  /** Row ceiling per auto-sized shard: small enough that one shard's
    * window/sort partition comfortably fits an executor, large enough that
    * per-shard waste (at most one partial pack) stays negligible. */
  val TargetRowsPerShard = 1000000L

  /** Resolve `shards = 0` to `ceil(rows / 1M)` — a pure function of the
    * data, NOT of the cluster (defaultParallelism was an input until r8;
    * that made default pack assignment environment-dependent, a silent
    * reproducibility break in an engine that advertises deterministic,
    * partition-independent output). The one extra count job is
    * metadata-only over parquet sources; pass an explicit shard count to
    * skip it (results depend on the shard count, so pinned-output
    * pipelines should pin it). */
  private def resolveShards(df: DataFrame, shards: Int): Int =
    if (shards > 0) shards
    else {
      val byRows = (df.count() + TargetRowsPerShard - 1) / TargetRowsPerShard
      math.min(math.max(byRows, 1L), 1L << 20).toInt
    }

  private def shardCol(keyCols: Seq[String], shards: Int, seed: Long) =
    pmod(xxhash64(keyCols.map(col) :+ lit(seed ^ 0x5bd1e995L): _*), lit(shards.toLong))

  /** Concat-and-chunk packing. Adds:
    *  - `pack_shard`: which independent stream the doc belongs to;
    *  - `chunk_first` / `chunk_last`: the chunk index range (within the
    *    shard) this document's tokens land in;
    *  - `chunk_offset`: token offset of the document's first token inside
    *    `chunk_first`.
    *
    * Plan: one shuffle (window cumulative sum per shard, streaming frame —
    * no per-group buffering). Rows with a null/negative token count are
    * treated as 0 tokens: they attach to the chunk already in progress and
    * occupy nothing — in particular, a zero-token row whose cumulative
    * offset lands on an exact chunk boundary clamps to the PREVIOUS chunk
    * rather than indexing one past the shard's last real chunk. */
  def chunkPack(df: DataFrame, keyCols: Seq[String], tokenCol: String,
      chunkTokens: Long, shards: Int = 0, seed: Long = 42L): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    require(shards >= 0, s"shards must be >= 0 (0 = auto), got $shards")
    import org.apache.spark.sql.expressions.Window
    val nShards = resolveShards(df, shards)
    val tok = greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L))
    val w = Window.partitionBy(col("pack_shard"))
      .orderBy(Sampling.hashFraction(keyCols.map(col), seed).asc +: keyCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = col("__cum") - tok
    val first = when(tok > lit(0L), floor(start / chunkTokens))
      .otherwise(floor(greatest(col("__cum") - 1, lit(0L)) / chunkTokens))
    df.withColumn("pack_shard", shardCol(keyCols, nShards, seed))
      .withColumn("__cum", sum(tok).over(w))
      .withColumn("chunk_first", first)
      .withColumn("chunk_last", greatest(floor((col("__cum") - 1) / chunkTokens), first))
      .withColumn("chunk_offset", when(tok > lit(0L), start % chunkTokens)
        .otherwise(least(col("__cum") - first * chunkTokens, lit(chunkTokens - 1))))
      .drop("__cum")
  }

  /** Next-fit bin packing without document splitting. Adds:
    *  - `pack_shard`: the independent stream;
    *  - `pack_id`: pack index within the shard;
    *  - `pack_pos`: the document's position within its pack.
    *
    * A document larger than `maxTokens` gets a pack of its own (the
    * standard pipeline behavior — flag or pre-chunk oversized docs
    * upstream if that is unacceptable). Next-fit guarantees at most
    * 2x the optimal pack count per shard.
    *
    * Plan: repartition by shard + in-partition sort, then ONE sequential
    * pass per partition (`mapPartitions`) — bin state is inherently
    * recursive (each boundary depends on the previous), which is exactly
    * the per-partition imperative case mapPartitions exists for; the scan
    * resets its state on every shard change, so shards sharing a Spark
    * partition stay independent and the result does not depend on the
    * shard->partition mapping. */
  def binPack(df: DataFrame, keyCols: Seq[String], tokenCol: String,
      maxTokens: Long, shards: Int = 0, seed: Long = 42L): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be > 0, got $maxTokens")
    require(shards >= 0, s"shards must be >= 0 (0 = auto), got $shards")
    val nShards = resolveShards(df, shards)
    val prepared = df
      .withColumn("pack_shard", shardCol(keyCols, nShards, seed))
      .withColumn("__tok", greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L)))
      .withColumn("__h", Sampling.hashFraction(keyCols.map(col), seed))
      .repartition(nShards, col("pack_shard"))
      .sortWithinPartitions(col("pack_shard").asc +:
        col("__h").asc +: keyCols.map(col(_).asc): _*)
    val shardIdx = prepared.schema.fieldIndex("pack_shard")
    val tokIdx = prepared.schema.fieldIndex("__tok")
    val outSchema = StructType(prepared.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("pack_id", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pack_pos", LongType, nullable = false)))
    val packed = prepared.mapPartitions { it =>
      var curShard = Long.MinValue
      var curSum = 0L
      var packId = -1L
      var pos = 0L
      it.map { row =>
        val sh = row.getLong(shardIdx)
        val tok = row.getLong(tokIdx)
        if (sh != curShard) { curShard = sh; curSum = 0L; packId = -1L }
        if (packId < 0 || curSum + tok > maxTokens) {
          packId += 1; curSum = 0L; pos = 0L
        } else pos += 1
        curSum += tok
        Row.fromSeq(row.toSeq ++ Seq(packId, pos))
      }
    }(Encoders.row(outSchema))
    packed.drop("__tok", "__h")
  }

  /** Best-fit-decreasing bin packing without document splitting — the
    * quality upgrade over [[binPack]]'s next-fit: documents are processed
    * LARGEST FIRST within each shard and each lands in the open pack with
    * the least remaining room that still fits it (tightest fit), opening a
    * new pack only when none fits. Guarantees (11/9)·OPT + 6/9 packs per
    * shard vs next-fit's 2·OPT; on natural document-length distributions
    * the fill-ratio gap is what [[q_pack_bestfit]]'s harness measures.
    *
    * Same determinism and shard contract as [[binPack]]: hash-sharded
    * streams, state resets on shard change, output independent of the
    * shard->partition mapping. Within a shard, ties break to the
    * longest-lived (lowest-id) pack, and equal-length documents order by
    * their hash (then key) — a pure function of the data.
    *
    * Plan: repartition by shard + in-partition sort by (shard, tokens
    * DESC, hash), one sequential pass. The open-pack index is a TreeMap
    * (remaining capacity -> pack ids), so each placement is O(log packs);
    * per-shard state is one entry per pack — bounded by the shard's row
    * count (the auto-sizer caps shards at ~1M rows).
    *
    * Adds `pack_shard`, `pack_id`, `pack_pos` (position in DESCENDING
    * token order within the pack). Oversized docs (> maxTokens) get a
    * pack of their own, like [[binPack]]. */
  def binPackBestFit(df: DataFrame, keyCols: Seq[String], tokenCol: String,
      maxTokens: Long, shards: Int = 0, seed: Long = 42L): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be > 0, got $maxTokens")
    require(shards >= 0, s"shards must be >= 0 (0 = auto), got $shards")
    val nShards = resolveShards(df, shards)
    val prepared = df
      .withColumn("pack_shard", shardCol(keyCols, nShards, seed))
      .withColumn("__tok", greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L)))
      .withColumn("__h", Sampling.hashFraction(keyCols.map(col), seed))
      .repartition(nShards, col("pack_shard"))
      .sortWithinPartitions(col("pack_shard").asc +: col("__tok").desc +:
        col("__h").asc +: keyCols.map(col(_).asc): _*)
    val shardIdx = prepared.schema.fieldIndex("pack_shard")
    val tokIdx = prepared.schema.fieldIndex("__tok")
    val outSchema = StructType(prepared.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("pack_id", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pack_pos", LongType, nullable = false)))
    val packed = prepared.mapPartitions { it =>
      // remaining capacity -> pack ids at that capacity (lowest id first).
      var open: java.util.TreeMap[Long, java.util.TreeSet[Long]] = null
      var remaining: scala.collection.mutable.LongMap[Long] = null
      var posInPack: scala.collection.mutable.LongMap[Long] = null
      var curShard = Long.MinValue
      var nextPack = 0L
      def reset(): Unit = {
        open = new java.util.TreeMap[Long, java.util.TreeSet[Long]]()
        remaining = scala.collection.mutable.LongMap.empty[Long]
        posInPack = scala.collection.mutable.LongMap.empty[Long]
        nextPack = 0L
      }
      reset()
      it.map { row =>
        val sh = row.getLong(shardIdx)
        val tok = row.getLong(tokIdx)
        if (sh != curShard) { curShard = sh; reset() }
        // Tightest open pack that fits; ties to the lowest pack id.
        val entry = open.ceilingEntry(tok)
        val packId =
          if (entry == null) {
            val id = nextPack; nextPack += 1
            remaining(id) = maxTokens; posInPack(id) = -1L
            open.computeIfAbsent(maxTokens, _ => new java.util.TreeSet[Long]()).add(id)
            id
          } else entry.getValue.first()
        // Move the pack to its new capacity bucket.
        val before = remaining(packId)
        val bucket = open.get(before)
        bucket.remove(packId)
        if (bucket.isEmpty) open.remove(before)
        // Clamp at 0 BEFORE storing: an oversized singleton's raw negative
        // remainder would desynchronize `remaining` from its bucket key
        // (stored under max(after,0)=0), and the next zero-token row
        // selecting that pack would look up bucket -n and NPE.
        val after = math.max(before - tok, 0L)
        remaining(packId) = after
        // A full or oversized pack (after == 0) is retired, never
        // re-inserted: a capacity-0 entry would be ceilingEntry(0)'s first
        // hit, attaching zero-token rows to oversized singletons and
        // breaking the "oversized docs get a pack of their own" contract.
        // tok==0 rows instead join the tightest open non-full pack (or
        // open a fresh one when none is open).
        if (after > 0L) {
          open.computeIfAbsent(after, _ => new java.util.TreeSet[Long]()).add(packId)
        }
        val pos = posInPack(packId) + 1L
        posInPack(packId) = pos
        Row.fromSeq(row.toSeq ++ Seq(packId, pos))
      }
    }(Encoders.row(outSchema))
    packed.drop("__tok", "__h")
  }
}
