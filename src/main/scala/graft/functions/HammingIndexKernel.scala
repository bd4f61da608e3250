package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Multi-index Hamming (MIH) probe: "is any corpus sketch within Hamming
  * distance d of this one?" (and "what is the smallest id among them?")
  * as single stateless expressions — the stream-side twin and the
  * bounded-corpus dedup engine next to the batch pigeonhole join
  * ([[graft.llm.Dedup.nearDupHamming64]]).
  *
  * The driver-known corpus (one long per image, e.g. pHashes) is bucketed
  * `pieces` ways by disjoint bit slices (Norouzi et al., "Fast Search in
  * Hamming Space with Multi-Index Hashing", CVPR 2012 — public method).
  * Generalized pigeonhole: a sketch within distance d has some piece
  * carrying at most e = ⌊d/pieces⌋ errors, so the probe enumerates, per
  * piece, every slice value within e bit flips of the query's slice
  * (Σ_{k≤e} C(bpp, k) probe keys — MIH's query expansion) and
  * EXACT-verifies each bucket member (`bit_count(xor) <= d`). Complete
  * for ANY radius, zero false positives. Expected verify cost is
  * `pieces · Σ_{k≤e} C(bpp,k) · n / 2^bpp`; at the recommended pieces=4
  * (16-bit slices), d≤3 probes 4 buckets/row and d=10 probes 548 —
  * ~6 and ~850 verifies per row per million corpus images. */
object HammingIndexKernel {

  /** Serialized footprint of ONE index row — the shared sizing formula
    * every builder's shard math derives from (r16, VERDICT #2: row-count
    * caps inherited from the id-only pHash form under-counted the
    * rank-carrying form ~4×). Per row: 8 B sketch, 8 B id when carried,
    * 4·pieces B bucket members, and — when the rank payload rides for the
    * fused in-probe verify — rankLen rank bytes + 8 B inverse norm. The
    * per-index fixed offsets table (4·(pieces·2^(64/pieces)+1) B — ~1 MB
    * at pieces=4) is not per-row and is negligible next to any real
    * budget for the FLAT index; [[MihCellIndex]] builds one table per
    * bucket-tabled cell, bounded by its `maxTables` budget (default 128
    * ⇒ ≤ ~134 MB on top of the row bytes — r16 review). Concretely: id-only pHash at pieces=4 is 24 B/row (50M rows
    * ≈ 1.2 GB — the documented r14 footprint); the 64-bucket
    * rank-carrying video-profile form is 104 B/row, so the SAME byte
    * budget shards it ~4.3× earlier (~11.5M rows). */
  def indexBytesPerRow(pieces: Int, hasIds: Boolean, rankLen: Int): Long =
    8L + (if (hasIds) 8L else 0L) + 4L * pieces +
      (if (rankLen > 0) rankLen.toLong + 8L else 0L)

  /** Default per-shard byte budget for driver-collected + broadcast MIH
    * indexes — the r14-documented ~1.2 GB pHash ceiling, now enforced in
    * BYTES so payload-carrying indexes shard proportionally earlier
    * instead of surprising the driver at the row cap. */
  val DefaultIndexBudgetBytes: Long = 1200000000L

  /** One MIH bucket-offset table's serialized bytes —
    * `4·(pieces·2^(64/pieces) + 1)` (~1 MB at pieces=4). The flat
    * [[MihIndex]] owns exactly one; a [[MihCellIndex]] owns up to its
    * `maxTables` budget of them. */
  def bucketTableBytes(pieces: Int): Long =
    4L * (pieces.toLong * (1L << (64 / pieces)) + 1L)

  /** Rows one shard may hold under `maxIndexBytes`, additionally clamped
    * so every flattened per-row allocation fits a JVM array — the rank
    * payload (`rankLen·rows`) AND the bucket members (`pieces·rows`);
    * the r15 defect was a row-count cap that admitted shards whose
    * rank-byte allocation overflowed Int, and clamping only on rankLen
    * would leave the members array exposed for rankLen < pieces (r16
    * review). At the defaults (1.2 GB, pieces=4, rank-carrying 64):
    * 11,538,461 rows; id-only: 37.5M.
    *
    * `cellTables` (r17 — ADVICE): a [[MihCellIndex]] shard additionally
    * carries up to that many ~1 MB bucket-offset tables on top of the
    * row payload, so a cell-index shard sized by rows alone would
    * broadcast ~10%+ over the stated budget at the defaults. With
    * `cellTables` > 0 the cap RESERVES those bytes: the full
    * `cellTables·tableBytes` when the shard is big enough for every
    * table to materialize (≥ `cellTables·MicroCellMaxRows` rows — tables
    * only go to cells of ≥ [[MihCellIndex.MicroCellMaxRows]] rows), and
    * the per-row amortized bound `tableBytes / MicroCellMaxRows` (~256 B
    * at pieces=4) below that, where at most ⌊rows/4096⌋ tables can
    * exist. At the rank-carrying defaults with `cellTables = 128`:
    * 10,247,901 rows (10,247,901·104 B + 128 tables = 1,199,999,944 B ≤
    * the 1.2 GB budget). Default 0 preserves the flat-index cap. */
  def shardRowCap(maxIndexBytes: Long, pieces: Int, hasIds: Boolean,
      rankLen: Int, cellTables: Int = 0): Long = {
    val rowBytes = indexBytesPerRow(pieces, hasIds, rankLen)
    val byBudget =
      if (cellTables <= 0) maxIndexBytes / rowBytes
      else {
        val tBytes = bucketTableBytes(pieces)
        val micro = MihCellIndex.MicroCellMaxRows.toLong
        val flat = (maxIndexBytes - cellTables.toLong * tBytes) / rowBytes
        if (flat >= cellTables.toLong * micro) flat
        else // fewer than cellTables cells can reach table size here:
          maxIndexBytes / (rowBytes + (tBytes + micro - 1) / micro)
      }
    math.max(1L, math.min(byBudget,
      Int.MaxValue.toLong / math.max(rankLen, pieces)))
  }

  /** Hash-range passes needed for `n` rows under the byte budget (+2%
    * headroom for shard skew) — the one shard-count formula every
    * builder and its tests share. `cellTables` as in [[shardRowCap]]. */
  def shardCount(n: Long, maxIndexBytes: Long, pieces: Int, hasIds: Boolean,
      rankLen: Int, cellTables: Int = 0): Int =
    math.max(1L, (n * 1.02 /
      shardRowCap(maxIndexBytes, pieces, hasIds, rankLen, cellTables))
      .ceil.toLong).toInt

  /** Measurement-only instrumentation: when [[countScans]] is on, every
    * bucket-member visit (the XOR-verify loop — the dominant probe cost)
    * bumps [[scanCounter]]. Static and JVM-local: exact under local[*]
    * (the bench harness), per-executor on a cluster. Off by default; the
    * disabled cost is one volatile read per bucket scan. */
  @volatile var countScans: Boolean = false
  val scanCounter = new java.util.concurrent.atomic.LongAdder

  /** Immutable bucketed index over a corpus of 64-bit sketches: sketches
    * stored once, per-(piece, slice-value) buckets hold int offsets;
    * `ids`, when present (one per hash — callers pre-reduce duplicate
    * hashes to their smallest id), enables [[MihIndex.minIdWithin]];
    * the optional rank payload (`rankBytes`/`rankInv`) enables the fused
    * candidate+verify probe [[MihIndex.idsBelowWithinRankDot]].
    * Serializable — ships to executors as one codegen reference object;
    * [[indexBytesPerRow]] is the per-row footprint formula builders size
    * their shards with (24 B/row id-only at pieces=4; +rankLen+8 with
    * the rank payload). */
  final class MihIndex(val hashes: Array[Long], val pieces: Int,
      val ids: Array[Long], val rankBytes: Array[Byte],
      val rankInv: Array[Double]) extends Serializable {

    def this(hashes: Array[Long], pieces: Int) =
      this(hashes, pieces, null, null, null)
    def this(hashes: Array[Long], pieces: Int, ids: Array[Long]) =
      this(hashes, pieces, ids, null, null)

    // Optional per-row rank payload for the IN-PROBE Spearman verify
    // ([[idsBelowWithinRankDot]]): `rankBytes` holds each row's doubled
    // average ranks (exact in a byte) flattened, `rankInv` the row's
    // precomputed inverse norm — the caller supplies both from the SAME
    // arithmetic its column-side rank vectors use, so the in-probe dot
    // is bit-identical to the zip_with/aggregate one. An empty corpus is
    // legal (r16 — a hash-range shard can be empty at small n and every
    // probe of it just returns nothing).
    require(rankBytes == null ||
      (rankInv != null && rankInv.length == hashes.length &&
        (if (hashes.length == 0) rankBytes.length == 0
         else rankBytes.length % hashes.length == 0)),
      "rankBytes must be rankLen·n with a parallel rankInv")
    private val rankLen =
      if (rankBytes == null || hashes.isEmpty) 0 else rankBytes.length / hashes.length
    private val rankMean = (rankLen - 1) / 2.0

    /** THE rank-reconstruction dot — `Σ q(i)·((b·0.5−mean)·inv)` in
      * ascending-i order, one definition for every collecting and
      * boolean probe (r17 review: five verbatim copies were a divergence
      * surface under the bit-identical batch≡stream contract). */
    @inline private def rankDotAt(m: Int, q: Array[Double]): Double = {
      val off = m * rankLen
      val inv = rankInv(m)
      var s = 0.0
      var i = 0
      while (i < rankLen) {
        s += q(i) * ((rankBytes(off + i) * 0.5 - rankMean) * inv)
        i += 1
      }
      s
    }

    // pieces ∈ {4, 8}: the slice width bpp must be <= 16 (the 1 << bpp
    // bucket table — bpp of 32/64 would overflow the Int shift and index
    // out of bounds) and >= 8 (buckets degenerate below that).
    require((pieces == 4 || pieces == 8) && 64 % pieces == 0,
      s"pieces must be 4 or 8 (16- or 8-bit slices), got $pieces")
    require(ids == null || ids.length == hashes.length,
      s"ids (${if (ids == null) -1 else ids.length}) must parallel hashes (${hashes.length})")
    private val bpp = 64 / pieces
    private val nBuckets = 1 << bpp
    private val mask = (1L << bpp) - 1L
    // offsets(p*nBuckets + v) .. offsets(...+1): members of bucket (p, v).
    private val offsets = new Array[Int](pieces * nBuckets + 1)
    private val members = new Array[Int](pieces * hashes.length)
    locally {
      val counts = new Array[Int](pieces * nBuckets)
      var i = 0
      while (i < hashes.length) {
        var p = 0
        while (p < pieces) {
          counts(p * nBuckets + ((hashes(i) >>> (p * bpp)) & mask).toInt) += 1
          p += 1
        }
        i += 1
      }
      var acc = 0
      var b = 0
      while (b < counts.length) { offsets(b) = acc; acc += counts(b); b += 1 }
      offsets(counts.length) = acc
      val cursor = offsets.clone()
      i = 0
      while (i < hashes.length) {
        var p = 0
        while (p < pieces) {
          val b2 = p * nBuckets + ((hashes(i) >>> (p * bpp)) & mask).toInt
          members(cursor(b2)) = i
          cursor(b2) += 1
          p += 1
        }
        i += 1
      }
    }

    /** Scan bucket (p, v): the smallest id among members within `d` of
      * `h` (ids==null counts any match as 0), or Long.MaxValue. */
    private def scanBucket(p: Int, v: Int, h: Long, d: Int): Long = {
      var best = Long.MaxValue
      var j = offsets(p * nBuckets + v)
      val end = offsets(p * nBuckets + v + 1)
      if (countScans) scanCounter.add(end - j)
      while (j < end) {
        val m = members(j)
        if (java.lang.Long.bitCount(hashes(m) ^ h) <= d) {
          val id = if (ids == null) 0L else ids(m)
          if (id < best) best = id
        }
        j += 1
      }
      best
    }

    /** Enumerate slice values within `e` flips of `v` (flips at bit
      * positions >= `from`), folding the per-bucket minima. `earlyOut`:
      * stop as soon as ANY match exists (the boolean probe). */
    private def probePiece(p: Int, v: Int, e: Int, from: Int, h: Long,
        d: Int, earlyOut: Boolean, bestSoFar: Long): Long = {
      var best = math.min(bestSoFar, scanBucket(p, v, h, d))
      if (earlyOut && best != Long.MaxValue) return best
      if (e > 0) {
        var bit = from
        while (bit < bpp) {
          best = probePiece(p, v ^ (1 << bit), e - 1, bit + 1, h, d, earlyOut, best)
          if (earlyOut && best != Long.MaxValue) return best
          bit += 1
        }
      }
      best
    }

    private def probe(h: Long, d: Int, earlyOut: Boolean): Long = {
      val e = d / pieces
      var best = Long.MaxValue
      var p = 0
      while (p < pieces) {
        best = probePiece(p, ((h >>> (p * bpp)) & mask).toInt, e, 0, h, d,
          earlyOut, best)
        if (earlyOut && best != Long.MaxValue) return best
        p += 1
      }
      best
    }

    /** TRUE iff some corpus sketch is within Hamming distance `d` of `h`.
      * Complete for any d (multi-probe); exact-verified, so never a
      * false positive. */
    def anyWithin(h: Long, d: Int): Boolean =
      probe(h, d, earlyOut = true) != Long.MaxValue

    /** Smallest id among corpus sketches within `d` of `h`, or
      * Long.MaxValue when none — the keep-lowest-id dedup primitive
      * (a row is a near-dup loser iff this is < its own id). */
    def minIdWithin(h: Long, d: Int): Long = {
      require(ids != null, "minIdWithin needs an id-carrying MihIndex")
      probe(h, d, earlyOut = false)
    }

    /** Distinct corpus ids STRICTLY below `selfId` within Hamming `d` of
      * `h`, ascending — the PAIR-EMISSION probe: when every corpus row
      * probes the index, each unordered pair is produced exactly once,
      * by its larger-id side (and under hash-range multi-pass sharding,
      * exactly once overall — by the shard holding the smaller id).
      * Complete for any d via the same slice-perturbation expansion as
      * the boolean/min-id probes; exact (every candidate XOR-verified).
      * Requires an id-carrying index. */
    def idsBelowWithin(h: Long, d: Int, selfId: Long): Array[Long] = {
      require(ids != null, "idsBelowWithin needs an id-carrying MihIndex")
      val acc = new java.util.TreeSet[java.lang.Long]
      val e = d / pieces
      var p = 0
      while (p < pieces) {
        collectPiece(p, ((h >>> (p * bpp)) & mask).toInt, e, 0, h, d, selfId, acc)
        p += 1
      }
      val out = new Array[Long](acc.size)
      val it = acc.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    private def collectPiece(p: Int, v: Int, e: Int, from: Int, h: Long,
        d: Int, selfId: Long, acc: java.util.TreeSet[java.lang.Long]): Unit = {
      var j = offsets(p * nBuckets + v)
      val end = offsets(p * nBuckets + v + 1)
      if (countScans) scanCounter.add(end - j)
      while (j < end) {
        val m = members(j)
        if (ids(m) < selfId && java.lang.Long.bitCount(hashes(m) ^ h) <= d)
          acc.add(ids(m))
        j += 1
      }
      if (e > 0) {
        var bit = from
        while (bit < bpp) {
          collectPiece(p, v ^ (1 << bit), e - 1, bit + 1, h, d, selfId, acc)
          bit += 1
        }
      }
    }

    /** [[idsBelowWithin]] with the VERIFY FUSED IN: a candidate id is
      * emitted only when the dot of the probing row's normalized rank
      * vector `q` with the candidate's reconstructed one is >= `minDot`.
      * This is the scale lever for signatures with fat Hamming tails
      * (correlated bits): tail candidates die inside the probe — a pure
      * in-memory rejection — instead of surviving to drag two rank
      * payloads each through the verify join's shuffle. Reconstruction
      * `(rankByte·0.5 − mean)·inv` and the left-fold dot replicate the
      * column-side arithmetic operation-for-operation, so the surviving
      * pair set is bit-identical to join-then-verify. Requires the rank
      * payload (and `q.length == rankLen`). */
    def idsBelowWithinRankDot(h: Long, d: Int, selfId: Long,
        q: Array[Double], minDot: Double): Array[Long] = {
      require(ids != null && rankBytes != null,
        "idsBelowWithinRankDot needs an id- and rank-carrying MihIndex")
      if (hashes.isEmpty) return Array.emptyLongArray
      require(q.length == rankLen, s"rank vector length ${q.length} != $rankLen")
      val acc = new java.util.TreeSet[java.lang.Long]
      val e = d / pieces
      var p = 0
      while (p < pieces) {
        collectPieceRankDot(p, ((h >>> (p * bpp)) & mask).toInt, e, 0, h, d,
          selfId, q, minDot, acc)
        p += 1
      }
      val out = new Array[Long](acc.size)
      val it = acc.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    private def collectPieceRankDot(p: Int, v: Int, e: Int, from: Int,
        h: Long, d: Int, selfId: Long, q: Array[Double], minDot: Double,
        acc: java.util.TreeSet[java.lang.Long]): Unit = {
      var j = offsets(p * nBuckets + v)
      val end = offsets(p * nBuckets + v + 1)
      if (countScans) scanCounter.add(end - j)
      while (j < end) {
        val m = members(j)
        if (ids(m) < selfId && java.lang.Long.bitCount(hashes(m) ^ h) <= d) {
          if (rankDotAt(m, q) >= minDot) acc.add(ids(m))
        }
        j += 1
      }
      if (e > 0) {
        var bit = from
        while (bit < bpp) {
          collectPieceRankDot(p, v ^ (1 << bit), e - 1, bit + 1, h, d,
            selfId, q, minDot, acc)
          bit += 1
        }
      }
    }

    /** [[idsBelowWithinRankDot]] that also EMITS what the probe already
      * computed per surviving candidate — the exact Hamming distance and
      * the exact Spearman dot (r16, VERDICT #4: the id-only form made the
      * caller re-join the emitted ids back to the hash and rank frames
      * and recompute both values — four O(pairs) shuffles recomputing
      * what the probe had certified in memory). Results accumulate into
      * `acc` keyed by candidate id (a candidate reachable through several
      * pieces verifies identically each time, so last-write-wins is
      * exact), letting a multi-cell caller fold several sub-index probes
      * into one sorted emission. */
    def hitsBelowWithinRankDot(h: Long, d: Int, selfId: Long,
        q: Array[Double], minDot: Double,
        acc: java.util.TreeMap[java.lang.Long, RankHit]): Unit = {
      require(ids != null && rankBytes != null,
        "hitsBelowWithinRankDot needs an id- and rank-carrying MihIndex")
      if (hashes.isEmpty) return
      require(q.length == rankLen, s"rank vector length ${q.length} != $rankLen")
      val e = d / pieces
      var p = 0
      while (p < pieces) {
        collectPieceRankDotHits(p, ((h >>> (p * bpp)) & mask).toInt, e, 0,
          h, d, selfId, q, minDot, acc)
        p += 1
      }
    }

    private def collectPieceRankDotHits(p: Int, v: Int, e: Int, from: Int,
        h: Long, d: Int, selfId: Long, q: Array[Double], minDot: Double,
        acc: java.util.TreeMap[java.lang.Long, RankHit]): Unit = {
      var j = offsets(p * nBuckets + v)
      val end = offsets(p * nBuckets + v + 1)
      if (countScans) scanCounter.add(end - j)
      while (j < end) {
        val m = members(j)
        val ham = java.lang.Long.bitCount(hashes(m) ^ h)
        if (ids(m) < selfId && ham <= d) {
          val s = rankDotAt(m, q)
          if (s >= minDot) acc.put(ids(m), new RankHit(ids(m), ham, s))
        }
        j += 1
      }
      if (e > 0) {
        var bit = from
        while (bit < bpp) {
          collectPieceRankDotHits(p, v ^ (1 << bit), e - 1, bit + 1, h, d,
            selfId, q, minDot, acc)
          bit += 1
        }
      }
    }

    /** TRUE iff some corpus sketch within Hamming `d` of `h` ALSO passes
      * the rank-dot verify (r17 — the boolean GUARD form of the fused
      * probe): early-out on the first verified hit, no id filter (a
      * guard flags any verified corpus member). Same reconstruction and
      * dot arithmetic as [[hitsBelowWithinRankDot]], so a guard flag is
      * exactly "the pair probe would emit this row against SOME corpus
      * row" — the batch≡stream verdict-identity contract. */
    def anyWithinRankDot(h: Long, d: Int, q: Array[Double],
        minDot: Double): Boolean = {
      require(rankBytes != null, "anyWithinRankDot needs a rank-carrying MihIndex")
      if (hashes.isEmpty) return false
      require(q.length == rankLen, s"rank vector length ${q.length} != $rankLen")
      val e = d / pieces
      var p = 0
      while (p < pieces) {
        if (anyPieceRankDot(p, ((h >>> (p * bpp)) & mask).toInt, e, 0, h, d,
          q, minDot)) return true
        p += 1
      }
      false
    }

    private def anyPieceRankDot(p: Int, v: Int, e: Int, from: Int, h: Long,
        d: Int, q: Array[Double], minDot: Double): Boolean = {
      var j = offsets(p * nBuckets + v)
      val end = offsets(p * nBuckets + v + 1)
      if (countScans) scanCounter.add(end - j)
      while (j < end) {
        val m = members(j)
        if (java.lang.Long.bitCount(hashes(m) ^ h) <= d) {
          if (rankDotAt(m, q) >= minDot) return true
        }
        j += 1
      }
      if (e > 0) {
        var bit = from
        while (bit < bpp) {
          if (anyPieceRankDot(p, v ^ (1 << bit), e - 1, bit + 1, h, d, q,
            minDot)) return true
          bit += 1
        }
      }
      false
    }
  }

  /** One fused-probe survivor: candidate id, exact Hamming distance and
    * exact Spearman dot — what [[MihIndex.hitsBelowWithinRankDot]] emits
    * so the caller never recomputes either. */
  final class RankHit(val id: Long, val hamming: Int, val dot: Double)
      extends Serializable

  /** A cell too small to earn a bucket table ([[MihCellIndex]]): probes
    * scan every member with the exact XOR + rank-dot verify — the same
    * arithmetic the MIH buckets run, minus the candidate pre-filter,
    * which below [[MihCellIndex.MicroCellMaxRows]] rows costs less than
    * the bucket table it replaces. */
  private final class MicroCell(hashes: Array[Long], ids: Array[Long],
      rankBytes: Array[Byte], rankInv: Array[Double], rankLen: Int)
      extends Serializable {
    val size: Int = hashes.length
    private val rankMean = (rankLen - 1) / 2.0
    // Same single rank-dot definition as MihIndex.rankDotAt (r17 review).
    @inline private def rankDotAt(m: Int, q: Array[Double]): Double = {
      val off = m * rankLen
      val inv = rankInv(m)
      var s = 0.0
      var i = 0
      while (i < rankLen) {
        s += q(i) * ((rankBytes(off + i) * 0.5 - rankMean) * inv)
        i += 1
      }
      s
    }
    def hitsBelowWithinRankDot(h: Long, d: Int, selfId: Long,
        q: Array[Double], minDot: Double,
        acc: java.util.TreeMap[java.lang.Long, RankHit]): Unit = {
      if (countScans) scanCounter.add(size)
      var m = 0
      while (m < size) {
        val ham = java.lang.Long.bitCount(hashes(m) ^ h)
        if (ids(m) < selfId && ham <= d) {
          val s = rankDotAt(m, q)
          if (s >= minDot) acc.put(ids(m), new RankHit(ids(m), ham, s))
        }
        m += 1
      }
    }

    /** Early-out boolean form — the guard probe (r17); same verify
      * arithmetic as the collecting scan above. */
    def anyWithinRankDot(h: Long, d: Int, q: Array[Double],
        minDot: Double): Boolean = {
      if (countScans) scanCounter.add(size)
      var m = 0
      while (m < size) {
        if (java.lang.Long.bitCount(hashes(m) ^ h) <= d) {
          if (rankDotAt(m, q) >= minDot) return true
        }
        m += 1
      }
      false
    }
  }

  /** CELL-PARTITIONED multi-index Hamming structure (r16, VERDICT #1):
    * one sub-index per caller-assigned cell key. The plain index's
    * probe scans ~`pieces·Σ C(bpp,≤e)/2^bpp` of the WHOLE corpus per
    * query (4.3% at 16-bit slices / e=3) — O(n) per probe, O(n²)
    * aggregate. When rows carry a cheap equality-ish pre-partition key
    * that true pairs (near-)agree on (for video re-encodes: container
    * duration/fps buckets from the same parse that builds the profile),
    * probing only the query's OWN cell plus the caller-chosen adjacent
    * cells bounds each probe by the CELL population instead of the
    * corpus. The cell structure costs nothing in recall for pairs whose
    * keys land within the probed neighborhood (the caller's contract)
    * and the per-probe verify arithmetic is IDENTICAL to the flat index,
    * so surviving pairs match the flat probe bit-for-bit on those pairs.
    * Degenerate corpora that concentrate in one cell degrade gracefully
    * to the flat index's behavior. Memory is bounded by the CORPUS and a
    * TABLE BUDGET, never the cell count: cells below
    * [[MihCellIndex.MicroCellMaxRows]] rows store plain scan-all arrays
    * (a probe scans ≤ that many members — comparable to what the MIH
    * buckets would visit at that size), and the ~1 MB bucket tables go
    * to the LARGEST cells only, at most `maxTables` of them (default
    * 128 ⇒ ≤ ~134 MB of tables per index on top of the row bytes —
    * state it when sizing shard budgets; typical duration×fps corpora
    * populate far fewer cells than the budget, so they are unaffected).
    * Construction transiently holds a second copy of the row arrays
    * while slicing them per cell. */
  final class MihCellIndex(cellKeys: Array[Long], hashes: Array[Long],
      pieces: Int, ids: Array[Long], rankBytes: Array[Byte],
      rankInv: Array[Double], maxTables: Int = 128) extends Serializable {
    require(cellKeys.length == hashes.length &&
      ids != null && ids.length == hashes.length &&
      rankBytes != null && rankInv != null && rankInv.length == hashes.length,
      "cellKeys/hashes/ids/rankInv must be parallel with a flat rankBytes")
    require(maxTables >= 0, s"maxTables must be >= 0, got $maxTables")
    // Plain vals (not references to the constructor arrays) so the
    // serialized index carries ONLY the per-cell slices, never a second
    // flat copy of the inputs.
    private val nRows = hashes.length
    private val rankLen = if (nRows == 0) 0 else rankBytes.length / nRows

    /** cell key → that cell's sub-index: a bucket-tabled [[MihIndex]]
      * for the up-to-`maxTables` largest cells at or past
      * [[MihCellIndex.MicroCellMaxRows]] rows, a scan-all [[MicroCell]]
      * otherwise. */
    private val cells: java.util.HashMap[java.lang.Long, AnyRef] = {
      val counts = new java.util.HashMap[java.lang.Long, Array[Int]]
      var i = 0
      while (i < cellKeys.length) {
        val c = counts.get(cellKeys(i))
        if (c == null) counts.put(cellKeys(i), Array(1)) else c(0) += 1
        i += 1
      }
      // Table allocation: largest-first, bounded — under adversarial
      // keys the tables (not the rows) would otherwise dominate memory.
      val tabled = new java.util.HashSet[java.lang.Long]
      locally {
        import scala.jdk.CollectionConverters._
        counts.entrySet().asScala.toSeq
          .filter(_.getValue()(0) >= MihCellIndex.MicroCellMaxRows)
          .sortBy(e => (-e.getValue()(0), e.getKey.longValue()))
          .take(maxTables)
          .foreach(e => tabled.add(e.getKey))
      }
      val parts = new java.util.HashMap[java.lang.Long,
        (Array[Long], Array[Long], Array[Byte], Array[Double], Array[Int])]
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val n = e.getValue()(0)
        parts.put(e.getKey,
          (new Array[Long](n), new Array[Long](n), new Array[Byte](n * rankLen),
            new Array[Double](n), Array(0)))
      }
      i = 0
      while (i < cellKeys.length) {
        val (hs, is, rb, ri, cur) = parts.get(cellKeys(i))
        val j = cur(0)
        hs(j) = hashes(i)
        is(j) = ids(i)
        System.arraycopy(rankBytes, i * rankLen, rb, j * rankLen, rankLen)
        ri(j) = rankInv(i)
        cur(0) = j + 1
        i += 1
      }
      val out = new java.util.HashMap[java.lang.Long, AnyRef]
      val it2 = parts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val (hs, is, rb, ri, _) = e.getValue
        out.put(e.getKey,
          if (tabled.contains(e.getKey)) new MihIndex(hs, pieces, is, rb, ri)
          else new MicroCell(hs, is, rb, ri, rankLen))
      }
      out
    }

    /** (bucket-tabled cells, scan-all micro cells) — observability for
      * the table budget. */
    def tableStats: (Int, Int) = {
      var tables = 0
      var micro = 0
      val it = cells.values().iterator()
      while (it.hasNext) it.next() match {
        case _: MihIndex => tables += 1
        case _: MicroCell => micro += 1
      }
      (tables, micro)
    }

    /** Number of populated cells and the largest cell's population —
      * the bound each probe's member scans now carry. */
    def cellStats: (Int, Int) = {
      var maxN = 0
      val it = cells.values().iterator()
      while (it.hasNext) {
        val n = it.next() match {
          case m: MihIndex => m.hashes.length
          case m: MicroCell => m.size
        }
        maxN = math.max(maxN, n)
      }
      (cells.size(), maxN)
    }

    /** Fused candidate+verify pair probe over the given probe cells (the
      * query's own cell plus whatever adjacency the caller's key scheme
      * needs): for each populated probed cell, the cell sub-index runs
      * the same complete MIH expansion + exact XOR + exact rank-dot as
      * the flat [[MihIndex.hitsBelowWithinRankDot]] (micro cells scan
      * all members — same verify arithmetic, so identical emissions);
      * results fold into one ascending-id array. A candidate id lives in
      * exactly one cell, so the fold needs no cross-cell dedup beyond
      * the shared map. */
    def hitsBelowWithinRankDot(probeCells: Array[Long], h: Long, d: Int,
        selfId: Long, q: Array[Double], minDot: Double): Array[RankHit] = {
      // Validated once here so micro and bucket-tabled cells fail the
      // same way on a wrong-length rank vector (r16 review: the micro
      // scan would otherwise index out of bounds or silently truncate).
      require(nRows == 0 || q.length == rankLen,
        s"rank vector length ${q.length} != $rankLen")
      val acc = new java.util.TreeMap[java.lang.Long, RankHit]
      var c = 0
      while (c < probeCells.length) {
        cells.get(probeCells(c)) match {
          case m: MihIndex => m.hitsBelowWithinRankDot(h, d, selfId, q, minDot, acc)
          case m: MicroCell => m.hitsBelowWithinRankDot(h, d, selfId, q, minDot, acc)
          case null => ()
        }
        c += 1
      }
      val out = new Array[RankHit](acc.size)
      val it = acc.values().iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    /** Boolean GUARD probe (r17): TRUE iff some corpus row in any probed
      * cell lies within Hamming `d` of `h` AND passes the rank-dot
      * verify — the streaming-guard form of [[hitsBelowWithinRankDot]],
      * early-out on the first verified hit, no id filter. Identical
      * candidate expansion + verify arithmetic, so a guard flag is
      * exactly "the pair probe would emit ≥ 1 hit at selfId = ∞". */
    def anyVerifiedWithin(probeCells: Array[Long], h: Long, d: Int,
        q: Array[Double], minDot: Double): Boolean = {
      require(nRows == 0 || q.length == rankLen,
        s"rank vector length ${q.length} != $rankLen")
      var c = 0
      while (c < probeCells.length) {
        val hit = cells.get(probeCells(c)) match {
          case m: MihIndex => m.anyWithinRankDot(h, d, q, minDot)
          case m: MicroCell => m.anyWithinRankDot(h, d, q, minDot)
          case null => false
        }
        if (hit) return true
        c += 1
      }
      false
    }

    /** Catalyst-facing form of [[hitsBelowWithinRankDot]]: ArrayData in,
      * ArrayData of (id, hamming, spearman) structs out — one call site
      * for both the interpreted and generated paths. */
    def probeAsArrayData(h: Long, selfId: Long,
        ranks: org.apache.spark.sql.catalyst.util.ArrayData,
        probeCells: org.apache.spark.sql.catalyst.util.ArrayData,
        maxDistance: Int, minDot: Double)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val hits = hitsBelowWithinRankDot(probeCells.toLongArray(), h,
        maxDistance, selfId, ranks.toDoubleArray(), minDot)
      val rows = new Array[Any](hits.length)
      var i = 0
      while (i < hits.length) {
        rows(i) = org.apache.spark.sql.catalyst.InternalRow(
          hits(i).id, hits(i).hamming, hits(i).dot)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
    }
  }

  case class HammingAnyWithin(child: Expression, index: MihIndex, maxDistance: Int)
      extends UnaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    override def prettyName: String = "graft_hamming_any_within"
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint, got ${other.simpleString}")
    }
    override def nullSafeEval(input: Any): Any =
      index.anyWithin(input.asInstanceOf[Long], maxDistance)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("mihIndex", index,
        "graft.functions.HammingIndexKernel.MihIndex")
      nullSafeCodeGen(ctx, ev, h =>
        s"${ev.value} = $ref.anyWithin($h, $maxDistance);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Smallest within-radius corpus id (Long.MaxValue when none). */
  case class HammingMinIdWithin(child: Expression, index: MihIndex, maxDistance: Int)
      extends UnaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    require(index.ids != null, "HammingMinIdWithin needs an id-carrying MihIndex")
    override def prettyName: String = "graft_hamming_min_id_within"
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint, got ${other.simpleString}")
    }
    override def nullSafeEval(input: Any): Any =
      index.minIdWithin(input.asInstanceOf[Long], maxDistance)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("mihIndex", index,
        "graft.functions.HammingIndexKernel.MihIndex")
      nullSafeCodeGen(ctx, ev, h =>
        s"${ev.value} = $ref.minIdWithin($h, $maxDistance);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Broadcast-backed twin of [[HammingAnyWithin]] (r14 — ADVICE): the
    * plain expressions embed the index as a codegen reference object, so
    * it rides EVERY stage's serialized task binary — ~1.2 GB re-shipped
    * per stage (and per streaming micro-batch) at the 50M-hash cap. Here
    * the task binary carries only the `Broadcast` handle; TorrentBroadcast
    * serializes the index ONCE at creation and each executor fetches and
    * caches it once for the broadcast's lifetime, across stages and
    * micro-batches. The deserialized index is bound to a per-partition
    * mutable slot at codegen init (one `value()` call per task, not per
    * row). */
  case class HammingAnyWithinBc(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex], maxDistance: Int)
      extends UnaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    override def prettyName: String = "graft_hamming_any_within_bc"
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint, got ${other.simpleString}")
    }
    @transient private lazy val idx = bc.value
    override def nullSafeEval(input: Any): Any =
      idx.anyWithin(input.asInstanceOf[Long], maxDistance)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idxCls = "graft.functions.HammingIndexKernel.MihIndex"
      val bcRef = ctx.addReferenceObj("mihBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      val idxTerm = ctx.addMutableState(idxCls, "mihIdx",
        v => s"$v = ($idxCls) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, h =>
        s"${ev.value} = $idxTerm.anyWithin($h, $maxDistance);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Broadcast-backed twin of [[HammingMinIdWithin]] — see
    * [[HammingAnyWithinBc]] for the shipping rationale. */
  case class HammingMinIdWithinBc(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex], maxDistance: Int)
      extends UnaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    // Driver-side check only: `bc.value` on the driver returns the local
    // copy (no fetch) — executors never re-run this constructor body's
    // requirement because the expression arrives there deserialized.
    require(bc.value.ids != null, "HammingMinIdWithinBc needs an id-carrying MihIndex")
    override def prettyName: String = "graft_hamming_min_id_within_bc"
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint, got ${other.simpleString}")
    }
    @transient private lazy val idx = bc.value
    override def nullSafeEval(input: Any): Any =
      idx.minIdWithin(input.asInstanceOf[Long], maxDistance)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idxCls = "graft.functions.HammingIndexKernel.MihIndex"
      val bcRef = ctx.addReferenceObj("mihBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      val idxTerm = ctx.addMutableState(idxCls, "mihIdx",
        v => s"$v = ($idxCls) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, h =>
        s"${ev.value} = $idxTerm.minIdWithin($h, $maxDistance);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def anyWithin(sketch: Column, index: MihIndex, maxDistance: Int): Column =
    GraftSql.column(HammingAnyWithin(GraftSql.expression(sketch), index, maxDistance))

  def minIdWithin(sketch: Column, index: MihIndex, maxDistance: Int): Column =
    GraftSql.column(HammingMinIdWithin(GraftSql.expression(sketch), index, maxDistance))

  def anyWithin(sketch: Column,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex], maxDistance: Int): Column =
    GraftSql.column(HammingAnyWithinBc(GraftSql.expression(sketch), bc, maxDistance))

  def minIdWithin(sketch: Column,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex], maxDistance: Int): Column =
    GraftSql.column(HammingMinIdWithinBc(GraftSql.expression(sketch), bc, maxDistance))

  /** Broadcast-backed pair-emission probe: array of distinct corpus ids
    * strictly below this row's own id within `maxDistance` of its sketch
    * (see [[MihIndex.idsBelowWithin]]); `explode` the result to get the
    * `(id_a, id_b)` candidate pairs. Broadcast-only — a pair-emitting
    * probe only exists on the at-scale path, where an embedded index
    * riding every task binary is exactly the defect the broadcast twins
    * close. Null sketch or null id → null array. */
  case class HammingIdsBelowWithinBc(left: Expression, right: Expression,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex], maxDistance: Int)
      extends BinaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    // Driver-side check (executors receive the expression deserialized).
    require(bc.value.ids != null, "HammingIdsBelowWithinBc needs an id-carrying MihIndex")
    override def prettyName: String = "graft_hamming_ids_below_within_bc"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
      }
    @transient private lazy val idx = bc.value
    override def nullSafeEval(hash: Any, selfId: Any): Any =
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        idx.idsBelowWithin(hash.asInstanceOf[Long], maxDistance,
          selfId.asInstanceOf[Long]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idxCls = "graft.functions.HammingIndexKernel.MihIndex"
      val bcRef = ctx.addReferenceObj("mihBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      val idxTerm = ctx.addMutableState(idxCls, "mihIdx",
        v => s"$v = ($idxCls) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, (h, id) =>
        s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($idxTerm.idsBelowWithin($h, $maxDistance, $id));
           |""".stripMargin)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def idsBelowWithin(sketch: Column, selfId: Column,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex], maxDistance: Int): Column =
    GraftSql.column(HammingIdsBelowWithinBc(GraftSql.expression(sketch),
      GraftSql.expression(selfId), bc, maxDistance))

  /** Broadcast-backed FUSED candidate+verify pair probe — see
    * [[MihIndex.idsBelowWithinRankDot]]. Children: (sketch bigint, own id
    * bigint, normalized rank vector array<double>). */
  case class HammingIdsBelowWithinRankDotBc(first: Expression,
      second: Expression, third: Expression,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex],
      maxDistance: Int, minDot: Double)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    // minDot is spliced into generated Java as a literal — a non-finite
    // value ('NaN'/'Infinity') would not compile there, so fail at
    // construction instead (r15 ADVICE).
    require(java.lang.Double.isFinite(minDot),
      s"minDot must be finite, got $minDot")
    require(bc.value.ids != null && bc.value.rankBytes != null,
      "HammingIdsBelowWithinRankDotBc needs an id- and rank-carrying MihIndex")
    override def prettyName: String = "graft_hamming_ids_below_within_rankdot_bc"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (LongType, LongType, ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (bigint, bigint, array<double>), got " +
            s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
      }
    @transient private lazy val idx = bc.value
    override def nullSafeEval(hash: Any, selfId: Any, ranks: Any): Any =
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        idx.idsBelowWithinRankDot(hash.asInstanceOf[Long], maxDistance,
          selfId.asInstanceOf[Long],
          ranks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toDoubleArray(), minDot))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idxCls = "graft.functions.HammingIndexKernel.MihIndex"
      val bcRef = ctx.addReferenceObj("mihBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      val idxTerm = ctx.addMutableState(idxCls, "mihIdx",
        v => s"$v = ($idxCls) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, (h, id, r) =>
        s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($idxTerm.idsBelowWithinRankDot($h, $maxDistance, $id,
           |    $r.toDoubleArray(), $minDot));
           |""".stripMargin)
    }
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  def idsBelowWithinRankDot(sketch: Column, selfId: Column, ranks: Column,
      bc: org.apache.spark.broadcast.Broadcast[MihIndex],
      maxDistance: Int, minDot: Double): Column =
    GraftSql.column(HammingIdsBelowWithinRankDotBc(GraftSql.expression(sketch),
      GraftSql.expression(selfId), GraftSql.expression(ranks), bc,
      maxDistance, minDot))

  /** Broadcast-backed CELL-PARTITIONED fused pair probe over a
    * [[MihCellIndex]] — the scale form of the rank-dot probe (r16):
    * children (sketch bigint, own id bigint, normalized rank vector
    * array<double>, probe cell keys array<bigint>). Emits
    * `array<struct<id, hamming, spearman>>` — the verified pair WITH the
    * values the probe computed, so the caller's downstream is a single
    * explode, never a re-join/re-verify. */
  case class HammingPairsBelowRankDotCellBc(first: Expression,
      second: Expression, third: Expression, fourth: Expression,
      bc: org.apache.spark.broadcast.Broadcast[MihCellIndex],
      maxDistance: Int, minDot: Double)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance must be in [0, 64), got $maxDistance")
    require(java.lang.Double.isFinite(minDot),
      s"minDot must be finite, got $minDot")
    override def prettyName: String = "graft_hamming_pairs_rankdot_cell_bc"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false),
      StructField("spearman", DoubleType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = first.nullable || second.nullable ||
      third.nullable || fourth.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
        case (LongType, LongType, ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (bigint, bigint, array<double>, array<bigint>), " +
            s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString}, ${d.simpleString})")
      }
    @transient private lazy val idx = bc.value
    override def nullSafeEval(hash: Any, selfId: Any, ranks: Any, cells: Any): Any =
      idx.probeAsArrayData(hash.asInstanceOf[Long], selfId.asInstanceOf[Long],
        ranks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        cells.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        maxDistance, minDot)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idxCls = "graft.functions.HammingIndexKernel.MihCellIndex"
      val bcRef = ctx.addReferenceObj("mihCellBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      val idxTerm = ctx.addMutableState(idxCls, "mihCellIdx",
        v => s"$v = ($idxCls) $bcRef.value();")
      // minDot emitted through raw long bits: always a compilable literal.
      val minDotBits = java.lang.Double.doubleToLongBits(minDot)
      nullSafeCodeGen(ctx, ev, (h, id, r, c) =>
        s"""${ev.value} = $idxTerm.probeAsArrayData($h, $id, $r, $c,
           |  $maxDistance, Double.longBitsToDouble(${minDotBits}L));
           |""".stripMargin)
    }
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression, q: Expression): Expression =
      copy(first = f, second = s, third = t, fourth = q)
  }

  def pairsBelowRankDotCell(sketch: Column, selfId: Column, ranks: Column,
      probeCells: Column, bc: org.apache.spark.broadcast.Broadcast[MihCellIndex],
      maxDistance: Int, minDot: Double): Column =
    GraftSql.column(HammingPairsBelowRankDotCellBc(GraftSql.expression(sketch),
      GraftSql.expression(selfId), GraftSql.expression(ranks),
      GraftSql.expression(probeCells), bc, maxDistance, minDot))

  object MihCellIndex {
    /** Cells below this many rows store scan-all arrays instead of a
      * bucket-tabled [[MihIndex]]: the fixed offsets table costs
      * 4·pieces·2^(64/pieces) B (~1 MB at pieces=4), so under
      * adversarial cell keys (one key per row) the tables — not the
      * rows — would dominate memory; capping table construction at
      * n ≥ 4096 bounds tables by corpus/4096 while a scan-all probe of
      * < 4096 members costs about what the MIH expansion would visit at
      * that size anyway. */
    val MicroCellMaxRows: Int = 4096
  }
}
