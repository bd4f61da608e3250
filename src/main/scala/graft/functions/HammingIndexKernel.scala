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

  /** Immutable bucketed index over a corpus of 64-bit sketches: sketches
    * stored once, per-(piece, slice-value) buckets hold int offsets;
    * `ids`, when present (one per hash — callers pre-reduce duplicate
    * hashes to their smallest id), enables [[MihIndex.minIdWithin]];
    * the optional rank payload (`rankBytes`/`rankInv`) enables the fused
    * candidate+verify probe [[MihIndex.idsBelowWithinRankDot]].
    * Serializable — ships to executors as one codegen reference object
    * (8·n sketch [+8·n id] bytes + 4·pieces·n bucket bytes + offsets
    * [+rankLen·n rank bytes + 8·n inverse norms]). */
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
    // is bit-identical to the zip_with/aggregate one.
    require(rankBytes == null ||
      (hashes.length > 0 && rankBytes.length % hashes.length == 0 &&
        rankInv != null && rankInv.length == hashes.length),
      "rankBytes must be rankLen·n with a parallel rankInv")
    private val rankLen =
      if (rankBytes == null || hashes.isEmpty) 0 else rankBytes.length / hashes.length
    private val rankMean = (rankLen - 1) / 2.0

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
      while (j < end) {
        val m = members(j)
        if (ids(m) < selfId && java.lang.Long.bitCount(hashes(m) ^ h) <= d) {
          val off = m * rankLen
          val inv = rankInv(m)
          var s = 0.0
          var i = 0
          while (i < rankLen) {
            s += q(i) * ((rankBytes(off + i) * 0.5 - rankMean) * inv)
            i += 1
          }
          if (s >= minDot) acc.add(ids(m))
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
}
