package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Multi-index Hamming (MIH) probe: "is any corpus sketch within Hamming
  * distance d of this one?" as a single stateless expression — the
  * stream-side twin of the batch pigeonhole join
  * ([[graft.llm.Dedup.nearDupHamming64]]).
  *
  * The driver-known corpus (one long per image, e.g. pHashes) is bucketed
  * `pieces` ways by disjoint bit slices (Norouzi et al., "Fast Search in
  * Hamming Space with Multi-Index Hashing", CVPR 2012 — public method);
  * by pigeonhole, any sketch within d < pieces must match a probe's slice
  * exactly in at least one piece, so the probe scans only the ≤pieces
  * matching buckets and EXACT-verifies each member (`bit_count(xor) <= d`)
  * — flags iff a true within-d neighbor exists, no false positives at
  * all (unlike the candidate-only minhash band guard). Expected probe
  * cost is `pieces · n / 2^(64/pieces)` verifies; with the recommended
  * pieces = 4 (16-bit slices) that is ~6 verifies per row per million
  * corpus images. Larger radii (d ≥ pieces) need more pieces and the
  * buckets coarsen exponentially — use the batch join for those. */
object HammingIndexKernel {

  /** Immutable bucketed index over a corpus of 64-bit sketches: sketches
    * stored once, per-(piece, slice-value) buckets hold int offsets.
    * Serializable — ships to executors as one codegen reference object
    * (8·n sketch bytes + 4·pieces·n bucket bytes + offsets). */
  final class MihIndex(val hashes: Array[Long], val pieces: Int)
      extends Serializable {
    require(pieces >= 1 && pieces <= 16 && 64 % pieces == 0,
      s"pieces must divide 64 and be <= 16, got $pieces")
    private val bpp = 64 / pieces
    require(bpp >= 8, s"pieces=$pieces gives $bpp-bit slices — buckets " +
      "degenerate below 8 bits; use the batch pigeonhole join instead")
    private val nBuckets = 1 << bpp
    // offsets(p*nBuckets + v) .. offsets(...+1): members of bucket (p, v).
    private val offsets = new Array[Int](pieces * nBuckets + 1)
    private val members = new Array[Int](pieces * hashes.length)
    locally {
      val mask = if (bpp == 64) -1L else (1L << bpp) - 1L
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

    /** TRUE iff some corpus sketch is within Hamming distance `d` of `h`.
      * Complete for d < pieces (pigeonhole); exact-verified, so never a
      * false positive. */
    def anyWithin(h: Long, d: Int): Boolean = {
      val mask = if (bpp == 64) -1L else (1L << bpp) - 1L
      var p = 0
      while (p < pieces) {
        val b = p * nBuckets + ((h >>> (p * bpp)) & mask).toInt
        var j = offsets(b)
        val end = offsets(b + 1)
        while (j < end) {
          if (java.lang.Long.bitCount(hashes(members(j)) ^ h) <= d) return true
          j += 1
        }
        p += 1
      }
      false
    }
  }

  case class HammingAnyWithin(child: Expression, index: MihIndex, maxDistance: Int)
      extends UnaryExpression {
    require(maxDistance >= 0 && maxDistance < index.pieces,
      s"need 0 <= maxDistance < pieces for pigeonhole completeness, " +
        s"got d=$maxDistance pieces=${index.pieces}")
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

  def anyWithin(sketch: Column, index: MihIndex, maxDistance: Int): Column =
    GraftSql.column(HammingAnyWithin(GraftSql.expression(sketch), index, maxDistance))
}
