package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Membership tests of an `array<long>` column against a driver-known
  * long set — the per-row form of "does this document share a fingerprint
  * with the reference set". A join spells the same thing relationally, but
  * needs a second pass to reassemble per-row verdicts (an aggregation —
  * which under streaming means watermarked state, and joining a stream
  * against a frame DERIVED from itself is outright unsupported). A pure
  * per-row expression is stateless, streams through any plan position, and
  * whole-stage-codegen fuses it.
  *
  * The set ships as a sorted array referenced once per plan
  * (`addReferenceObj`, the [[CentroidKernels]] pattern): 8 bytes per
  * element, binary search per probe. Sized for driver-collectable sets
  * (an eval benchmark's grams — 10^5..10^7 longs); corpus-scale sets
  * belong in a join.
  */
object SetKernels {

  /** Sorted-array set with binary-search probes; shipped to executors as
    * one codegen reference object. Equality/hashCode are CONTENT-based
    * with a precomputed hash, because the expression tree embeds this
    * object: plan canonicalization and codegen-cache keys compare
    * expressions repeatedly, and a structural Seq field would walk up to
    * 10^7 boxed elements on the driver per comparison (Spark's own InSet
    * wraps its literal set for the same reason). */
  final class LongSortedSet(val sorted: Array[Long]) extends Serializable {
    override val hashCode: Int = java.util.Arrays.hashCode(sorted)
    override def equals(other: Any): Boolean = other match {
      case o: LongSortedSet =>
        (this eq o) || (hashCode == o.hashCode &&
          java.util.Arrays.equals(sorted, o.sorted))
      case _ => false
    }
    override def toString: String =
      s"LongSortedSet(n=${sorted.length}, hash=$hashCode)"

    /** SQL three-valued membership: TRUE if ANY non-null element is in the
      * set (a hit is a hit regardless of null neighbors — `TRUE OR
      * UNKNOWN = TRUE`, matching `array_contains`); null if no element hit
      * but a null element was seen (membership unknown); else false. */
    def containsAny(arr: ArrayData): Any = {
      val n = arr.numElements()
      var sawNull = false
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) sawNull = true
        else if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) return true
        i += 1
      }
      if (sawNull) null else false
    }

    /** Count of elements present in the set; null when ANY element is null
      * (the exact count is unknowable — a null element might or might not
      * be a member). */
    def countIn(arr: ArrayData): Any = {
      val n = arr.numElements()
      var hits = 0L
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) hits += 1L
        i += 1
      }
      hits
    }
  }

  sealed abstract class SetProbe extends UnaryExpression {
    def set: LongSortedSet
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got ${other.simpleString}")
    }
  }

  /** TRUE iff any element is in the set (see [[LongSortedSet.containsAny]]
    * for the null semantics). The set rides in the case class as the
    * content-hashed holder, so structural plan comparisons stay cheap. */
  case class ArrayAnyInSet(child: Expression, set: LongSortedSet) extends SetProbe {
    override def prettyName: String = "graft_any_in_set"
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      set.containsAny(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("longSet", set,
        "graft.functions.SetKernels.LongSortedSet")
      nullSafeCodeGen(ctx, ev, arr => s"""
        Object r = $ref.containsAny($arr);
        ${ev.isNull} = (r == null);
        if (!${ev.isNull}) ${ev.value} = ((Boolean) r).booleanValue();""")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Count of elements present in the set (null when any element is null —
    * the count is unknowable, see [[LongSortedSet.countIn]]). */
  case class ArrayCountInSet(child: Expression, set: LongSortedSet) extends SetProbe {
    override def prettyName: String = "graft_count_in_set"
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      set.countIn(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("longSet", set,
        "graft.functions.SetKernels.LongSortedSet")
      nullSafeCodeGen(ctx, ev, arr => s"""
        Object r = $ref.countIn($arr);
        ${ev.isNull} = (r == null);
        if (!${ev.isNull}) ${ev.value} = ((Long) r).longValue();""")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def anyInSet(arr: Column, values: Array[Long]): Column =
    GraftSql.column(ArrayAnyInSet(GraftSql.expression(arr),
      new LongSortedSet(values.clone().sorted)))

  def countInSet(arr: Column, values: Array[Long]): Column =
    GraftSql.column(ArrayCountInSet(GraftSql.expression(arr),
      new LongSortedSet(values.clone().sorted)))
}
