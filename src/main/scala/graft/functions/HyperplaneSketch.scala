package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused hyperplane sketch: `probes` LSH bucket keys from an embedding in
  * one compiled pass — replaces the posexplode + planes*probes projection
  * aggregates (and their exchange) with a narrow per-row expression.
  *
  * Bit-compatibility contract with the aggregate pipeline (pinned dedup
  * oracles depend on the keys):
  *  - component(p, l, i) = pmod(xxhash64(p, l, i), 1e6)/1e6 - 0.5 with the
  *    exact chain hashInt(i, hashInt(l, hashInt(p, 42))).
  *  - projections accumulate ascending-index with Spark Sum's zero-seeded
  *    fold (`coalesce(sum, 0.0) + v`), skipping null elements; a plane
  *    with no non-null contribution renders '0' (null sum fails `>= 0`).
  *  - key p = "p#" + sign bits ('1' iff projection >= 0; NaN -> '0').
  *  - an EMPTY vector returns null (the aggregate form dropped such rows
  *    — zero exploded rows; callers filter nulls to match).
  */
object HyperplaneSketch {

  def compute(vec: ArrayData, planes: Int, probes: Int): ArrayData = {
    val dim = vec.numElements()
    if (dim == 0) return null
    val keys = new Array[UTF8String](probes)
    var p = 0
    while (p < probes) {
      val hp = XXH64.hashInt(p, 42L)
      val sb = new java.lang.StringBuilder(planes + 4)
      sb.append(p).append('#')
      var l = 0
      while (l < planes) {
        val hpl = XXH64.hashInt(l, hp)
        var acc = 0.0
        var any = false
        var i = 0
        while (i < dim) {
          if (!vec.isNullAt(i)) {
            val h = XXH64.hashInt(i, hpl)
            val m = ((h % 1000000L) + 1000000L) % 1000000L
            acc += vec.getDouble(i) * (m.toDouble / 1000000.0 - 0.5)
            any = true
          }
          i += 1
        }
        sb.append(if (any && acc >= 0) '1' else '0')
        l += 1
      }
      keys(p) = UTF8String.fromString(sb.toString)
      p += 1
    }
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  case class Keys(child: Expression, planes: Int, probes: Int) extends UnaryExpression {
    override def prettyName: String = "graft_hyperplane_keys"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData], planes, probes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => s"""
        ${ev.value} = graft.functions.HyperplaneSketch.compute($arr, $planes, $probes);
        ${ev.isNull} = (${ev.value} == null);""")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: `probes` bucket keys from an `array<double>` column
    * (floats upcast by the caller's cast). */
  def keys(vec: Column, planes: Int, probes: Int): Column =
    GraftSql.column(Keys(GraftSql.expression(vec.cast("array<double>")), planes, probes))
}
