package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row term counting: `array<string>` tokens →
  * `array<struct<term, tf>>`, term-sorted. The BM25 postings build rides
  * this instead of an explode + `groupBy(doc_id, term)` — term frequencies
  * are ROW-LOCAL (all tokens of a document sit in its one row), so the
  * corpus-wide (doc, term) shuffle the relational spelling pays is pure
  * waste; the kernel computes the finished postings of each document in
  * the scan itself, leaving the index build exactly one shuffle (the
  * bucket-layout repartition). Empty and null tokens are skipped (the
  * shared word-rule contract); the term sort makes output (and therefore
  * written file bytes) deterministic. */
object TermCountKernel {

  val EntryType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false)))

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) counts.merge(t, 1, (a, b) => a + b)
      }
      i += 1
    }
    val keys = counts.keySet().toArray(new Array[UTF8String](counts.size()))
    java.util.Arrays.sort(keys.asInstanceOf[Array[Object]])
    val out = new Array[Any](keys.length)
    var j = 0
    while (j < keys.length) {
      // clone: the input array may view a reused unsafe buffer.
      out(j) = InternalRow(keys(j).clone(), counts.get(keys(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  case class TermCounts(child: Expression) extends UnaryExpression {
    override def prettyName: String = "graft_term_counts"
    override def dataType: DataType = ArrayType(EntryType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr =>
        s"${ev.value} = graft.functions.TermCountKernel.compute($arr);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Column form: tokens → term-sorted `array<struct<term, tf>>`. */
  def termCounts(tokens: Column): Column =
    GraftSql.column(TermCounts(GraftSql.expression(tokens)))
}
