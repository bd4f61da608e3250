package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle sketch: from a token array, ONE native expression builds
  * `struct(sh: array<long>, sig: array<long>)` — the sorted distinct
  * shingle hashes and the `numHashes`-entry minhash signature — in a
  * single pass over the shingles.
  *
  * Replaces a two-explode pipeline: shingle rows -> 128 `min(xxhash64)`
  * aggregates for the signature PLUS shingle rows -> `collect_set` for the
  * verification set, joined back by id. The fused kernel touches each
  * shingle once, hoists the per-shingle chain seed (`hashLong(h, 42)`)
  * that the aggregate form recomputed per hash family, and emits both
  * arrays with zero shuffles — the whole sketch becomes a narrow
  * projection, and the FIRST exchange of the dedup pipelines is the
  * band-key shuffle itself.
  *
  * Bit-compatibility contract (the pinned dedup oracles depend on it):
  *  - shingle strings: tokens `i until min(i+width, n)` joined with one
  *    space; `max(1, n - width + 1)` shingles (short docs yield the single
  *    whole-text shingle) — exactly `array_join(slice(toks, i+1, width))`.
  *  - shingle hash: `xxhash64(shingle)` = `XXH64.hashUTF8String(s, 42)`.
  *  - signature entry k: `min(xxhash64(h, k))` where the two-child hash
  *    chains `hashInt(k, hashLong(h, 42))`.
  *  - `sh`: distinct hashes sorted ascending = `sort_array(collect_set(h))`.
  *
  * Null tokens array -> null. Null token elements cannot occur from
  * `split` output (the only producer).
  */
object ShingleSketch {

  val Seed = 42L

  /** Static kernel: called from generated code — the codegen body stays a
    * one-line call, so the expression rides inside whole-stage codegen
    * without inflating the method. */
  def compute(tokens: ArrayData, width: Int, numHashes: Int): InternalRow = {
    val n = tokens.numElements()
    val nShingles = if (n <= width) 1 else n - width + 1
    val seen = new java.util.TreeSet[java.lang.Long]()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + width, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = tokens.getUTF8String(j); j += 1 }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), Seed)
      seen.add(h)
      if (numHashes > 0) {
        val chained = XXH64.hashLong(h, Seed)
        var k = 0
        while (k < numHashes) {
          val cand = XXH64.hashInt(k, chained)
          if (cand < mins(k)) mins(k) = cand
          k += 1
        }
      }
      i += 1
    }
    val sh = new Array[Long](seen.size)
    val it = seen.iterator()
    var s = 0
    while (it.hasNext) { sh(s) = it.next(); s += 1 }
    InternalRow(new GenericArrayData(sh), new GenericArrayData(mins))
  }

  case class Sketch(child: Expression, width: Int, numHashes: Int)
      extends UnaryExpression {
    override def prettyName: String = "graft_shingle_sketch"
    override def dataType: DataType = StructType(Seq(
      StructField("sh", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData], width, numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr =>
        s"${ev.value} = graft.functions.ShingleSketch.compute($arr, $width, $numHashes);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: `struct(sh, sig)` from a token-array column. */
  def sketch(tokens: Column, width: Int, numHashes: Int): Column =
    GraftSql.column(Sketch(GraftSql.expression(tokens), width, numHashes))

  // ------------------------------------------------- positional variant

  /** Per-POSITION window hashes: element i is the hash of the window
    * starting at token i (same strings and seed-42 hash as [[compute]],
    * but ordered and NOT distinct — for consumers that need positions,
    * like substring-span removal). `max(1, n - width + 1)` elements. */
  def computeWindowHashes(tokens: ArrayData, width: Int): ArrayData = {
    val n = tokens.numElements()
    val nShingles = if (n <= width) 1 else n - width + 1
    val out = new Array[Long](nShingles)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + width, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = tokens.getUTF8String(j); j += 1 }
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  case class WindowHashes(child: Expression, width: Int) extends UnaryExpression {
    override def prettyName: String = "graft_window_hashes"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      computeWindowHashes(input.asInstanceOf[ArrayData], width)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr =>
        s"${ev.value} = graft.functions.ShingleSketch.computeWindowHashes($arr, $width);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: ordered per-position window hashes from a token array. */
  def windowHashes(tokens: Column, width: Int): Column =
    GraftSql.column(WindowHashes(GraftSql.expression(tokens), width))

  // ------------------------------------------------------------- simhash

  /** Fused 64-bit SimHash of a token array — per-bit majority vote over
    * the multiset of token hashes, one compiled pass. Bit-identical to
    * the 64-vote-aggregate pipeline (`xxhash64(tok)` = seed-42 UTF8
    * hash; vote > 0 sets the bit, integer arithmetic throughout). */
  def computeSimHash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(tokens.getUTF8String(i), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sk = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sk |= (1L << b); b += 1 }
    sk
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def prettyName: String = "graft_simhash"
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      computeSimHash(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr =>
        s"${ev.value} = graft.functions.ShingleSketch.computeSimHash($arr);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: 64-bit simhash from a token-array column. */
  def simHash64(tokens: Column): Column =
    GraftSql.column(SimHash64(GraftSql.expression(tokens)))
}
