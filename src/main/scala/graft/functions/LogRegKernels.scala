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

/** Fused kernels for the hashed-n-gram logistic-regression quality
  * classifier ([[graft.llm.QualityClassifier]]) — the model-based
  * document filter of the GPT-3 / CCNet lineage (Brown et al. 2020 §A;
  * Wenzek et al., CCNet, LREC 2020), where a linear classifier over
  * hashed bag-of-n-grams separates "reference-quality" text from crawl
  * noise and its score gates what enters the training corpus.
  *
  * Two expressions, both single-pass and codegen'd:
  *
  *  - [[HashedFeatures]]: text → sparse feature vector
  *    `struct(indices array<int>, values array<double>)`. Tokens follow
  *    the repo-wide contract (`split(trim(lower(text)), "\s+")`, empty
  *    tokens dropped); n-gram orders 1..n hash through FNV-1a with an
  *    order-seeded basis into `[0, dim)`; counts are sublinear
  *    (`1 + ln(tf)`) and L2-normalized, the standard fastText/CCNet
  *    featurization. Indices ascend, so downstream dots are cache-friendly
  *    sequential scans.
  *  - [[LogRegScore]]: sparse features → `sigmoid(w·x + b)` against a
  *    driver-known weight table shipped once per plan as a codegen
  *    reference object (the [[PqKernels.Codebook]] pattern). Scoring a
  *    100 TB corpus is therefore a narrow zero-shuffle map — the weights
  *    never ride the rows and no join materializes.
  *
  * Null contract ([[VectorKernels]] convention): null text → null
  * features; null/malformed features → null score. Empty text yields the
  * EMPTY feature vector (score = sigmoid(bias)), not null — an empty
  * document is a scorable document.
  */
object LogRegKernels {

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** FNV-1a 64-bit over the UTF-16 chars of `s`, basis perturbed by the
    * n-gram order so "a b" as a bigram and "a b" as two unigrams land in
    * unrelated buckets. Folded to [0, dim) via unsigned remainder. */
  def hashToBucket(s: String, order: Int, dim: Int): Int = {
    var h = 0xcbf29ce484222325L ^ (order.toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    // >>> 1 keeps the remainder non-negative without Math.floorMod.
    ((h >>> 1) % dim).toInt
  }

  /** Single-pass featurization: tokenize, hash all n-gram orders into one
    * count map, emit sorted indices + L2-normalized sublinear-tf values. */
  def computeFeatures(text: UTF8String, dim: Int, ngrams: Int): InternalRow = {
    val toks0 = WsPattern.split(text.trim().toLowerCase.toString, -1)
    // Drop empties (a blank document splits to [""]).
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    i = 0; var j = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }

    val counts = new java.util.HashMap[Integer, Integer]()
    val sb = new java.lang.StringBuilder
    var order = 1
    while (order <= ngrams) {
      var w = 0
      while (w + order <= nTok) {
        sb.setLength(0)
        var k = 0
        while (k < order) {
          if (k > 0) sb.append(' ')
          sb.append(toks(w + k))
          k += 1
        }
        val bucket = Integer.valueOf(hashToBucket(sb.toString, order, dim))
        val prev = counts.get(bucket)
        counts.put(bucket, if (prev == null) 1 else prev + 1)
        w += 1
      }
      order += 1
    }

    val nnz = counts.size()
    val idx = new Array[Int](nnz)
    val it = counts.keySet().iterator()
    i = 0
    while (it.hasNext) { idx(i) = it.next(); i += 1 }
    java.util.Arrays.sort(idx)
    val vals = new Array[Double](nnz)
    var norm2 = 0.0
    i = 0
    while (i < nnz) {
      val v = 1.0 + math.log(counts.get(idx(i)).toDouble)
      vals(i) = v
      norm2 += v * v
      i += 1
    }
    val inv = if (norm2 > 0) 1.0 / math.sqrt(norm2) else 0.0
    i = 0
    while (i < nnz) { vals(i) *= inv; i += 1 }
    InternalRow(new GenericArrayData(idx.map(Int.box(_): Any)),
      new GenericArrayData(vals.map(Double.box(_): Any)))
  }

  val featureType: StructType = StructType(Seq(
    StructField("indices", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))

  case class HashedFeatures(child: Expression, dim: Int, ngrams: Int)
      extends UnaryExpression {
    require(dim > 0, s"feature dim must be positive, got $dim")
    require(ngrams >= 1, s"ngram order must be >= 1, got $ngrams")
    override def prettyName: String = "graft_hashed_features"
    override def dataType: DataType = featureType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any =
      computeFeatures(input.asInstanceOf[UTF8String], dim, ngrams)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = graft.functions.LogRegKernels.computeFeatures($str, $dim, $ngrams);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Immutable dense weight vector + bias, shipped to executors once per
    * plan as a codegen reference object. */
  final class WeightTable(val weights: Array[Double], val bias: Double)
      extends Serializable {
    /** sigmoid(w·x + b) over the sparse features; null on malformed input
      * (null element arrays, index out of [0, weights.length)). */
    def score(idx: ArrayData, vals: ArrayData): java.lang.Double = {
      if (idx == null || vals == null) return null
      val n = idx.numElements()
      if (vals.numElements() != n) return null
      var z = bias
      var i = 0
      while (i < n) {
        if (idx.isNullAt(i) || vals.isNullAt(i)) return null
        val k = idx.getInt(i)
        if (k < 0 || k >= weights.length) return null
        z += weights(k) * vals.getDouble(i)
        i += 1
      }
      Double.box(1.0 / (1.0 + math.exp(-z)))
    }
  }

  case class LogRegScore(child: Expression, weights: Seq[Double], bias: Double)
      extends UnaryExpression {
    override def prettyName: String = "graft_logreg_score"
    override protected def stringArgs: Iterator[Any] =
      Iterator(child, s"weights[${weights.length}]", bias)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    @transient private lazy val table = new WeightTable(weights.toArray, bias)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case s: StructType if s.length == 2 &&
        s(0).dataType.isInstanceOf[ArrayType] &&
        s(1).dataType.isInstanceOf[ArrayType] => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects struct(indices array<int>, values array<double>), " +
          s"got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = {
      val row = input.asInstanceOf[InternalRow]
      if (row.isNullAt(0) || row.isNullAt(1)) null
      else table.score(row.getArray(0), row.getArray(1))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("logregWeights", table,
        "graft.functions.LogRegKernels.WeightTable")
      val tmp = ctx.freshName("lrScore")
      nullSafeCodeGen(ctx, ev, row => s"""
        java.lang.Double $tmp = ($row.isNullAt(0) || $row.isNullAt(1))
          ? null : $ref.score($row.getArray(0), $row.getArray(1));
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }""")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: sparse hashed-n-gram features for a string column. */
  def hashedFeatures(text: Column, dim: Int, ngrams: Int): Column =
    GraftSql.column(HashedFeatures(GraftSql.expression(text), dim, ngrams))

  /** Column API: sigmoid(w·x + b) of a feature struct against
    * driver-known weights. */
  def logRegScore(features: Column, weights: Array[Double], bias: Double): Column =
    GraftSql.column(LogRegScore(GraftSql.expression(features),
      weights.toSeq, bias))
}
