package graft.analyzer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data profiling + generator reverse-engineering, mirroring the reference
  * `DataAnalyzer` (dbldatagen/data_analyzer.py:177-260, 481, 500).
  *
  * `summarizeToDF` computes every measure for every column in ONE
  * distributed aggregation pass (the reference runs one selectExpr+limit per
  * measure and unions them — a driver-side loop of jobs; a single wide agg
  * is the 100-TB-friendly shape), then pivots the single result row into the
  * measure x column summary table driver-side (tiny).
  */
object DataAnalyzer {

  val Measures: Seq[String] =
    Seq("count", "null_count", "distinct_count", "min", "max", "mean", "stddev",
      "p25", "p50", "p75")

  /** measure x column summary: first column `measure`, one STRING column per
    * source column. `exact` uses count(distinct) and exact interpolated
    * percentiles; the default approximates (approx_count_distinct /
    * percentile_approx) which is the right call at scale. mean/stddev and
    * the quartiles (describe()-style, ref data_analyzer.py:149-175) apply
    * to numeric columns only (null elsewhere) and render with fixed
    * 6-decimal formatting so the summary string is engine-portable rather
    * than hostage to shortest-round-trip float printing. Still ONE
    * aggregation pass for all measures. */
  def summarizeToDF(df: DataFrame, exact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields.toSeq
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      def numericSafe(agg: => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (isNumeric(f.dataType)) fmt6(agg) else lit(null).cast(StringType)
      // All three quartiles from ONE aggregation buffer per column (the
      // array-percentage form), not three independent percentile aggs — the
      // exact variant buffers the whole column per agg, so sharing the
      // buffer is a 3x memory/update-cost cut. percentile returns doubles,
      // but percentile_approx returns the input type (long for integral
      // columns) — cast so %.6f formats both.
      val qs = array(lit(0.25), lit(0.5), lit(0.75))
      val pcts: org.apache.spark.sql.Column =
        if (isNumeric(f.dataType))
          (if (exact) percentile(c, qs) else percentile_approx(c, qs, lit(10000)))
            .cast("array<double>")
        else lit(null).cast("array<double>")
      Seq(
        count(c).as(s"${f.name}__count"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__null_count"),
        minMaxSafe(f, min(c)).as(s"${f.name}__min"),
        minMaxSafe(f, max(c)).as(s"${f.name}__max"),
        numericSafe(avg(c)).as(s"${f.name}__mean"),
        numericSafe(stddev(c)).as(s"${f.name}__stddev"),
        pcts.as(s"${f.name}__pcts")) ++
      // Approx distinct folds into the same pass (plain HLL agg); EXACT
      // countDistinct is deliberately NOT here — see the second pass below.
      (if (exact) Nil
       else Seq(approx_count_distinct(c).as(s"${f.name}__distinct_count")))
    }
    // Expand the shared quartile array into p25/p50/p75 AFTER the agg (a
    // projection over the 1-row result).
    val passOneMeasures =
      Seq("count", "null_count", "min", "max", "mean", "stddev") ++
        (if (exact) Nil else Seq("distinct_count"))
    val expanded = cols.flatMap { f =>
      passOneMeasures.map(m => col(s"${f.name}__$m")) ++
      Seq("p25" -> 1, "p50" -> 2, "p75" -> 3).map { case (m, i) =>
        fmt6(element_at(col(s"${f.name}__pcts"), i)).as(s"${f.name}__$m")
      }
    }
    val row: Row =
      df.agg(aggs.head, aggs.tail: _*).select(expanded: _*).collect().head

    // Exact distinct counts run as a SECOND single-row aggregation pass:
    // N countDistinct aggs make Catalyst Expand every input row N+1 ways
    // AND drag every co-located TypedImperativeAggregate (the exact
    // percentile buffers) through the expanded stream — measured 5.7s vs
    // 0.8s + 1.05s for the two plans run separately at sf0.1. Two scans
    // of the source beat one scan of a 4x self-join-shaped Expand at any
    // scale where the scan is column-pruned.
    val distinctVals: Map[String, Long] =
      if (!exact) Map.empty
      else {
        val dAggs = cols.map(f => countDistinct(col(f.name)).as(f.name))
        val dRow = df.agg(dAggs.head, dAggs.tail: _*).collect().head
        cols.indices.map(i => cols(i).name -> dRow.getLong(i)).toMap
      }

    val rowMeasures = passOneMeasures ++ Seq("p25", "p50", "p75")
    val perRowWidth = rowMeasures.length
    val out = Measures.zipWithIndex.map { case (m, _) =>
      Row.fromSeq(m +: cols.zipWithIndex.map { case (f, ci) =>
        if (m == "distinct_count" && exact)
          String.valueOf(distinctVals(f.name))
        else {
          val v = row.get(ci * perRowWidth + rowMeasures.indexOf(m))
          if (v == null) null else String.valueOf(v)
        }
      })
    }
    val schema = StructType(StructField("measure", StringType, nullable = false) +:
      cols.map(f => StructField(f.name, StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }

  /** Fixed 6-decimal rendering that PROPAGATES null: Spark's `format_string`
    * follows printf and renders a null argument as the literal string
    * "null", which poisoned all-null / non-numeric quartile cells. */
  private def fmt6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.isNotNull, format_string("%.6f", c))

  /** min/max on complex types is not defined — emit null for them. */
  private def minMaxSafe(f: StructField, agg: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    f.dataType match {
      case _: StructType | _: MapType | _: ArrayType | BinaryType => lit(null).cast(StringType)
      case _ => agg.cast(StringType)
    }

  /** Emit Scala generator code for a schema (reference
    * `scriptDataGeneratorFromSchema` — data_analyzer.py:481). */
  def scriptDataGeneratorFromSchema(schema: StructType, name: String = "synthetic",
      rows: Long = 1000000L): String = {
    val sb = new StringBuilder
    sb.append(s"""DataGenerator(spark, "$name", rows = ${rows}L)\n""")
    schema.fields.foreach { f =>
      val strat = defaultStrategyFor(f.dataType)
      sb.append(s"""  .withColumn("${f.name}", "${f.dataType.sql.toLowerCase}", $strat)\n""")
    }
    sb.append("  .build()\n")
    sb.toString
  }

  /** Emit generator code parameterized by observed data ranges AND shape
    * (reference `scriptDataGeneratorFromData` — data_analyzer.py:500, which
    * only carries min/max). Numeric columns whose quartiles are symmetric
    * about the median reverse-engineer to a Normal(mean, stddev) range;
    * skewed columns keep a uniform range but embed the observed quartiles
    * as a comment so the spec records the shape it could not name. */
  def scriptDataGeneratorFromData(df: DataFrame, name: String = "synthetic"): String = {
    val summary = summarizeToDF(df).collect()
    def measure(m: String): Row = summary.find(_.getString(0) == m).get
    val mins = measure("min"); val maxs = measure("max"); val distincts = measure("distinct_count")
    val means = measure("mean"); val stddevs = measure("stddev")
    val p25s = measure("p25"); val p50s = measure("p50"); val p75s = measure("p75")
    def num(r: Row, i: Int): Option[Double] =
      Option(r.getString(i)).flatMap(s => scala.util.Try(s.toDouble).toOption)
    val sb = new StringBuilder
    sb.append(s"""DataGenerator(spark, "$name", rows = ${df.count()}L)\n""")
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val strat = f.dataType match {
        case t if isNumeric(t) && mins.get(i + 1) != null =>
          val range = s"${mins.getString(i + 1)}, ${maxs.getString(i + 1)}"
          (num(p25s, i + 1), num(p50s, i + 1), num(p75s, i + 1),
            num(means, i + 1), num(stddevs, i + 1)) match {
            case (Some(q1), Some(q2), Some(q3), Some(mu), Some(sd)) if q3 > q1 =>
              val upper = q3 - q2
              val lower = q2 - q1
              val span = for {
                lo <- num(mins, i + 1); hi <- num(maxs, i + 1) if hi > lo
              } yield (q3 - q1) / (hi - lo)
              val symmetric = math.min(upper, lower) >= 0.75 * math.max(upper, lower)
              // Symmetric + narrow IQR reads as a central distribution
              // (normal IQR ~ 0.22 of a +-3sigma range); symmetric + wide
              // IQR (~0.5 of range) is uniform — the default Range already.
              if (symmetric && span.exists(_ < 0.4))
                f"ColumnStrategy.Range($range, distribution = Distribution.Normal($mu%.6f, $sd%.6f))"
              else if (symmetric)
                s"ColumnStrategy.Range($range)"
              else
                f"ColumnStrategy.Range($range) /* skewed: p25=$q1%.6f p50=$q2%.6f p75=$q3%.6f */"
            case _ => s"ColumnStrategy.Range($range)"
          }
        case StringType if distincts.get(i + 1) != null && distincts.getString(i + 1).toLong <= 20 =>
          // Low-cardinality string: enumerate as a values column.
          "ColumnStrategy.Values(Seq(/* observed values */))"
        case t => defaultStrategyFor(t)
      }
      sb.append(s"""  .withColumn("${f.name}", "${f.dataType.sql.toLowerCase}", $strat)\n""")
    }
    sb.append("  .build()\n")
    sb.toString
  }

  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  private def defaultStrategyFor(t: DataType): String = t match {
    case ByteType | ShortType | IntegerType | LongType => "ColumnStrategy.Range(0, 1000)"
    case FloatType | DoubleType | _: DecimalType => "ColumnStrategy.Range(0, 1000, continuous = true)"
    case BooleanType => """ColumnStrategy.Values(Seq(true, false))"""
    case DateType =>
      """ColumnStrategy.DateRange(java.time.LocalDate.parse("2024-01-01"), java.time.LocalDate.parse("2024-12-31"))"""
    case TimestampType =>
      """ColumnStrategy.Timestamp(java.time.Instant.parse("2024-01-01T00:00:00Z"), java.time.Instant.parse("2024-12-31T23:59:59Z"))"""
    case _ => """ColumnStrategy.Pattern("{alpha:8}")"""
  }
}
