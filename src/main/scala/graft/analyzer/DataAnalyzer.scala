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
    Seq("count", "null_count", "distinct_count", "min", "max", "mean", "stddev")

  /** measure x column summary: first column `measure`, one STRING column per
    * source column. `exact` uses count(distinct); the default approximates
    * (approx_count_distinct) which is the right call at scale. mean/stddev
    * (describe()-style, ref data_analyzer.py:149-175) apply to numeric
    * columns only (null elsewhere) and render with fixed 6-decimal
    * formatting so the summary string is engine-portable rather than
    * hostage to shortest-round-trip float printing. Still ONE aggregation
    * pass for all measures. */
  def summarizeToDF(df: DataFrame, exact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields.toSeq
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      def numericSafe(agg: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (isNumeric(f.dataType)) format_string("%.6f", agg) else lit(null).cast(StringType)
      Seq(
        count(c).as(s"${f.name}__count"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__null_count"),
        (if (exact) countDistinct(c) else approx_count_distinct(c)).as(s"${f.name}__distinct_count"),
        minMaxSafe(f, min(c)).as(s"${f.name}__min"),
        minMaxSafe(f, max(c)).as(s"${f.name}__max"),
        numericSafe(avg(c)).as(s"${f.name}__mean"),
        numericSafe(stddev(c)).as(s"${f.name}__stddev"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect().head

    val out = Measures.zipWithIndex.map { case (m, mi) =>
      Row.fromSeq(m +: cols.indices.map { ci =>
        val v = row.get(ci * Measures.length + mi)
        if (v == null) null else String.valueOf(v)
      })
    }
    val schema = StructType(StructField("measure", StringType, nullable = false) +:
      cols.map(f => StructField(f.name, StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }

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

  /** Emit generator code parameterized by observed data ranges (reference
    * `scriptDataGeneratorFromData` — data_analyzer.py:500). */
  def scriptDataGeneratorFromData(df: DataFrame, name: String = "synthetic"): String = {
    val summary = summarizeToDF(df).collect()
    def measure(m: String): Row = summary.find(_.getString(0) == m).get
    val mins = measure("min"); val maxs = measure("max"); val distincts = measure("distinct_count")
    val sb = new StringBuilder
    sb.append(s"""DataGenerator(spark, "$name", rows = ${df.count()}L)\n""")
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val strat = f.dataType match {
        case t if isNumeric(t) && mins.get(i + 1) != null =>
          s"ColumnStrategy.Range(${mins.getString(i + 1)}, ${maxs.getString(i + 1)})"
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
