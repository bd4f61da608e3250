package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing correctness queries.
  *
  * Conventions that keep the DuckDB hash-compare stable:
  *  - numeric outputs are BIGINT (doubles only when exactly reproducible);
  *    money sums go through `cents` (exact integer arithmetic both sides);
  *  - every multi-row result carries an ORDER BY on all output columns;
  *  - timestamps/dates are formatted to strings explicitly.
  */
object Q {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS); under the session's
    * `nanosAsLong` flag it arrives as LONG nanos — normalize `ts` back to
    * a real (microsecond) timestamp either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // Integer division: `/` on longs is DOUBLE division, and epoch nanos
      // (~1.7e18) exceed a double's 53-bit mantissa — the rounding shifts
      // timestamps by ±1 us.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Microsecond-precision string form of a timestamp — matches DuckDB's
    * `strftime(ts, '%Y-%m-%d %H:%M:%S.%f')`. */
  def tsFmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Exact money arithmetic: dollars double -> integer cents. Values carry
    * two decimals, so round() lands on the same integer in Spark and
    * DuckDB regardless of FP representation. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** One-row result from named aggregate columns. */
  def one(df: DataFrame, aggs: (String, Column)*): DataFrame =
    df.agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)

  /** Long literal column (avoids Int literals surfacing as INTEGER). */
  def L(v: Long): Column = lit(v)

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered.
    * Streaming queries allocate one state-store instance per shuffle
    * partition per stateful operator PER MICRO-BATCH; at the default 32
    * partitions a 4-batch two-operator stream pays 256 store commits to
    * process a handful of rows. Results are partitioning-independent —
    * this only right-sizes the state fan-out to the data. (A real
    * deployment sizes it to keyspace/throughput; these queries carry a
    * few planted keys.) */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
