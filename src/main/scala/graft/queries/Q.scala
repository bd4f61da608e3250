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

  /** Exact money arithmetic: dollars double -> integer cents. Values carry
    * two decimals, so round() lands on the same integer in Spark and
    * DuckDB regardless of FP representation. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** One-row result from named aggregate columns. */
  def one(df: DataFrame, aggs: (String, Column)*): DataFrame =
    df.agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)

  /** Long literal column (avoids Int literals surfacing as INTEGER). */
  def L(v: Long): Column = lit(v)
}
