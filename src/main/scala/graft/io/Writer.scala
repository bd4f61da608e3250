package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.spec.OutputDataset

/** Output sink: batch `DataFrameWriter` or streaming `DataStreamWriter`
  * depending on whether a trigger is configured, mirroring the reference's
  * `saveAsDataset` auto-detection (dbldatagen/utils.py:371-405,
  * data_generator.py:1957-1976, config.py:13-38). Default format is parquet
  * (the reference defaults to delta, which is not present in a plain Spark
  * distribution).
  */
object Writer {

  /** Write a batch DataFrame per the output config. Partitioning gives
    * directory pruning; bucketing co-locates join keys at write time, so
    * two tables bucketed the same way equi-join with ZERO Exchange — the
    * write-once-shuffle-never layout for a fact table joined every day.
    * Bucketed output requires the catalog (`tableName`): Spark's bucket
    * metadata lives in the table definition, not in the files. */
  def writeBatch(df: DataFrame, out: OutputDataset): Unit = {
    // Consistency gate BEFORE the dispatch: buckets>0 with no bucketBy
    // columns must fail on EVERY branch — previously the catalog branch
    // matched first and silently wrote an unbucketed table.
    require(out.buckets == 0 || out.bucketBy.nonEmpty,
      s"buckets=${out.buckets} without bucketBy columns — set bucketBy (and tableName) too")
    val base = df.write.format(out.format).mode(out.outputMode).options(out.options)
    val parted =
      if (out.partitionBy.nonEmpty) base.partitionBy(out.partitionBy: _*) else base
    (out.bucketBy, out.tableName) match {
      case (cols, Some(t)) if cols.nonEmpty =>
        require(out.buckets >= 1,
          s"bucketBy(${cols.mkString(",")}) needs buckets >= 1, got ${out.buckets}")
        parted.bucketBy(out.buckets, cols.head, cols.tail: _*)
          .sortBy(cols.head, cols.tail: _*)
          .option("path", out.location)
          .saveAsTable(t)
      case (cols, None) if cols.nonEmpty =>
        throw graft.spec.SpecError(
          "bucketBy requires tableName: Spark stores bucket metadata in the catalog, " +
            "path-only writes silently lose it")
      case (_, Some(t)) =>
        // Unbucketed but catalog-registered: the config named a table, so
        // silently degrading to a path-only write would strand downstream
        // `spark.table(name)` readers.
        parted.option("path", out.location).saveAsTable(t)
      case _ =>
        parted.save(out.location)
    }
  }

  /** Start a streaming write; caller owns the returned query lifecycle.
    * `triggerProcessingTime` examples: "5 seconds"; "available-now" runs one
    * catch-up pass and stops (the reference's trigger-once analog). */
  def writeStream(df: DataFrame, out: OutputDataset): StreamingQuery = {
    val base = df.writeStream.format(out.format)
      .outputMode(if (out.outputMode == "overwrite") "append" else out.outputMode)
      .options(out.options)
    val triggered = out.triggerProcessingTime match {
      case Some("available-now") | Some("availableNow") => base.trigger(Trigger.AvailableNow())
      case Some("once") => base.trigger(Trigger.AvailableNow())
      case Some(interval) => base.trigger(Trigger.ProcessingTime(interval))
      case None => base
    }
    triggered.start(out.location)
  }

  /** Reference-style entry point: streaming iff the frame is streaming. */
  def saveAsDataset(df: DataFrame, out: OutputDataset): Option[StreamingQuery] =
    if (df.isStreaming) Some(writeStream(df, out))
    else { writeBatch(df, out); None }
}
