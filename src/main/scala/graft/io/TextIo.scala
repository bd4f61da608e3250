package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) interchange for document corpora — the
  * wire format training-data pipelines actually exchange (`.jsonl.gz`
  * shards of crawl dumps, eval sets, filtered corpora). Thin by design
  * over Spark's native json source, with the contracts that matter at
  * scale made explicit:
  *
  *  - **Schema is pinned, never inferred, on read.** Inference is a full
  *    extra pass over 100 TB and silently widens/narrows types per shard;
  *    the reader takes an explicit `StructType` (or a sample-bounded
  *    inference escape hatch for exploration).
  *  - **Compression is splittable-aware.** Compressed shards (gzip,
  *    zstd — neither codec is splittable in Spark's text/json source)
  *    are whole-file reads, one task per shard, so shard count IS read
  *    parallelism — the `partitions` knob. Only uncompressed (and
  *    bzip2) text splits by byte range.
  *  - **Lossless roundtrip** for the supported column types (longs,
  *    strings incl. full Unicode, booleans, doubles, arrays, structs,
  *    nulls) — pinned by the gate query's field-for-field replay.
  *
  * Timestamps serialize as ISO-8601 strings (Spark's json default);
  * binary columns are base64 — both documented Spark behaviors, not
  * engine inventions.
  */
object TextIo {

  /** Write a frame as JSONL shards. `partitions` bounds shard count (and
    * therefore shard size — keep gzip shards small enough that one task
    * per shard still parallelizes the read). */
  def writeJsonl(df: DataFrame, path: String, compression: String = "gzip",
      partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").option("compression", compression).json(path)
  }

  /** Read JSONL with a PINNED schema — the production path. Bad-record
    * handling is explicit, because Spark's PERMISSIVE default is a trap
    * with a pinned schema: a malformed line becomes an all-null row
    * indistinguishable from legitimate nulls UNLESS the schema carries
    * the `_corrupt_record` column. So: `failFast = true` aborts on the
    * first bad record (the ingest-gate behavior); `keepCorrupt = true`
    * appends a `_corrupt_record` string column holding each bad line
    * (filter `_corrupt_record IS NOT NULL` to quarantine); both false
    * means you have accepted silent null rows for bad data. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false, keepCorrupt: Boolean = false): DataFrame = {
    val full =
      if (keepCorrupt && !schema.fieldNames.contains("_corrupt_record"))
        schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
      else schema
    spark.read.schema(full)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)
  }

  /** Exploration-only reader: schema inferred from a bounded sample of
    * records (`samplingRatio` keeps the inference pass cheap), never the
    * full corpus. */
  def readJsonlInferred(spark: SparkSession, path: String,
      samplingRatio: Double = 0.1): DataFrame =
    spark.read.option("samplingRatio", samplingRatio).json(path)
}
