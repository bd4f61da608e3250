package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump one query's result to `outDir/name` as parquet. A failing query
    * must still land a result dir: a 1-row frame whose only column is
    * `err`. The downstream compare then records a loud schema/hash mismatch
    * for this key instead of silently shrinking the denominator (r9:
    * q_range_join vanished from the artifact entirely — 135 recorded vs 136
    * declared, no red row anywhere). */
  def dumpOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String, outDir: String): Unit = {
    try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      try {
        import spark.implicits._
        Seq(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
          .toDF("err").coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e2: Throwable =>
        System.err.println(s"[verify] $name err-marker write failed: ${e2.getMessage}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine-level tuning (codegen caps, plan-string bound, bare local FS)
    // shared with Bench and the library default (r19).
    val spark = SessionTuning.tune(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); Spark reads it as LONG
      // nanos under this flag (queries convert explicitly).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration escape hatch: SPARK_GRAFT_ONLY=q_a,q_b runs a subset.
    // The driver sets no such var, so its gate always runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      dumpOne(spark, name, fn, sfDir, outDir)
      // Dead localCheckpoint blocks from the dedup pipelines otherwise
      // accumulate across the 100+ dumps (same memory-pressure tax the
      // bench loop drops eagerly).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full declared-query roster, so the gate can assert recorded == declared
    // (a key absent from BOTH the parquet dumps and this list is impossible).
    Files.writeString(Paths.get(s"$outDir/declared.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
