package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session tuning shared by every graft entry point (Bench,
  * Verify, the Drive* tools) and recommended to library users building
  * their own session (r19 — VERDICT r18 #3 asked for these to live in
  * library code rather than only in the bench harness).
  *
  * Everything here is a DEFAULT: `.config(...)` calls made on the builder
  * after [[tune]] override it, and each entry can be disabled with the
  * system property named in its comment. None of these change what any
  * query computes.
  */
object SessionTuning {

  /** `-Dgraft.bareLocalFs=off` restores Hadoop's stock checksummed
    * LocalFileSystem (A/B hatch; see [[graft.io.BareLocalFs]]). */
  def bareLocalFsEnabled: Boolean =
    !sys.props.get("graft.bareLocalFs").contains("off")

  /** Engine-recommended configs, as data (testable). */
  def configs: Seq[(String, String)] = {
    val base = Seq(
      // 128-aggregate minhash signatures exceed the default codegen field
      // cap (100) and would silently fall back to interpreted aggregation.
      "spark.sql.codegen.maxFields" -> "400",
      // The JIT refuses methods over ~8000 bytecodes
      // (DontCompileHugeMethods), but Spark's default hugeMethodLimit
      // (65535) still hands such stages to whole-stage codegen — which
      // then runs as INTERPRETED bytecode. Capping at the JIT limit falls
      // back to per-operator codegen for oversized stages: measured 24x on
      // the 50M-row IOT build (79s -> 3.3s, r12).
      "spark.sql.codegen.hugeMethodLimit" -> "8000",
      // The generated-class cache defaults to 100 entries; 100+-query
      // sessions cycle it and recompile identical classes (~10s of extra
      // Janino+JIT per wide-aggregate recompile, r14). Static conf — must
      // be set before the first session builds.
      "spark.sql.codegen.cache.maxEntries" -> "5000",
      // Every action eagerly builds a full plan-description string for the
      // SQL listener event (and AQE rebuilds it per stage update) even
      // with the UI off — for multi-action index/retrieval lifecycles
      // (50-90 jobs over wide join plans) that stringification was 15-20%
      // of wall (r18: q_text_bm25 6.40 -> 5.18 s same-binary A/B). 8 KB
      // keeps events readable while bounding the cost; plan ANALYSIS is
      // unaffected (SQLConf.maxPlanStringLength truncates only the
      // rendered string). Promoted from the bench session to the engine
      // default in r19 (VERDICT r18 #3).
      "spark.sql.maxPlanStringLength" -> "8192")
    val fs =
      if (bareLocalFsEnabled)
        Seq(
          // file:// without per-file permission syscalls or .crc sidecars —
          // the fixed cost of every tiny local parquet write
          // (see [[graft.io.BareLocalFs]]; hdfs/s3a paths untouched).
          "spark.hadoop.fs.file.impl" -> classOf[graft.io.BareLocalFs].getName,
          // The FileContext twin: Structured Streaming's checkpoint/state
          // writes resolve file:// through fs.AbstractFileSystem.file.impl
          // and were forking chmod/readlink per checkpoint file — 2.7-4.7 s
          // of other-process CPU inside a ~3 s streaming query (r19;
          // q_dedup_stream 3.10 -> 1.65 s with zero forks after this).
          "spark.hadoop.fs.AbstractFileSystem.file.impl" ->
            classOf[graft.io.BareLocalAbstractFs].getName)
      else Nil
    base ++ fs
  }

  /** Apply [[configs]] to a session builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    configs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
