package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.queries.{GenQueries, LlmQueries, TableQueries}

/** Regenerates `graft/queries/GeneratedOracles.scala`: runs every query
  * that has no handwritten DuckDB oracle on sf0.01, captures its (fully
  * deterministic) result, and pins it as a `SELECT ... FROM (VALUES ...)`
  * constant oracle. Run: `sbt "runMain graft.tools.OracleGen"`. */
object OracleGen {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      // 128-aggregate minhash signatures exceed the default codegen
      // field cap (100) and would silently fall back to interpreted agg.
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val handwritten = TableQueries.oracles.keySet ++ LlmQueries.oracles.keySet ++
      graft.queries.SpecOracles.map.keySet
    val targets = (GenQueries.all ++ LlmQueries.queries ++ TableQueries.queries ++
        graft.queries.ApiQueries.queries)
      .filterNot { case (name, _) => handwritten.contains(name) }

    val entries = targets.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        Some(name -> constantSql(df))
      } catch {
        case e: Throwable =>
          System.err.println(s"[oraclegen] $name FAILED: ${e.getMessage}")
          None
      }
    }

    val body = entries.map { case (k, v) =>
      s"""    "$k" ->\n      \"\"\"${v.replace("\"\"\"", "\\\"\\\"\\\"")}\"\"\""""
    }.mkString(",\n")

    val file =
      s"""package graft.queries
         |
         |/** Pinned-constant fallback oracles — the safety net for any query that
         |  * ships without a handwritten genuine/spec-derived oracle. EMPTY as of
         |  * round 9: every query has a genuine DuckDB replay (LlmQueries/
         |  * TableQueries.oracles) or a hand-derived spec oracle (SpecOracles);
         |  * an entry reappearing here means a new query was registered without
         |  * one and should be upgraded.
         |  *
         |  * REGENERATE with `sbt "runMain graft.tools.OracleGen"` after any change
         |  * to engine semantics — do not edit by hand. */
         |object GeneratedOracles {
         |  val map: Map[String, String] = Map(
         |$body)
         |}
         |""".stripMargin
    Files.write(Paths.get("src/main/scala/graft/queries/GeneratedOracles.scala"),
      file.getBytes("UTF-8"))
    println(s"[oraclegen] wrote ${entries.size} oracles " +
      s"(skipped ${targets.size - entries.size} failures)")
    spark.stop()
  }

  /** DuckDB SQL producing exactly this (small, deterministic) frame. */
  private def constantSql(df: DataFrame): String = {
    val rows = df.collect()
    require(rows.length <= 100, s"constant oracle too large: ${rows.length} rows")
    val schema = df.schema
    val cols = schema.fields.map(_.name)

    def literal(v: Any, dt: DataType): String = (v, dt) match {
      case (null, _) => "NULL"
      case (b: Boolean, _) => if (b) "TRUE" else "FALSE"
      case (n: Byte, _) => s"CAST($n AS BIGINT)"
      case (n: Short, _) => s"CAST($n AS BIGINT)"
      case (n: Int, _) => s"CAST($n AS BIGINT)"
      case (n: Long, _) => s"CAST($n AS BIGINT)"
      case (d: Double, _) => s"CAST(${fmtDouble(d)} AS DOUBLE)"
      case (f: Float, _) => s"CAST(${fmtDouble(f.toDouble)} AS DOUBLE)"
      case (d: java.math.BigDecimal, _) =>
        throw new IllegalArgumentException(
          s"decimal output $d in oracle query — cast to string in the query instead")
      case (s: String, _) => s"'${s.replace("'", "''").replace("\n", "' || chr(10) || '")}'"
      case (other, _) =>
        throw new IllegalArgumentException(
          s"unsupported oracle literal type ${other.getClass}: keep query outputs to " +
            "bigint/boolean/string")
    }

    // Integer-typed columns are emitted as BIGINT regardless of width so
    // the driver-side frames agree; queries should already cast.
    if (rows.length == 1) {
      val selects = cols.zipWithIndex.map { case (name, i) =>
        s"${literal(rows.head.get(i), schema.fields(i).dataType)} AS $name"
      }
      "SELECT " + selects.mkString(",\n  ")
    } else {
      val valueRows = rows.map { r =>
        "(" + cols.indices.map(i => literal(r.get(i), schema.fields(i).dataType)).mkString(", ") + ")"
      }
      val orderBy = cols.mkString(", ")
      s"SELECT * FROM (VALUES\n  ${valueRows.mkString(",\n  ")})\n  AS t(${cols.mkString(", ")})" +
        s"\nORDER BY $orderBy"
    }
  }

  private def fmtDouble(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) s"${d.toLong}.0"
    else String.valueOf(d)
}
