package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Generator
import graft.spec.Constraint

/** Driver-facing queries over the TPC-H-ish test tables, each with a
  * genuine DuckDB oracle (the driver re-runs the SQL over the same parquet
  * and hash-compares). These cover the relational operator surface
  * (SURVEY.md §2.7/§2.8) and the row-level constraint operators (§2.6)
  * applied to real data via `Generator.applyConstraints`.
  */
object TableQueries {
  import Q._

  type Fn = (SparkSession, String) => DataFrame

  val queries: Map[String, Fn] = Map(
    // -------------------------------------------------- relational core
    "q_agg_groupby" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_filter_pushdown" -> ((s, d) =>
      one(table(s, d, "lineitem")
        .where(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01"
          && col("l_quantity") > 25),
        "n" -> count(lit(1)),
        "sum_price_c" -> sum(cents(col("l_extendedprice"))))),

    "q_join_broadcast" -> ((s, d) => {
      val orders = table(s, d, "orders")
      val cust = table(s, d, "customer")
      orders.join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_total_c"))
        .orderBy("c_mktsegment")
    }),

    // Salted skew-join: identical aggregates to the plain join (the oracle
    // IS the plain join), with the hot-key rows spread over 8 sub-keys.
    "q_join_salted" -> ((s, d) => {
      val li = table(s, d, "lineitem").select("l_orderkey", "l_quantity")
      val ord = table(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.operators.SkewJoin.saltedEquiJoin(li, ord, Seq("l_orderkey"), salt = 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("l_quantity"))).as("sum_qty_c"))
        .orderBy("o_orderstatus")
    }),

    "q_join_multi" -> ((s, d) => {
      val li = table(s, d, "lineitem")
      val orders = table(s, d, "orders")
      val cust = table(s, d, "customer")
      one(li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .where(col("c_mktsegment") === "BUILDING" && col("o_orderstatus") === "F"),
        "n" -> count(lit(1)),
        "sum_qty_c" -> sum(cents(col("l_quantity"))))
    }),

    "q_window_rank" -> ((s, d) => {
      val orders = table(s, d, "orders")
      val cust = table(s, d, "customer")
      val j = orders.join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      j.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk").cast("long").as("rnk"), col("o_orderkey"))
        .orderBy("c_mktsegment", "rnk")
    }),

    "q_union" -> ((s, d) =>
      one(table(s, d, "region").select(col("r_name").as("name"))
        .union(table(s, d, "nation").select(col("n_name").as("name"))),
        "n" -> count(lit(1)), "n_distinct" -> countDistinct(col("name")))),

    "q_semi_join" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val orders = table(s, d, "orders")
      one(cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi"),
        "n" -> count(lit(1)))
    }),

    "q_anti_join" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val orders = table(s, d, "orders")
      one(cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti"),
        "n" -> count(lit(1)))
    }),

    "q_distinct" -> ((s, d) =>
      one(table(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
        "n" -> count(lit(1)))),

    "q_limit_sort" -> ((s, d) =>
      table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(5)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_c"))
        .orderBy("o_orderkey")),

    "q_events_window" -> ((s, d) =>
      events(s, d).withColumn("__ts", col("ts"))
        .groupBy(window(col("__ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("n"), col("users"))
        .orderBy("hour_start")),

    "q_events_window_stream" -> ((s, d) => {
      // Streaming counterpart of q_events_window: file-stream the events
      // parquet, event-time window aggregation, complete mode into a
      // memory sink under Trigger.AvailableNow. The final table must
      // equal the batch computation, so the oracle is a plain DuckDB
      // recomputation. (countDistinct is unsupported under streaming, so
      // the aggregates here are count + exact integer cents.)
      val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$d/events.parquet"),
        dir.resolve("part-0.parquet"))
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val raw = s.readStream.schema(schema).parquet(dir.toString)
      val ts =
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else col("ts")
      // Reduce-side keys are hour windows (a handful); 8 state partitions
      // right-size the store without limiting the parallel file scan.
      val finished =
        try withShufflePartitions(s, 8) {
          val q = raw.withColumn("__ts", ts)
            .groupBy(window(col("__ts"), "1 hour"))
            .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
            .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
              col("n"), col("value_c"))
            .writeStream.format("memory").queryName("graft_events_window_stream")
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          // Stop a timed-out stream before failing: a live query would pin
          // the sink name (retries die on "already active") and keep
          // reading the about-to-be-deleted temp dir.
          try q.awaitTermination(60000)
          finally if (q.isActive) q.stop()
        } finally {
          // The copied source dir is only needed while the stream runs.
          try java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
          catch { case _: java.io.IOException => () }
        }
      require(finished,
        "events AvailableNow stream did not finish in 60s — refusing to read a partial sink")
      s.table("graft_events_window_stream").orderBy("hour_start")
    }),

    // ------------------------------------------- time-series ops (graft.ts)
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value").as("view_value"))
      graft.ts.TimeOps.asofJoin(purchases, views, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightCols = Seq("view_value"),
        rightTimeAs = Some("view_ts"))
        .select(col("event_id"), col("user_id"), tsFmt(col("ts")).as("ts"),
          tsFmt(col("view_ts")).as("view_ts"), col("view_value"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, d) => {
      // Forward direction: each signup gets the user's earliest purchase
      // at-or-after it (activation-latency style lookup).
      val ev = events(s, d)
      val signups = ev.where(col("event_type") === "signup")
        .select("event_id", "user_id", "ts")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      graft.ts.TimeOps.asofJoin(signups, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightCols = Seq("purchase_value"),
        rightTimeAs = Some("purchase_ts"), direction = "forward")
        .select(col("event_id"), col("user_id"), tsFmt(col("ts")).as("ts"),
          tsFmt(col("purchase_ts")).as("purchase_ts"), col("purchase_value"))
        .orderBy("event_id")
    }),

    "q_range_join" -> ((s, d) => {
      val ev = events(s, d)
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"),
          col("ts").as("err_start"),
          (col("ts") + expr("INTERVAL 4 HOURS")).as("err_end"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.ts.TimeOps.rangeJoinPoint(errors, clicks, Seq("user_id"),
        startCol = "err_start", endCol = "err_end", pointTime = "click_ts",
        binSeconds = 4 * 3600)
        .select(col("err_id"), col("click_id"), col("user_id"),
          tsFmt(col("click_ts")).as("click_ts"), col("click_value"))
        .orderBy("err_id", "click_id")
    }),

    "q_sessionize" -> ((s, d) =>
      graft.ts.TimeOps.sessions(
        events(s, d).select("user_id", "ts", "value"),
        Seq("user_id"), "ts", expr("INTERVAL 30 MINUTES"),
        extraAggs = Seq(sum(cents(col("value"))).as("value_c")))
        .select(col("user_id"), col("session_seq"),
          tsFmt(col("session_start")).as("session_start"),
          tsFmt(col("session_end")).as("session_end"),
          col("n_events"), col("value_c"))
        .orderBy("user_id", "session_seq")),

    "q_scalar_funcs" -> ((s, d) =>
      one(table(s, d, "part"),
        "n_brand_fmt" -> sum(when(
          format_string("%s#%05d", col("p_brand"), col("p_size")) ===
            concat(col("p_brand"), lit("#"), lpad(col("p_size").cast("string"), 5, "0")),
          1L).otherwise(0L)),
        "n_sub" -> countDistinct(substring(col("p_type"), 1, 6)),
        "max_len" -> max(length(col("p_name"))).cast("long"))),

    // -------------------------------------------------- constraints (§2.6)
    "q_constraint_sqlexpr" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem"),
        Seq(Constraint.SqlExpr("l_quantity > 30"))), "n" -> count(lit(1)))),

    "q_constraint_chained" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem"),
        Seq(Constraint.ChainedRelation(Seq("l_discount", "l_tax"), "<"))),
        "n" -> count(lit(1)))),

    "q_constraint_literal_range" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem"),
        Seq(Constraint.LiteralRange(Seq("l_quantity"), 10, 20))), "n" -> count(lit(1)))),

    "q_constraint_literal_relation" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem"),
        Seq(Constraint.LiteralRelation(Seq("l_returnflag"), "==", "R"))), "n" -> count(lit(1)))),

    "q_constraint_ranged_values" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem"),
        Seq(Constraint.RangedValues(Seq("l_discount"), "l_tax", "l_quantity"))),
        "n" -> count(lit(1)))),

    "q_constraint_positive" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "customer"),
        Seq(Constraint.PositiveValues(Seq("c_acctbal"), strict = true))), "n" -> count(lit(1)))),

    "q_constraint_negative" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "customer"),
        Seq(Constraint.NegativeValues(Seq("c_acctbal")))), "n" -> count(lit(1)))),

    "q_constraint_unique_combos" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem").select("l_orderkey"),
        Seq(Constraint.UniqueCombinations(Seq("l_orderkey")))), "n" -> count(lit(1)))),

    "q_constraint_combined" -> ((s, d) =>
      one(Generator.applyConstraints(table(s, d, "lineitem"),
        Seq(Constraint.SqlExpr("l_quantity >= 10"),
          Constraint.LiteralRelation(Seq("l_linestatus"), "==", "F"),
          Constraint.PositiveValues(Seq("l_extendedprice"), strict = true))),
        "n" -> count(lit(1)))),

    // -------------------------------------------------- analyzer (§2.7)
    "q_analyzer_summary" -> ((s, d) => {
      val df = table(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag")
      graft.analyzer.DataAnalyzer.summarizeToDF(df, exact = true)
        .where(col("measure").isin("count", "null_count", "distinct_count",
          "mean", "stddev", "p25", "p50", "p75"))
        .orderBy("measure")
    }))

  /** DuckDB equivalents (tables registered by file basename). */
  val oracles: Map[String, String] = Map(
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_filter_pushdown" ->
      """SELECT count(*) AS n,
        |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_quantity > 25""".stripMargin,

    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n,
        |CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_multi" ->
      """SELECT count(*) AS n,
        |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'F'""".stripMargin,

    // The salted join's oracle is the PLAIN join — salting must be
    // row-for-row invisible in the result.
    "q_join_salted" ->
      """SELECT o_orderstatus, count(*) AS n,
        |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_window_rank" ->
      """SELECT c_mktsegment, rnk, o_orderkey FROM (
        |  SELECT c_mktsegment, o_orderkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "q_union" ->
      """SELECT count(*) AS n, count(DISTINCT name) AS n_distinct FROM (
        |  SELECT r_name AS name FROM region UNION ALL SELECT n_name FROM nation)""".stripMargin,

    "q_semi_join" ->
      "SELECT count(*) AS n FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",

    "q_anti_join" ->
      "SELECT count(*) AS n FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",

    "q_distinct" ->
      "SELECT count(*) AS n FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)",

    "q_limit_sort" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_c FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5) ORDER BY o_orderkey""".stripMargin,

    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |count(*) AS n, count(DISTINCT user_id) AS users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_window_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |count(*) AS n,
        |CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_join" ->
      """SELECT p.event_id, p.user_id,
        |strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        |v.view_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, value AS view_value FROM events WHERE event_type = 'view') v
        |ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_asof_forward" ->
      """SELECT p.event_id, p.user_id,
        |strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |v.purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') p
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, value AS purchase_value FROM events
        |   WHERE event_type = 'purchase') v
        |ON p.user_id = v.user_id AND p.ts <= v.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_range_join" ->
      """SELECT e.event_id AS err_id, c.event_id AS click_id, e.user_id,
        |strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |ON e.user_id = c.user_id
        | AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 4 HOUR
        |ORDER BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS opens
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT *, sum(opens) OVER
        |    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM marked)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT CAST(sum(CASE WHEN printf('%s#%05d', p_brand, p_size) =
        |  concat(p_brand, '#', lpad(CAST(p_size AS VARCHAR), 5, '0')) THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_brand_fmt,
        |count(DISTINCT substring(p_type, 1, 6)) AS n_sub,
        |CAST(max(length(p_name)) AS BIGINT) AS max_len FROM part""".stripMargin,

    "q_constraint_sqlexpr" -> "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 30",
    "q_constraint_chained" -> "SELECT count(*) AS n FROM lineitem WHERE l_discount < l_tax",
    "q_constraint_literal_range" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity BETWEEN 10 AND 20",
    "q_constraint_literal_relation" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_returnflag = 'R'",
    "q_constraint_ranged_values" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_discount BETWEEN l_tax AND l_quantity",
    "q_constraint_positive" ->
      "SELECT count(*) AS n FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal > 0",
    "q_constraint_negative" ->
      "SELECT count(*) AS n FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal <= 0",
    "q_constraint_unique_combos" ->
      "SELECT count(DISTINCT l_orderkey) AS n FROM lineitem",
    "q_constraint_combined" ->
      """SELECT count(*) AS n FROM lineitem WHERE l_quantity >= 10 AND l_linestatus = 'F'
        |AND l_extendedprice IS NOT NULL AND l_extendedprice > 0""".stripMargin,

    "q_analyzer_summary" ->
      """SELECT * FROM (
        |  SELECT 'count' AS measure, CAST(count(l_orderkey) AS VARCHAR) AS l_orderkey,
        |    CAST(count(l_linenumber) AS VARCHAR) AS l_linenumber,
        |    CAST(count(l_returnflag) AS VARCHAR) AS l_returnflag FROM lineitem
        |  UNION ALL
        |  SELECT 'distinct_count', CAST(count(DISTINCT l_orderkey) AS VARCHAR),
        |    CAST(count(DISTINCT l_linenumber) AS VARCHAR),
        |    CAST(count(DISTINCT l_returnflag) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'null_count',
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
        |    CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
        |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'mean', printf('%.6f', avg(l_orderkey)),
        |    printf('%.6f', avg(l_linenumber)), CAST(NULL AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'stddev', printf('%.6f', stddev(l_orderkey)),
        |    printf('%.6f', stddev(l_linenumber)), CAST(NULL AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'p25', printf('%.6f', quantile_cont(l_orderkey, 0.25)),
        |    printf('%.6f', quantile_cont(l_linenumber, 0.25)), CAST(NULL AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'p50', printf('%.6f', quantile_cont(l_orderkey, 0.50)),
        |    printf('%.6f', quantile_cont(l_linenumber, 0.50)), CAST(NULL AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'p75', printf('%.6f', quantile_cont(l_orderkey, 0.75)),
        |    printf('%.6f', quantile_cont(l_linenumber, 0.75)), CAST(NULL AS VARCHAR) FROM lineitem
        |  ) ORDER BY measure""".stripMargin)
}
