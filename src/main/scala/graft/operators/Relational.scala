package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Host-engine relational surface (SURVEY.md §2.2, §2.4-2.8).
  *
  * The reference (lithium-tech/duckdb-graphar) delegates all general
  * relational processing — joins, aggregation, windows, sorts, set ops,
  * scalar functions — to the host DuckDB engine (SURVEY.md §2, "It
  * implements no joins, aggregations ... of its own"). Our engine
  * delegates the same surface to Spark SQL / Catalyst. These queries
  * pin that surface against the DuckDB oracle.
  *
  * Oracle-parity rules used throughout:
  *  - every computed column aliased identically in Spark and SQL;
  *  - double SUMs rounded to the true decimal precision of the data
  *    (cent-valued money → 2) so fp accumulation order can't flip a bit;
  *  - window running sums are order-defined, so identical bit-for-bit;
  *  - event timestamps truncated to seconds (parquet ns vs Spark µs).
  */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style scan + hash aggregate. Map-side partial agg + final:
    // the canonical 100TB-friendly shape (shuffle carries 6 groups).
    "q1_agg" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1995-12-31"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // Star join: dims broadcast (no shuffle of the fact side beyond the
    // final 25-group aggregate) — at 100TB the fact table never shuffles.
    "q2_join" -> { (s, d) =>
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
    },

    // Top-k over an aggregate; rank materialized so the result is
    // order-independent. Global window runs on the already-aggregated
    // (small) side, never on the fact table.
    "q3_topk" -> { (s, d) =>
      val rev = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
      rev
        .withColumn("rank",
          row_number().over(Window.orderBy(col("revenue").desc, col("o_custkey"))))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("o_custkey"), col("revenue"))
    },

    // Window functions: per-key ordered frame, running sum (order-defined
    // accumulation → bit-identical across engines).
    "q4_window" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_sum",
          round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("run_sum"))
    },

    // Set operations (distinct semantics, like SQL INTERSECT/EXCEPT).
    "q5_setops" -> { (s, d) =>
      val p = t(s, d, "part")
      val big = p.filter(col("p_size") >= 25).select(col("p_brand"))
      val cheap = p.filter(col("p_retailprice") < lit(1200.0)).select(col("p_brand"))
      big.intersect(cheap).unionAll(big.except(cheap).withColumn("p_brand", concat(col("p_brand"), lit("#only_big")))).select(col("p_brand"))
    },

    // Selective filter + narrow projection: both must reach the parquet
    // scan (PushedFilters / ReadSchema) — checked in PlanSpec.
    "q6_filter" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1995-02-01") && col("l_discount") > lit(0.07))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    },

    // Distinct aggregation (expands to two-phase distinct agg in Spark).
    "q7_distinct" -> { (s, d) =>
      t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // ROLLUP grouping sets.
    "q8_rollup" -> { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
    },

    // Arbitrary GROUPING SETS (beyond rollup/cube's fixed lattices):
    // (rf, ls) detail + rf subtotal + grand total, one shuffle — Spark
    // expands the sets map-side and partial-aggregates before exchange.
    "q23_grouping_sets" -> { (s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
    },

    // Semi/anti joins (EXISTS / NOT EXISTS): customers with no orders +
    // count of customers with orders. Anti side stays distributed.
    "q9_semi_anti" -> { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").select(col("o_custkey"))
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("status"))
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("status"))
      without.unionAll(withO)
    },

    // Scalar function library parity: string/date/math built-ins.
    "q10_scalar" -> { (s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          // *1.5 is an exact fp op → bit-identical in both engines, no
          // rounding needed (×1.1 would land on .xx5 print boundaries).
          (col("p_retailprice") * 1.5).as("marked_up"),
          abs(col("p_size") - 25).as("size_dev"),
          pmod(col("p_partkey"), lit(7)).as("bucket"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
    },

    // Tumbling-window aggregation over the events table — the batch
    // equivalent of the Structured Streaming pipeline in
    // graft.streaming (same window(), same agg).
    "q11_events_window" -> { (s, d) =>
      t(s, d, "events")
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    },

    // Recursive CTE (Spark 4 WITH RECURSIVE): bounded BFS depths over
    // the lineitem-derived edge relation — the ONE relational construct
    // the reference's host engine has that Spark only recently gained;
    // the oracle is the IDENTICAL statement on DuckDB. Spark's
    // recursion supports UNION ALL only (path enumeration, bounded by
    // the depth guard); the min-depth aggregate on top restores BFS
    // semantics.
    "q30_recursive" -> { (s, d) =>
      t(s, d, "lineitem").createOrReplaceTempView("li_rec")
      s.sql(
        s"""WITH RECURSIVE r(v, depth) AS (
           |  SELECT CAST(42 AS BIGINT) AS v, CAST(0 AS BIGINT) AS depth
           |  UNION ALL
           |  SELECT l_partkey % 4096 AS v, r.depth + 1 AS depth
           |  FROM r JOIN li_rec ON l_orderkey % 4096 = r.v
           |  WHERE r.depth < 3)
           |SELECT v, CAST(min(depth) AS BIGINT) AS depth
           |FROM r GROUP BY v""".stripMargin)
    },

    // Sliding INTERVAL range frame (RANGE BETWEEN INTERVAL ... PRECEDING):
    // per-user trailing-hour activity at every event. The summed value is
    // integerized to cents first so the frame aggregate is exact integer
    // math on both engines (a double frame-sum would be fp-order-bound).
    "q29_interval_window" -> { (s, d) =>
      t(s, d, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .selectExpr(
          "event_id", "user_id",
          """count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS n_trailing_hour""",
          """sum(cents) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS cents_trailing_hour""")
    },

    // Full window-function family: rank/dense_rank/lag/lead/ntile.
    "q15_window_funcs" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .filter(col("rnk") <= 5)
        .select(col("o_orderpriority"), col("o_orderkey"), col("rnk"),
          col("drnk"), col("prev_price"), col("next_key"), col("quartile"))
    },

    // CUBE grouping sets (beyond q8's ROLLUP).
    "q16_cube" -> { (s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
    },

    // Exact interpolated percentiles per group.
    "q17_percentile" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("median_price"),
          expr("percentile(o_totalprice, 0.9)").as("p90_price"),
          count(lit(1)).as("n"))
    },

    // JSON scalar functions over the events.props payload column.
    "q13_json" -> { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
    },

    // Date/time scalar functions over orders.
    "q14_date" -> { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          // DuckDB's quarter-trunc yields DATE; align types
          date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
          datediff(lit("1998-12-31"), col("o_orderdate")).as("days_to_eoy"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"))
    },

    // Bucketed co-located join: both sides written bucketed+sorted on the
    // join key, so the join plans with ZERO exchanges — the 100TB pattern
    // for repeated fact-to-fact joins. (Bucketed copies are materialized
    // once per sf dir; results oracle-checked against a plain join.)
    "q19_bucketed_join" -> { (s, d) =>
      val (li, o) = Bucketed.tables(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("total_qty"))
    },

    // Pivot: event-type counts as columns per user bucket (Spark's
    // pivot() with an explicit value list → deterministic schema).
    "q18_pivot" -> { (s, d) =>
      t(s, d, "events")
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // unpivot/melt: wide metric columns → long (key, metric, value) rows
    "q20_unpivot" -> { (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 50)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
    },

    // Gap-based sessionization (30 min), expressed with window functions;
    // the streaming twin uses flatMapGroupsWithState. Second-truncated
    // timestamps for ns-vs-µs oracle parity.
    "q12_sessionize" -> { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("tss"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tss"), col("event_id"))
      ev.withColumn("prev", lag(col("tss"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            col("tss").cast("long") - col("prev").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tss")).as("start_ts"),
          max(col("tss")).as("end_ts"),
          round(sum(col("value")), 2).as("session_value"))
    },

    // Dataset profiling (dataset-card / SUMMARIZE-style stats):
    // count, null count, exact distinct count, and extrema per column,
    // unpivoted to one row per column.
    "q24_profile" -> { (s, d) =>
      profile(t(s, d, "lineitem"),
        numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey"),
        strCols = Seq("l_returnflag", "l_linestatus"))
    },

    // Ordered funnel (view → click → purchase): per user the earliest
    // view, the earliest click strictly after it, the earliest purchase
    // strictly after that; output = users surviving each stage. Each
    // stage scans events filtered to ONE event type (pushdown-prunable)
    // and shuffles only (user_id, ts); the stage-to-stage joins run on
    // the already-aggregated per-user tables, which are orders smaller
    // than the event log. Second-truncated for ns-vs-µs oracle parity.
    "q25_funnel" -> { (s, d) =>
      val e = t(s, d, "events").select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tss"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tss")).as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("tss") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("tss")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("tss") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("tss")).as("t3"))
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stage("1_view", s1)
        .unionAll(stage("2_click", s2))
        .unionAll(stage("3_purchase", s3))
    },

    // Correlated subqueries — the ONE relational surface not yet
    // exercised: a correlated scalar subquery (per-customer average,
    // phrased as sum/count in DECIMAL so both engines compare exactly —
    // fp `avg` summation order is engine-dependent) plus a correlated
    // EXISTS. Same SQL text runs on both engines; Catalyst decorrelates
    // both subqueries into aggregate+join (no per-row re-execution), so
    // at 100 TB this plans as two shuffles on o_custkey, not O(n) probes.
    "q27_correlated" -> { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(CorrelatedSql)
    },

    // First-order Markov transition matrix over per-user event streams:
    // P(next event type | current event type). One shuffle keys the log
    // by user for the lag window (the same shuffle sessionization pays);
    // the pair count groupBy is map-side combinable down to
    // |types|² rows, and the row-probability denominator comes from a
    // window over that tiny matrix — no second pass over the log. The
    // probability is one exact BIGINT/BIGINT division, cross-engine
    // stable. At 100 TB this is the canonical "user-journey model" scan:
    // nothing but (user_id, ts, type) ever shuffles.
    "q28_markov" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tss"), col("event_id"))
      val trans = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("tss"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      trans.withColumn("p",
          col("n") * lit(1.0) /
            sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n"), col("p"))
    },

    // Cohort retention: users grouped by first-activity week, counted in
    // each later week they return. Two aggregates over (user, week)
    // pairs — the event log collapses to per-user-week rows first (the
    // only full-data shuffle), cohorts join on the tiny per-user table.
    "q26_retention" -> { (s, d) =>
      val e = t(s, d, "events").select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      val uw = e.distinct()
      val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, "user_id")
        .withColumn("weeks_later",
          floor(datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
        .groupBy(col("cohort_wk"), col("weeks_later"))
        .agg(count(lit(1)).as("n_users"))
    }
  )

  /** One-pass column profile: a single aggregate computes n / nulls /
    * exact distincts / extrema for every requested column, then explode
    * unpivots the 1-row result to a row per column — the table is
    * scanned ONCE regardless of column count. (The multi-distinct agg
    * plans through Expand — rows ×(columns+1) pre-shuffle, still one
    * scan; swap countDistinct for approx_count_distinct at 100 TB if
    * exactness isn't needed.) Numeric extrema surface as doubles,
    * string extrema as strings, each null for the other family.
    */
  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n")) ++
      (numCols ++ strCols).flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))
      }
    val a = df.agg(aggs.head, aggs.tail: _*)
    def base(c: String) = Seq(
      lit(c).as("col_name"), col("n"),
      col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"))
    val rows =
      numCols.map { c =>
        struct(base(c) ++ Seq(
          col(s"min_$c").cast("double").as("min_num"),
          col(s"max_$c").cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str")): _*)
      } ++ strCols.map { c =>
        struct(base(c) ++ Seq(
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"min_$c").as("min_str"),
          col(s"max_$c").as("max_str")): _*)
      }
    a.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** One SQL text, two engines: an above-per-customer-average filter
    * (correlated scalar subqueries, exact decimal arithmetic) with a
    * correlated EXISTS gate on the customer having an urgent order.
    */
  val CorrelatedSql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders o2
      |     WHERE o2.o_custkey = o.o_custkey)
      |  > (SELECT CAST(sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
      |        AS DECIMAL(38,2))
      |     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      |  AND EXISTS (SELECT 1 FROM orders o4
      |    WHERE o4.o_custkey = o.o_custkey
      |      AND o4.o_orderpriority = '1-URGENT')""".stripMargin

  def oracle: Map[String, String] = Map(
    "q27_correlated" -> CorrelatedSql,
    "q24_profile" -> {
      val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val aggs = (numCols ++ strCols).map { c =>
        s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
           |    count(DISTINCT $c) AS nd_$c, min($c) AS min_$c, max($c) AS max_$c""".stripMargin
      }.mkString(",\n    ")
      val rows = numCols.map { c =>
        s"""SELECT '$c' AS col_name, n, nn_$c AS n_null, nd_$c AS n_distinct,
           |  CAST(min_$c AS DOUBLE) AS min_num, CAST(max_$c AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a""".stripMargin
      } ++ strCols.map { c =>
        s"""SELECT '$c' AS col_name, n, nn_$c AS n_null, nd_$c AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  min_$c AS min_str, max_$c AS max_str FROM a""".stripMargin
      }
      s"""WITH a AS (
         |  SELECT count(*) AS n,
         |    $aggs
         |  FROM lineitem)
         |${rows.mkString("\nUNION ALL\n")}""".stripMargin
    },

    "q25_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, date_trunc('second', ts) AS tss FROM events),
        |s1 AS (SELECT user_id, min(tss) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(tss) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND tss > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(tss) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND tss > t2 GROUP BY e.user_id)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
        |UNION ALL
        |SELECT '2_click' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s2
        |UNION ALL
        |SELECT '3_purchase' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s3""".stripMargin,

    "q28_markov" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('second', ts), event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  n * 1.0 / sum(n) OVER (PARTITION BY from_type) AS p
        |FROM m""".stripMargin,

    "q26_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id)
        |SELECT cohort_wk,
        |  CAST(floor((uw.wk - cohort_wk) / 7.0) AS BIGINT) AS weeks_later,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM uw JOIN cohort ON uw.user_id = cohort.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1995-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q3_topk" ->
      """SELECT rank, o_custkey, revenue FROM (
        |  SELECT o_custkey, revenue,
        |    row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rank
        |  FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
        |        FROM orders GROUP BY o_custkey))
        |WHERE rank <= 10""".stripMargin,

    "q4_window" ->
      """SELECT o_custkey, o_orderkey, rn, run_sum FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS run_sum
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE rn <= 3""".stripMargin,

    "q5_setops" ->
      """SELECT p_brand FROM
        |  (SELECT p_brand FROM part WHERE p_size >= 25
        |   INTERSECT
        |   SELECT p_brand FROM part WHERE p_retailprice < 1200.0)
        |UNION ALL
        |SELECT p_brand || '#only_big' AS p_brand FROM
        |  (SELECT p_brand FROM part WHERE p_size >= 25
        |   EXCEPT
        |   SELECT p_brand FROM part WHERE p_retailprice < 1200.0)""".stripMargin,

    "q6_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-02-01 00:00:00'
        |  AND l_discount > 0.07""".stripMargin,

    "q7_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    "q8_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q23_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin,

    "q9_semi_anti" ->
      """SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'has_orders' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q10_scalar" ->
      """SELECT p_partkey,
        |  upper(substring(p_name, 1, 8)) AS name_prefix,
        |  length(p_name) AS name_len,
        |  p_retailprice * 1.5 AS marked_up,
        |  abs(p_size - 25) AS size_dev,
        |  p_partkey % 7 AS bucket,
        |  concat_ws('-', p_brand, p_type) AS brand_type
        |FROM part WHERE p_partkey <= 200""".stripMargin,

    "q11_events_window" ->
      """SELECT date_trunc('hour', ts) AS h, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q30_recursive" ->
      """WITH RECURSIVE r(v, depth) AS (
        |  SELECT CAST(42 AS BIGINT) AS v, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT l_partkey % 4096 AS v, r.depth + 1 AS depth
        |  FROM r JOIN lineitem ON l_orderkey % 4096 = r.v
        |  WHERE r.depth < 3)
        |SELECT v, CAST(min(depth) AS BIGINT) AS depth
        |FROM r GROUP BY v""".stripMargin,

    "q29_interval_window" ->
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_trailing_hour,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cents_trailing_hour
        |FROM events""".stripMargin,

    // UNION ALL spelling of unpivot — portable across engines
    "q20_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        |FROM lineitem WHERE l_orderkey < 50
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 50
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 50""".stripMargin,

    "q15_window_funcs" ->
      """SELECT o_orderpriority, o_orderkey, rnk, drnk, prev_price, next_key, quartile
        |FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk,
        |    lag(o_totalprice) OVER w AS prev_price,
        |    lead(o_orderkey) OVER w AS next_key,
        |    ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rnk <= 5""".stripMargin,

    "q16_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q17_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q13_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "q14_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS dom,
        |  date_trunc('quarter', o_orderdate) AS q_start,
        |  datediff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_eoy,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders WHERE o_orderkey <= 500""".stripMargin,

    "q19_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q18_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,

    "q12_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS tss, value
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, tss, value,
        |    lag(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev
        |  FROM ev),
        |flagged AS (
        |  SELECT user_id, event_id, tss, value,
        |    CASE WHEN prev IS NULL
        |           OR CAST(floor(epoch(tss)) AS BIGINT) - CAST(floor(epoch(prev)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, tss, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(tss) AS start_ts, max(tss) AS end_ts,
        |  round(sum(value), 2) AS session_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin
  )
}
