package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** The relational operator surface the reference delegates to its embedded
  * DataFusion engine (SURVEY.md §2.B; exposed via `ctx.sql`,
  * reference examples/simple_query.rs:77). Re-expressed Spark-first:
  * DataFrame/Dataset API, Catalyst does pushdown/pruning/join-planning.
  * Each entry carries a DuckDB oracle for the driver's correctness gate.
  */
object Relational {

  /** Exact money arithmetic: doubles carry 2-decimal money values, so a
    * DECIMAL(18,4) cast is lossless and makes SUM order-insensitive and
    * bit-identical across engines (vs. fp-association drift of double sums).
    *
    * Output convention: accumulate in DECIMAL (exact), but cast every FINAL
    * output decimal column to DOUBLE on both the Spark and the oracle side —
    * one well-defined rounding, identical in both engines. The driver's hash
    * gate canonicalizes decimal scale/trailing zeros differently than the
    * engines do, so emitting raw DECIMAL output fails the hash even when
    * values match (round-1 q01/q03/q05/q09/q17/q18 post-mortem).
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- aggregation: partial+final hash agg, multiple agg functions ----
    QueryDef(
      "q01_agg_groupby",
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).cast(DoubleType).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- projection + filter: pushed to the parquet scan by Catalyst ----
    QueryDef(
      "q02_project_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount >= 0.05 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01 00:00:00").cast(TimestampType),
          lit("1996-12-31 00:00:00").cast(TimestampType))
          && col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- equi-join + agg + deterministic top-k (TPC-H Q3 shape) ----
    QueryDef(
      "q03_join_topk",
      """SELECT o.o_orderkey, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey, o_year
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val l = T(s, dir, "lineitem"); val o = T(s, dir, "orders"); val c = T(s, dir, "customer")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .filter(c("c_mktsegment") === "BUILDING")
        .groupBy(o("o_orderkey"), year(o("o_orderdate")).as("o_year"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- left-semi join (EXISTS) ----
    QueryDef(
      "q04_semi_join",
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- 5-way star join through nation/region; dims broadcast ----
    QueryDef(
      "q05_multi_join",
      """SELECT r.r_name, n.n_name,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      val l = Tables.loadSpread(s, dir, "lineitem")
      val o = T(s, dir, "orders"); val c = T(s, dir, "customer")
      val n = T(s, dir, "nation"); val r = T(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"), n("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // ---- left-anti join (NOT EXISTS) ----
    QueryDef(
      "q06_anti_join",
      """SELECT c_mktsegment, COUNT(*) AS n_custs
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND EXTRACT(year FROM o.o_orderdate) = 1996)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- broadcast hash join against a filtered small dim ----
    QueryDef(
      "q07_broadcast_join",
      """SELECT p.p_brand, SUM(l.l_quantity) AS sum_qty, COUNT(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 10
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin) { (s, dir) =>
      val l = T(s, dir, "lineitem")
      val p = T(s, dir, "part").filter(col("p_size") <= 10)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    },

    // ---- window: row_number/rank, top-3 per group ----
    QueryDef(
      "q08_window_rank",
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
        |    RANK() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      T(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // ---- window: running sum (ROWS frame) + lag/lead over a pinned order.
    // DECIMAL running sum: DuckDB evaluates window aggs with a segment tree,
    // so double association drifts — decimal is exact on both engines.
    QueryDef(
      "q09_window_running",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_spend"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- global top-k: Spark plans TakeOrderedAndProject ----
    QueryDef(
      "q10_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // ---- set ops: INTERSECT / EXCEPT / UNION ALL (distinct semantics) ----
    QueryDef(
      "q11_set_ops",
      """SELECT 'both' AS bucket, c AS o_custkey FROM (
        |  SELECT o_custkey AS c FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997) t1
        |UNION ALL
        |SELECT 'only96' AS bucket, c AS o_custkey FROM (
        |  SELECT o_custkey AS c FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997) t2
        |ORDER BY bucket, o_custkey""".stripMargin) { (s, dir) =>
      val o = T(s, dir, "orders")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      y96.intersect(y97).select(lit("both").as("bucket"), col("o_custkey"))
        .unionAll(y96.except(y97).select(lit("only96").as("bucket"), col("o_custkey")))
        .orderBy(col("bucket"), col("o_custkey"))
    },

    // ---- distinct ----
    QueryDef(
      "q12_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- ROLLUP (NULLS FIRST pinned: Spark default vs DuckDB NULLS LAST) ----
    QueryDef(
      "q13_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ---- CUBE ----
    QueryDef(
      "q14_cube",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },

    // ---- GROUPING SETS (SQL surface over registered views) ----
    QueryDef(
      "q15_grouping_sets",
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.register(s, dir, "lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // ---- scalar string functions ----
    QueryDef(
      "q16_string_funcs",
      """SELECT upper(p_brand) AS brand_u, substring(p_type, 1, 5) AS type5,
        |  COUNT(*) AS cnt, CAST(MIN(length(p_name)) AS INT) AS min_name_len,
        |  MAX(concat(p_brand, '|', p_type)) AS max_cat
        |FROM part
        |WHERE p_name LIKE '%a%'
        |GROUP BY brand_u, type5
        |ORDER BY brand_u, type5""".stripMargin) { (s, dir) =>
      T(s, dir, "part")
        .filter(col("p_name").like("%a%"))
        .groupBy(
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_type"), 1, 5).as("type5"))
        .agg(
          count(lit(1)).as("cnt"),
          min(length(col("p_name"))).cast(IntegerType).as("min_name_len"),
          max(concat(col("p_brand"), lit("|"), col("p_type"))).as("max_cat"))
        .orderBy(col("brand_u"), col("type5"))
    },

    // ---- scalar date/time functions ----
    QueryDef(
      "q17_datetime_funcs",
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_year, o_month, month_start
        |ORDER BY o_year, o_month""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))
        .orderBy(col("o_year"), col("o_month"))
    },

    // ---- scalar math functions (IEEE-deterministic subset: no libm logs) ----
    QueryDef(
      "q18_math_funcs",
      """SELECT CAST(l_quantity AS INT) % 7 AS qty_mod,
        |  CAST(CAST(SUM(CAST(abs(l_extendedprice) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_abs,
        |  CAST(MAX(ceil(l_extendedprice)) AS BIGINT) AS max_ceil,
        |  CAST(MIN(floor(l_extendedprice)) AS BIGINT) AS min_floor,
        |  MAX(sqrt(l_quantity)) AS max_sqrt
        |FROM lineitem
        |GROUP BY qty_mod
        |ORDER BY qty_mod""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy((col("l_quantity").cast(IntegerType) % 7).as("qty_mod"))
        .agg(
          sum(dec(abs(col("l_extendedprice")))).cast(DoubleType).as("sum_abs"),
          max(ceil(col("l_extendedprice"))).cast(LongType).as("max_ceil"),
          min(floor(col("l_extendedprice"))).cast(LongType).as("min_floor"),
          max(sqrt(col("l_quantity"))).as("max_sqrt"))
        .orderBy(col("qty_mod"))
    },

    // ---- regex: rlike filter + capture-group extraction ----
    QueryDef(
      "q19_regex_funcs",
      """SELECT TRY_CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INT) % 10 AS k_mod,
        |  COUNT(*) AS cnt
        |FROM events
        |WHERE regexp_matches(event_type, '^(click|view)$')
        |GROUP BY k_mod
        |ORDER BY k_mod NULLS FIRST""".stripMargin) { (s, dir) =>
      // Guarded cast on both sides: a non-matching props row yields a NULL
      // group instead of a cast error (Spark ANSI / DuckDB CAST('') both
      // throw on the unguarded form if fixtures ever change).
      val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
      T(s, dir, "events")
        .filter(col("event_type").rlike("^(click|view)$"))
        .groupBy((when(length(k) > 0, k.cast(IntegerType)) % 10).as("k_mod"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("k_mod"))
    },

    // ---- CASE WHEN / IN / BETWEEN predicates ----
    QueryDef(
      "q20_case_in_between",
      """SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity BETWEEN 10 AND 35 THEN 'mid' ELSE 'high' END AS qty_bucket,
        |  COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'N')
        |GROUP BY qty_bucket
        |ORDER BY qty_bucket""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "N"))
        .groupBy(
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity").between(10, 35), "mid")
            .otherwise("high").as("qty_bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("qty_bucket"))
    },

    // ---- scalar subquery (uncorrelated); avg on integral doubles is exact ----
    QueryDef(
      "q21_scalar_subquery",
      """SELECT l_returnflag, COUNT(*) AS n_above
        |FROM lineitem
        |WHERE l_quantity > (SELECT CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS DOUBLE) FROM lineitem)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.register(s, dir, "lineitem")
      // Spark side keeps the direct decimal->double cast (correctly
      // rounded in Spark); only the DuckDB oracle routes through VARCHAR
      // (DuckDB's int128->double conversion can be 1 ulp off).
      s.sql(
        """SELECT l_returnflag, COUNT(*) AS n_above
          |FROM lineitem
          |WHERE l_quantity > (SELECT CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) FROM lineitem)
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // ---- IN subquery ----
    QueryDef(
      "q22_in_subquery",
      """SELECT o_orderstatus, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.register(s, dir, "orders", "customer")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n_orders
          |FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // ---- correlated EXISTS (decorrelated by Catalyst) ----
    QueryDef(
      "q23_exists_correlated",
      """SELECT c.c_mktsegment, COUNT(*) AS n_custs
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.register(s, dir, "customer", "orders")
      s.sql(
        """SELECT c.c_mktsegment, COUNT(*) AS n_custs
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          |GROUP BY c.c_mktsegment
          |ORDER BY c.c_mktsegment""".stripMargin)
    },

    // ---- exact percentile/median (integral doubles → interpolation exact) ----
    QueryDef(
      "q24_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    },

    // ---- first/last_value + ntile over frames ----
    QueryDef(
      "q25_first_last_ntile",
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        |  LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(wf).as("first_price"),
          last(col("o_totalprice")).over(wf).as("last_price"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- approximate aggregates: sketch algorithms differ across engines,
    // so no byte-exact oracle; the driver records a rows-only check and
    // graft.RelationalSpec asserts the accuracy contract (approx_parts
    // within 5% of exact count_distinct; percentile_approx within 1% of
    // percentile — the spec computes the exact companions itself, so the
    // benched query is the honest approx-only workload: at 100 TB the
    // whole point of HLL/KLL sketches is NOT paying the exact-distinct
    // shuffle this query would otherwise carry).
    QueryDef.noOracle("q26_approx_agg") { (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_median_price"))
        .orderBy(col("l_returnflag"))
    },

    // ---- outer joins: LEFT and RIGHT code paths (identical semantics,
    // mirrored inputs) — unmatched customers keep NULL order columns ----
    QueryDef(
      "q27_outer_join",
      """SELECT 'left' AS jt, c.c_mktsegment, COUNT(*) AS n_rows,
        |  COUNT(o.o_orderkey) AS n_orders,
        |  CAST(CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM customer c LEFT JOIN orders o
        |  ON c.c_custkey = o.o_custkey AND EXTRACT(year FROM o.o_orderdate) = 1996
        |GROUP BY c.c_mktsegment
        |UNION ALL
        |SELECT 'right' AS jt, c.c_mktsegment, COUNT(*) AS n_rows,
        |  COUNT(o.o_orderkey) AS n_orders,
        |  CAST(CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders o RIGHT JOIN customer c
        |  ON c.c_custkey = o.o_custkey AND EXTRACT(year FROM o.o_orderdate) = 1996
        |GROUP BY c.c_mktsegment
        |ORDER BY jt, c_mktsegment""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      def aggSide(joined: DataFrame, jt: String): DataFrame =
        joined.groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("o_orderkey")).as("n_orders"),
            sum(dec(coalesce(col("o_totalprice"), lit(0)))).cast(DoubleType).as("total"))
          .select(lit(jt).as("jt"), col("c_mktsegment"), col("n_rows"), col("n_orders"), col("total"))
      aggSide(c.join(o, c("c_custkey") === o("o_custkey"), "left"), "left")
        .unionAll(aggSide(o.join(c, c("c_custkey") === o("o_custkey"), "right"), "right"))
        .orderBy(col("jt"), col("c_mktsegment"))
    },

    // ---- full outer join: per-nation aggregates with deliberately sparse
    // sides so both unmatched directions appear in the output ----
    QueryDef(
      "q28_full_outer_join",
      """WITH cn AS (
        |  SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
        |  WHERE c_acctbal > 9000 GROUP BY c_nationkey),
        |sn AS (
        |  SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
        |  WHERE s_acctbal < 0 GROUP BY s_nationkey)
        |SELECT COALESCE(cn.nk, sn.nk) AS nationkey, cn.n_cust, sn.n_supp
        |FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val cn = T(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("c_nk")).agg(count(lit(1)).as("n_cust"))
      val sn = T(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .groupBy(col("s_nationkey").as("s_nk")).agg(count(lit(1)).as("n_supp"))
      cn.join(sn, cn("c_nk") === sn("s_nk"), "full_outer")
        .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"), col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    },

    // ---- multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicates ----
    QueryDef(
      "q29_intersect_except_all",
      """SELECT 'both' AS bucket, ck AS o_custkey FROM (
        |  SELECT o_custkey AS ck FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997) t1
        |UNION ALL
        |SELECT 'extra96' AS bucket, ck AS o_custkey FROM (
        |  SELECT o_custkey AS ck FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997) t2
        |ORDER BY bucket, o_custkey""".stripMargin) { (s, dir) =>
      val o = T(s, dir, "orders")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      y96.intersectAll(y97).select(lit("both").as("bucket"), col("o_custkey"))
        .unionAll(y96.exceptAll(y97).select(lit("extra96").as("bucket"), col("o_custkey")))
        .orderBy(col("bucket"), col("o_custkey"))
    },

    // ---- skew-resistant aggregation: two-phase salted agg. event_type
    // has 5 values — at 100 TB a single-phase groupBy sends each hot key
    // to ONE reducer; salting fans the partial aggregation over 16
    // sub-keys first, then combines. Same result as the plain group-by
    // (the oracle), different shuffle profile. (Spark's partial+final
    // hash agg already mitigates this for algebraic aggs; the salt
    // pattern is the general tool and is demonstrated exactly.) ----
    QueryDef(
      "q33_skew_salted_agg",
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(
          count(lit(1)).as("pc"),
          sum(col("value").cast(DecimalType(18, 4))).as("ps"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("pc")).as("cnt"),
          sum(col("ps")).cast(DoubleType).as("sum_value"))
        .orderBy(col("event_type"))
    },

    // ---- LATERAL correlated subquery: top-2 customers per nation —
    // Catalyst decorrelates the per-row LATERAL LIMIT into a windowed
    // rank under the hood (DecorrelateInnerQuery), so the plan is one
    // shuffle, not a per-nation loop. ----
    QueryDef(
      "q62_lateral_join",
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin) { (s, dir) =>
      Tables.register(s, dir, "nation", "customer")
      s.sql(
        """SELECT n.n_name, c.c_name, c.c_acctbal
          |FROM nation n, LATERAL (
          |  SELECT c_name, c_acctbal FROM customer
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
          |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
    },

    // ---- PIVOT: long-to-wide per-cohort event counts. Spark's
    // relational pivot with an explicit value list (never inferred —
    // value inference is a full extra pass at scale); the oracle is the
    // equivalent portable CASE aggregation. ----
    QueryDef(
      "q63_pivot",
      """SELECT user_id % 10 AS cohort,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events
        |GROUP BY user_id % 10
        |ORDER BY cohort""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("cohort", col("user_id") % 10)
        .groupBy(col("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("cohort"))
    },

    // ---- UNPIVOT (melt): the wide-to-long inverse of q63 — pivot the
    // cohort counts wide, then unpivot back to (cohort, event_type, cnt).
    // Round-tripping through both relational reshapes pins that they are
    // inverses; the oracle is the plain long-form GROUP BY. ----
    QueryDef(
      "q64_unpivot",
      """SELECT user_id % 10 AS cohort, event_type, COUNT(*) AS cnt
        |FROM events
        |GROUP BY user_id % 10, event_type
        |ORDER BY cohort, event_type""".stripMargin) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.load(s, dir, "events")
        .withColumn("cohort", col("user_id") % 10)
        .groupBy(col("cohort"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(
          ids = Array(col("cohort")),
          values = types.map(col).toArray,
          variableColumnName = "event_type",
          valueColumnName = "cnt")
        // the fixture has every (cohort, type) populated; a 0 would mean a
        // combination absent from the long form — drop to match GROUP BY
        .filter(col("cnt") > 0)
        .orderBy(col("cohort"), col("event_type"))
    },

    // ---- WITH RECURSIVE (Spark 4.1's UnionLoop execution): the
    // date-spine idiom — a recursive CTE generates the calendar spine
    // (one row per level, 59 levels: linear, guaranteed-terminating
    // recursion) and a LEFT join zero-fills days with no orders, which a
    // bare GROUP BY over the fact table cannot produce. The recursion
    // itself is driver-cheap (UnionLoopExec materializes one spine row
    // per step); the join against the fact table is a normal equi join,
    // so the 100 TB cost profile is the join, not the recursion. ----
    QueryDef(
      "q112_recursive_cte",
      """WITH RECURSIVE spine(d) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT d + 1 FROM spine WHERE d < DATE '1995-02-28'
        |)
        |SELECT strftime(s.d, '%Y-%m-%d') AS day, COUNT(o.o_orderkey) AS n_orders
        |FROM spine s LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.d
        |GROUP BY s.d
        |ORDER BY day""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_q112")
      s.sql(
        """WITH RECURSIVE spine AS (
          |  SELECT DATE'1995-01-01' AS d
          |  UNION ALL
          |  SELECT date_add(d, 1) AS d FROM spine WHERE d < DATE'1995-02-28'
          |)
          |SELECT date_format(s.d, 'yyyy-MM-dd') AS day,
          |  COUNT(o.o_orderkey) AS n_orders
          |FROM spine s LEFT JOIN orders_q112 o ON to_date(o.o_orderdate) = s.d
          |GROUP BY s.d
          |ORDER BY day""".stripMargin)
    },

    // ---- SQL pipe syntax (Spark 4's |> operators): the same logical
    // plan as a nested SELECT, declared as a linear pipeline — scan,
    // filter, aggregate, post-filter, order. Catalyst sees identical
    // operators (pushdown/partial-agg all apply); this entry pins that
    // the surface syntax works end-to-end and matches the ANSI oracle. ----
    QueryDef(
      "q114_pipe_syntax",
      """SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_quantity >= 45
        |GROUP BY l_returnflag
        |HAVING COUNT(*) > 0
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_q114")
      s.sql(
        """FROM lineitem_q114
          ||> WHERE l_quantity >= 45
          ||> AGGREGATE COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty GROUP BY l_returnflag
          ||> WHERE cnt > 0
          ||> ORDER BY l_returnflag""".stripMargin)
    }
  )
}
