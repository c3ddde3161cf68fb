package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational surface parity with the reference's SQL-logic-test corpus
  * (`/root/reference/crates/sqllogictest/testdata/slts/df_test/` —
  * basic_queries.slt: ORDER BY/LIMIT/OFFSET, GROUP BY/HAVING, DISTINCT,
  * BETWEEN/IN/LIKE; predicate-pushdown slts). The reference delegates these
  * to DataFusion; here Catalyst is the host engine, so each query is plain
  * DataFrame API and we let Catalyst do pushdown/pruning/codegen.
  *
  * Scale notes (100 TB): dims (nation/region/customer at these SFs) are
  * broadcast explicitly; fact-side aggregations are partial-agg friendly
  * (groupBy on low-cardinality keys → map-side combine); no collect()s.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary. Decimal sums for cross-engine
    * determinism; filter pushes to parquet scan. */
  val q01 = Q.sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS count_order,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(15,4)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS DOUBLE) AS sum_disc_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    bench = true
  ) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        // decimal sums internally (exact, associative) → DECIMAL(15,4) → DOUBLE:
        // a 15-digit unscaled value fits in 2^53, so both engines' decimal→double
        // conversions are exact IEEE divisions and bit-identical
        sum(col("l_quantity").cast("decimal(18,4)")).cast("decimal(15,4)").cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,6)")).cast("decimal(15,4)").cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,6)") *
          (lit(1) - col("l_discount")).cast("decimal(18,6)")).cast("decimal(15,4)").cast("double").as("sum_disc_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Selective scan: BETWEEN + IN + date range; projection prunes to 4 cols.
    * Mirrors the reference's predicate-pushdown slts — `.explain` must show
    * PushedFilters on the parquet scan. */
  val q02 = Q.sql(
    "q02_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity
      |FROM lineitem
      |WHERE l_quantity BETWEEN 30 AND 40
      |  AND l_returnflag IN ('A','R')
      |  AND l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber, ship_date, l_quantity""".stripMargin,
    bench = true
  ) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_quantity").between(30, 40) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_shipdate") >= lit("1995-06-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is not unique in the synthetic data
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_date"),
        col("l_quantity"))
  }

  /** Join + agg: revenue per nation. Dims broadcast (no shuffle of the fact
    * side beyond the final low-cardinality groupBy). */
  val q03 = Q.sql(
    "q03_join_revenue",
    """SELECT n_name,
      |  count(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(15,4)) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin,
    bench = true
  ) { (s, d) =>
    // customer scales with the fact side (15M rows at sf100): let AQE
    // pick broadcast vs shuffle hash at runtime instead of pinning a
    // broadcast that breaks past the driver limit; nation is bounded
    // (25 rows at every SF) so its hint is always safe (VERDICT r1 §perf)
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,6)")).cast("decimal(15,4)").cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Top-k: Catalyst compiles orderBy+limit to TakeOrderedAndProject (no
    * global sort shuffle). Tie-broken on the key for determinism. */
  val q04 = Q.sql(
    "q04_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin
  ) { (s, d) =>
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** DISTINCT aggregation (exact count-distinct → two-phase hash agg). */
  val q05 = Q.sql(
    "q05_distinct_segments",
    """SELECT c_mktsegment,
      |  count(DISTINCT c_nationkey) AS n_nations,
      |  count(*) AS n_customers
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Anti join — the exact shape our MoR delete application uses
    * (rows NOT matched by a delete set survive). */
  val q06 = Q.sql(
    "q06_anti_join",
    """SELECT c_nationkey, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 100000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** Semi join (EXISTS) + HAVING. */
  val q07 = Q.sql(
    "q07_semi_join_having",
    """SELECT c_mktsegment, count(*) AS n_big_spenders
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |GROUP BY c_mktsegment
      |HAVING count(*) > 0
      |ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_big_spenders"))
      .filter(col("n_big_spenders") > 0)
      .orderBy(col("c_mktsegment"))
  }

  /** Multi-way star join with LIKE filter (part.p_type prefix) —
    * LIKE-prefix pushdown mirrors like_predicate_pushdown.slt /
    * the reference's StartsWith predicate (expr/mod.rs:40-59). */
  val q08 = Q.sql(
    "q08_star_like",
    """SELECT p_brand, count(*) AS n_items,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(15,4)) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_type LIKE 'STANDARD%'
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin
  ) { (s, d) =>
    // part also grows with SF: filtered-dim size is runtime-dependent,
    // exactly AQE's call (it rewrites to broadcast when the filtered
    // side fits)
    lineitem(s, d)
      .join(part(s, d).filter(col("p_type").startsWith("STANDARD")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("decimal(15,4)").cast("double").as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  /** Window function: per-customer order ranking (reference has no windows
    * — §2.5 — but the host engine must; this is the Catalyst Window path). */
  val q09 = Q.sql(
    "q09_window_rank",
    """SELECT o_custkey, o_orderkey, rnk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) x
      |WHERE rnk <= 2
      |ORDER BY o_custkey, rnk""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Set op: UNION ALL + aggregate over mixed sources (§2.7 — delegated to
    * host engine in the reference). */
  val q10 = Q.sql(
    "q10_union_keys",
    """SELECT k, count(*) AS n FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS k FROM supplier) x
      |GROUP BY k
      |ORDER BY k""".stripMargin
  ) { (s, d) =>
    customer(s, d).select(col("c_nationkey").as("k"))
      .unionAll(supplier(s, d).select(col("s_nationkey").as("k")))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10)
}
