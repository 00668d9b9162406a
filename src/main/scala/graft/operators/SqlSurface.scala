package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL-TEXT surface: the reference is a SQL-warehouse user
  * (bigquery_loader.py builds its analytics as SQL strings), so the
  * engine must accept ANSI SQL text over the same tables — not only
  * the DataFrame API. Views register per (session, dir) and Catalyst
  * treats a view exactly like the DataFrame lineage underneath it:
  * filter pushdown, column pruning, and broadcast planning all survive
  * the SQL path (PLANS.md rows for the q_sql_* queries show the SAME
  * pushdown/BHJ shape as their DataFrame twins — the gate that the
  * text surface costs nothing at 100 TB).
  *
  * The q_sql_* queries intentionally mirror existing DataFrame-API
  * queries family-by-family; their DuckDB oracles are byte-for-byte
  * the portable subset of the same statement, so the pair proves both
  * the surface AND cross-dialect semantics. */
object SqlSurface {

  private val TableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every corpus table as a temp view over `dir` (idempotent;
    * re-registration just repoints the view). Events go through
    * [[Tables.events]] so the timestamp normalization the DataFrame
    * path gets also protects raw SQL. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }

  /** TPC-H Q1 pricing summary as raw SQL text — the DataFrame twin is
    * q1_agg; DECIMAL sums for cross-engine exactness, 4dp+nudge edges. */
  def pricingSummarySql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
        count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")

  /** Window function through the text surface: top-5 orders per market
    * segment via `row_number()` in raw SQL — Spark rewrites the rank
    * filter to WindowGroupLimit (map-side AND final top-k retention)
    * exactly as it does for the DataFrame dialect, so a hot segment's
    * candidates never co-reside (the PLANS row gates it). Spark has no
    * QUALIFY, so the portable form is the subquery filter. */
  def segmentTopOrdersSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT * FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          CAST(row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        FROM orders JOIN customer ON o_custkey = c_custkey) t
      WHERE rk <= 5 ORDER BY c_mktsegment, rk""")

  /** CTE + correlated EXISTS through the text surface — the textbook
    * form of the TPC-H Q4 shape (q_priority_returns is the decorrelated
    * DataFrame twin). Catalyst rewrites the per-row EXISTS into a LEFT
    * SEMI join during analysis (RewritePredicateSubquery), so the text
    * form plans EXACTLY like the hand-decorrelated one — no per-row
    * subquery execution exists in the engine at all; the spec gates the
    * semi-join shape. The CTE is inlined (it has one reference), so no
    * materialization barrier appears either. */
  def priorityReturnsSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      WITH recent_orders AS (
        SELECT o_orderkey, o_orderpriority
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00')
      SELECT o_orderpriority, count(*) AS order_count
      FROM recent_orders o
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")

  /** IN-subquery through the text surface: nations ranked by suppliers
    * who shipped a PROMO part. The uncorrelated IN plans as a left semi
    * join whose right side is the distinct subquery result — never a
    * broadcast-collected value list — so a billion-row subquery is just
    * a join side; part broadcasts under the dimension-size threshold
    * exactly as the DataFrame dialect would. */
  def promoSuppliersSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT n_name, count(*) AS n_suppliers
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem
                          JOIN part ON l_partkey = p_partkey
                          WHERE p_type = 'PROMO')
      GROUP BY n_name
      ORDER BY n_name""")

  /** UNION ALL through the text surface: one revenue rollup over two
    * differently-filtered order slices (high-value orders; orders with a
    * returned item via an IN semi join). UNION ALL is a physical Union —
    * zero shuffle, both children stream into the same aggregate, and
    * partial aggregation runs map-side across both branches; only the
    * final 2-row group exchange moves data. */
  def orderSlicesUnionSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT src, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM (
        SELECT 'high' AS src, o_totalprice FROM orders
        WHERE o_totalprice >= 400000
        UNION ALL
        SELECT 'returned' AS src, o_totalprice FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             WHERE l_returnflag = 'R')) t
      GROUP BY src
      ORDER BY src""")

  /** WITH RECURSIVE through the text surface (Spark 4's recursive CTE
    * execution — the UnionLoop iterative plan): bounded-depth
    * transitive reachability over the event-transition graph.
    * The depth guard (< 3) bounds the iteration REGARDLESS of cycles
    * (UNION ALL recursion never needs a fixpoint test), and every
    * per-round frame is dictionary-sized — edges are (type, type)
    * pairs, ≤ |types|² rows — so each iteration is a broadcast-scale
    * join even at 100 TB corpus size; the corpus itself is touched
    * exactly once, by the edge-derivation CTE. The statement is
    * byte-identical in DuckDB (portable CASTs, deterministic lag
    * tie-break on (ts, event_id)). */
  private[graft] val ReachabilityStatement = """
      WITH RECURSIVE edges AS (
        SELECT DISTINCT prev_type AS src, event_type AS dst
        FROM (SELECT event_type,
                lag(event_type, 1) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev_type
              FROM events) l
        WHERE prev_type IS NOT NULL AND prev_type <> event_type),
      reach(event_type, depth) AS (
        SELECT 'signup', CAST(0 AS BIGINT)
        UNION ALL
        SELECT e.dst, r.depth + 1
        FROM reach r JOIN edges e ON e.src = r.event_type
        WHERE r.depth < 3)
      SELECT event_type, min(depth) AS min_depth,
        CAST(count(*) AS BIGINT) AS n_paths
      FROM reach
      GROUP BY event_type
      ORDER BY event_type"""

  def reachabilitySql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, ReachabilityStatement)

  /** INTERSECT / EXCEPT through the text surface, over two order
    * slices (big-spender customers vs urgent-order customers). Both set
    * ops are SET-semantic (dedup), and Catalyst rewrites them during
    * optimization into a LEFT SEMI (INTERSECT) / LEFT ANTI (EXCEPT)
    * join under a distinct aggregate — no dedicated set-op operator
    * survives to the physical plan, so a billion-row slice costs one
    * hash-partitioned semi/anti join, the same shape the DataFrame
    * `intersect`/`except` twins plan. Both branches scan the SAME
    * orders table with different pushed filters; labeling the two
    * verdicts and unioning keeps one statement (UNION ALL is a
    * zero-shuffle physical Union). */
  def orderSlicesSetOpsSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT 'both' AS grp, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_totalprice >= 300000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') a
      UNION ALL
      SELECT 'high_only' AS grp, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_totalprice >= 300000
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') b
      ORDER BY grp, o_custkey""")

  /** Scalar subquery in SELECT through the text surface — the C27
    * (q_revenue_share) one-row-global-aggregate device expressed as SQL
    * text: the uncorrelated `(SELECT sum(..) FROM orders)` plans as ONE
    * separate subquery whose single-row result is injected into every
    * output row (Spark's ScalarSubquery reuses the subquery result —
    * it is NOT re-executed per row or per group), so the statement
    * costs two aggregates over one scan, never a nested loop. Exact
    * DECIMAL sums; the share divides doubles with the 4dp+nudge edge
    * discipline the C-family uses. */
  def priorityRevenueScalarSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT o_orderpriority,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
          / CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(18,6)))
                  FROM orders) AS DOUBLE) * 100 + 5e-9, 4) AS pct_of_total
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")

  /** GROUPING SETS through the text surface — the C18 shape
    * (q_grouping_sets is the DataFrame twin) as raw SQL: one Expand +
    * one aggregate exchange however many sets are requested; grouping()
    * markers disambiguate data-null from set-null, and the ORDER BY
    * coalesce sentinel pins the cross-engine sort of set-null rows
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST). */
  def groupingSetsSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        count(*) AS n,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), (l_linestatus))
      ORDER BY g_rf, g_ls, coalesce(l_returnflag, '~'),
               coalesce(l_linestatus, '~')""")

  /** Dimension-joined revenue rollup as raw SQL text: the planner must
    * broadcast nation/region through the view layer exactly as the
    * DataFrame path does (PLANS row asserts the BHJs + scan pushdown). */
  def regionRevenueSql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT r_name, n_name,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""")
}
