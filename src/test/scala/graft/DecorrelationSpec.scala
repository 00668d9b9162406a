package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Relational

/** The C-ext decorrelation battery (TPC-H Q17/Q11/Q15 shapes): each
  * hand-decorrelated plan must equal the naive correlated-subquery SQL
  * a user would write (which Catalyst decorrelates its own way) — the
  * proof that the semi-reduction / scalar-broadcast rewrites are result
  * transparent, not just fast.
  */
class DecorrelationSpec extends SparkSpec {

  private def registerTables(): Unit =
    Seq("lineitem", "part", "supplier", "orders", "customer", "nation")
      .foreach { t =>
        Tables.table(spark, sf(), t).createOrReplaceTempView(t)
      }

  private def assertSameRows(a: DataFrame, b: DataFrame, label: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$label: decorrelated plan and correlated SQL disagree")
    assert(a.count() == b.count(), s"$label: row counts differ")
  }

  test("smallQtyOrders equals the correlated avg-quantity subquery") {
    registerTables()
    val ours = Relational.smallQtyOrders(
      Tables.table(spark, sf(), "lineitem"), Tables.table(spark, sf(), "part"))
    // The naive user form: two correlated scalar subqueries per row,
    // same cross-multiplied boundary (so the comparison itself is
    // identical and only the plan shape differs).
    val naive = spark.sql("""
      SELECT l.l_partkey, count(*) AS n_small,
        CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS small_revenue,
        round(CAST(first((SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey)) AS DOUBLE)
          / CAST(first((SELECT count(*) FROM lineitem l3
                  WHERE l3.l_partkey = l.l_partkey)) AS DOUBLE) + 5e-9, 4) AS avg_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#23'
        AND CAST(l.l_quantity AS BIGINT) * 2 *
            (SELECT count(*) FROM lineitem l4 WHERE l4.l_partkey = l.l_partkey)
          < (SELECT sum(CAST(l5.l_quantity AS BIGINT)) FROM lineitem l5
             WHERE l5.l_partkey = l.l_partkey)
      GROUP BY l.l_partkey""")
    assertSameRows(ours, naive, "q_small_qty_orders")
  }

  test("revenueShareParts equals the global-total scalar subquery") {
    registerTables()
    val ours = Relational.revenueShareParts(Tables.table(spark, sf(), "lineitem"))
    val naive = spark.sql("""
      WITH pr AS (
        SELECT l_partkey,
          sum(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(18,6))) AS rev_exact
        FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey, CAST(round(rev_exact, 2) AS DOUBLE) AS revenue,
        round(CAST(rev_exact AS DOUBLE) /
          CAST((SELECT sum(rev_exact) FROM pr) AS DOUBLE) * 100 + 5e-9, 4) AS pct_of_total
      FROM pr
      WHERE CAST(rev_exact AS DOUBLE) /
          CAST((SELECT sum(rev_exact) FROM pr) AS DOUBLE) > 0.0002D""")
    assertSameRows(ours, naive, "q_revenue_share")
  }

  test("topSupplier equals the view + scalar-max subquery, ties included") {
    registerTables()
    val ours = Relational.topSupplier(
      Tables.table(spark, sf(), "lineitem"), Tables.table(spark, sf(), "supplier"))
    val naive = spark.sql("""
      WITH ps AS (
        SELECT l_suppkey,
          sum(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(18,6))) AS rev_exact
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(round(rev_exact, 2) AS DOUBLE) AS total_revenue
      FROM ps JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev_exact = (SELECT max(rev_exact) FROM ps)""")
    assertSameRows(ours, naive, "q_top_supplier")
    // The max filter keeps >= 1 supplier by construction.
    assert(ours.count() >= 1)
  }

  test("promoShare months partition the join: shares in [0,100], exact sums") {
    registerTables()
    val ours = Relational.promoShare(
      Tables.table(spark, sf(), "lineitem"), Tables.table(spark, sf(), "part"))
    import org.apache.spark.sql.functions._
    val bad = ours.filter(col("promo_pct") < 0 || col("promo_pct") > 100 ||
      col("promo_revenue") > col("total_revenue")).count()
    assert(bad == 0)
    // Month totals must re-sum to the unpartitioned total (2dp grid).
    val total = ours.agg(round(sum(col("total_revenue")), 2)).head.getDouble(0)
    val direct = spark.sql("""
      SELECT CAST(round(sum(CAST(round(mrev, 2) AS DOUBLE)), 2) AS DOUBLE) FROM (
        SELECT sum(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(18,6))) AS mrev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY date_trunc('MONTH', l_shipdate))""").head.getDouble(0)
    assert(math.abs(total - direct) < 1e-6, s"$total vs $direct")
  }

  test("priorityReturns equals the EXISTS correlated form") {
    registerTables()
    val ours = Relational.priorityReturns(
      Tables.table(spark, sf(), "orders"), Tables.table(spark, sf(), "lineitem"))
    val naive = spark.sql("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      GROUP BY o_orderpriority""")
    assertSameRows(ours, naive, "q_priority_returns")
  }

  test("idleCustomers equals the NOT EXISTS + scalar-avg correlated form") {
    registerTables()
    val ours = Relational.idleCustomers(
      Tables.table(spark, sf(), "customer"), Tables.table(spark, sf(), "orders"),
      Tables.table(spark, sf(), "nation"))
    val naive = spark.sql("""
      SELECT n_name, count(*) AS n_custs,
        CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
      FROM customer c JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(CAST(c_acctbal AS DECIMAL(18,6)) AS DOUBLE) >
          CAST((SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer
                WHERE c_acctbal > 0) AS DOUBLE) /
          CAST((SELECT count(*) FROM customer WHERE c_acctbal > 0) AS DOUBLE)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY n_name""")
    assertSameRows(ours, naive, "q_idle_customers")
    assert(ours.count() > 0, "lapsed-customer screen must select rows")
  }

  test("returnedLosses top-20 is the head of the full ranking") {
    registerTables()
    val li = Tables.table(spark, sf(), "lineitem")
    val ours = Relational.returnedLosses(
      Tables.table(spark, sf(), "customer"), Tables.table(spark, sf(), "orders"),
      li, Tables.table(spark, sf(), "nation"))
    val full = Relational.returnedLosses(
      Tables.table(spark, sf(), "customer"), Tables.table(spark, sf(), "orders"),
      li, Tables.table(spark, sf(), "nation"), k = 1000000)
    assert(ours.count() <= 20)
    assertSameRows(ours, full.limit(ours.count().toInt), "q_returned_losses head")
  }

  test("orderCountDistribution equals the textbook ON-clause outer join") {
    registerTables()
    // The Scaladoc claims pre-filtering orders before the LEFT OUTER
    // join is exactly the ON-clause semantics of TPC-H Q13's textbook
    // form (the predicate lives on the right side only). Gate it.
    val ours = Relational.orderCountDistribution(
      Tables.table(spark, sf(), "customer"), Tables.table(spark, sf(), "orders"))
    val naive = spark.sql("""
      SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c LEFT OUTER JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey)
      GROUP BY c_count""")
    assertSameRows(ours, naive, "q_order_count_dist")
  }

  test("disjunctiveRevenue equals the single OR-predicate SQL text") {
    registerTables()
    // The Scaladoc claims the branch OR (spanning both join sides)
    // survives as ONE residual predicate with the same semantics a
    // user's WHERE clause has. Gate result equality with the raw text.
    val ours = Relational.disjunctiveRevenue(
      Tables.table(spark, sf(), "lineitem"), Tables.table(spark, sf(), "part"))
    val naive = spark.sql("""
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
          AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
      GROUP BY p_brand""")
    assertSameRows(ours, naive, "q_disjunctive_revenue")
  }
}
