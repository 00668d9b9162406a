package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row whose
  * timestamp is at-or-before the left timestamp, per key.
  *
  * Spark has no ASOF JOIN operator; a naive range join degenerates to a
  * broadcast-nested-loop. This implementation composes built-ins (option
  * (a) in the custom-operator preference order): tag both sides, union,
  * and take a running `last(ignoreNulls)` over a single per-key
  * event-time sort — one shuffle, O(n log n) in the partition sort, no
  * quadratic pair space. Ties (right row exactly at the left timestamp)
  * sort before the left row, matching ASOF `>=` semantics; the DuckDB
  * oracle is a literal `ASOF LEFT JOIN`.
  *
  * Scale notes: the union shuffles once on the key; skewed keys can reuse
  * Skew.saltedJoin-style banding by (key, coarse time) with boundary
  * carry-over if a single key outgrows a partition.
  */
object AsofJoin {

  /** Each event joined to the latest 5-min bar (of the same symbol)
    * whose bar start is at-or-before the event. */
  def eventsToLastBar(events: DataFrame, bars: DataFrame): DataFrame = {
    val b = bars.select(col("symbol"), col("bar_ts").as("ts"),
      lit(1).as("is_bar"), col("close"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val e = events.select(col("event_type").as("symbol"), col("ts"),
      lit(0).as("is_bar"), lit(null).cast("double").as("close"),
      col("event_id"), col("value"))
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("ts"), col("is_bar").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    b.unionByName(e)
      .withColumn("last_bar_close", last(col("close"), ignoreNulls = true).over(w))
      .filter(col("is_bar") === 0)
      .select(col("symbol"), col("event_id"), col("ts"), col("value"),
        col("last_bar_close"))
      .orderBy(col("event_id"))
  }
}
