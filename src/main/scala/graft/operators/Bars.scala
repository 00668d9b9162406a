package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tick → 5-minute OHLCV bar resample.
  *
  * The reference ingests 5-min OHLCV bars per symbol
  * (reference src/ingestion/stocks_pipeline.py:138-175); we derive the
  * same bars from the tick-level `events` table (`event_type` ≡ symbol,
  * `value` ≡ trade price, one row ≡ one tick).
  *
  * Scale notes: one hash-partitioned aggregate on (symbol, bucket) with
  * map-side partial aggregation; key cardinality is symbols × buckets so
  * there is no skew, and the groupBy output is already partitioned for
  * the downstream per-symbol window pipelines.
  */
object Bars {
  /** 5 minutes in microseconds; bucket floor is exact integer math so the
    * DuckDB oracle (`epoch_us(ts) // 300000000`) lands on identical bars. */
  val BucketMicros: Long = 300000000L

  def ohlcv(events: DataFrame): DataFrame =
    events
      .withColumn("bar_ts",
        expr(s"timestamp_micros((unix_micros(ts) div $BucketMicros) * $BucketMicros)"))
      .groupBy(col("event_type").as("symbol"), col("bar_ts"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("volume"),
        sum(col("value")).as("vsum"))
}
