package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The driver's data drops have changed `events.ts`'s physical parquet
  * type twice (TIMESTAMP(NANOS) → TIMESTAMP_NTZ); each change silently
  * broke every events-family query until the loader learned the variant.
  * This spec freezes the contract: whatever the generator writes,
  * `Tables.events` / `Tables.eventsFrom` deliver identical session-UTC
  * TIMESTAMP values with the time-bound predicate still applied on the
  * raw column (scan-pushable).
  */
class TablesSchemaDriftSpec extends SparkSpec {

  // one event per 5-min bar slot, sub-millisecond digits included
  private val micros = Seq(
    "2024-01-01 10:00:00.000123",
    "2024-01-01 10:05:00.999999",
    "2024-01-01 10:10:01.5",
    "2024-01-02 09:30:00.0").map(s => Timestamp.valueOf(s))

  private def writeVariant(dir: String, variant: String): Unit = {
    import spark.implicits._
    val base = micros.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, i.toLong % 3, if (i % 2 == 0) "click" else "view",
        1.0 + i, s"""{"k": $i}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = variant match {
      case "ntz" => base.withColumn("ts", col("ts").cast(TimestampNTZType))
      case "nanos_long" =>
        // what nanosAsLong reads from TIMESTAMP(NANOS): epoch nanos as long
        base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case "timestamp" => base
    }
    out.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), expr("unix_micros(ts)"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("events loader yields identical UTC timestamps for all three physical variants") {
    val expected = micros.zipWithIndex.map { case (t, i) =>
      (i.toLong, t.getTime * 1000 + (t.getNanos / 1000) % 1000)
    }
    for (v <- Seq("ntz", "nanos_long", "timestamp")) {
      val dir = Files.createTempDirectory(s"drift_$v").toString
      writeVariant(dir, v)
      val got = loadedMicros(Tables.events(spark, dir))
      assert(got === expected, s"variant=$v")
      assert(Tables.events(spark, dir).schema("ts").dataType === TimestampType,
        s"variant=$v must normalize to TIMESTAMP")
    }
  }

  test("eventsFrom applies the bound identically across variants") {
    for (v <- Seq("ntz", "nanos_long", "timestamp")) {
      val dir = Files.createTempDirectory(s"driftf_$v").toString
      writeVariant(dir, v)
      val got = Tables.eventsFrom(spark, dir, "2024-01-01 10:05:00")
        .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
      assert(got === Seq(1L, 2L, 3L), s"variant=$v")
    }
  }
}
