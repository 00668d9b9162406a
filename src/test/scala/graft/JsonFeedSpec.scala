package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamPipelines

class JsonFeedSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("JSON feed round trip is lossless incl. microsecond ts and nested props") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00.000123"), 7L, "click", 10.25, """{"k": 42}"""),
      (2L, ts("2024-01-01 10:00:00.999999"), 8L, "view", -0.5, """{"k": 0}"""))
    val back = StreamPipelines.parseJsonFeed(
      StreamPipelines.toJsonFeed(ev(rows))).orderBy("event_id").collect()
    assert(back.map(r => (r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
      r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
      r.getAs[Double]("value"), r.getAs[String]("props"))).toSeq === rows)
  }

  test("malformed message parses to an all-NULL row instead of failing") {
    import spark.implicits._
    val msgs = Seq("""{"event_id": 1, "event_type": "click"""", "not json")
      .toDF("msg")
    val out = StreamPipelines.parseJsonFeed(msgs).collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(0)))
  }

  test("streaming props window agg matches the batch result on the same data") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, "A", 10.0, """{"k": 3}"""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "A", 20.0, """{"k": 4}"""),
      (3L, ts("2024-01-01 10:12:00"), 1L, "A", 30.0, """{"nope": 1}"""),
      (4L, ts("2024-01-01 10:03:00"), 2L, "B", 5.0, """{"k": 9}"""))
    val msgs = StreamPipelines.toJsonFeed(ev(rows))
      .collect().map(_.getString(0)).toSeq

    val mem = MemoryStream[String]
    val q = StreamPipelines.propsWindowAggStream(mem.toDF().toDF("msg"))
      .writeStream.outputMode("append").format("memory").queryName("props_out")
      .start()
    // a malformed message must be dropped at the parse boundary, not
    // pinned as an unevictable NULL-window state entry
    mem.addData(msgs :+ "not json": _*)
    q.processAllAvailable()
    // advance the watermark past all windows so append mode emits them
    mem.addData(StreamPipelines.toJsonFeed(ev(Seq(
      (99L, ts("2024-01-01 12:00:00"), 9L, "Z", 0.0, "{}")))).collect()(0).getString(0))
    q.processAllAvailable()
    mem.addData(StreamPipelines.toJsonFeed(ev(Seq(
      (100L, ts("2024-01-01 13:00:00"), 9L, "Z", 0.0, "{}")))).collect()(0).getString(0))
    q.processAllAvailable(); q.stop()

    def shape(df: DataFrame) = df
      .filter(col("event_type").isin("A", "B"))
      .orderBy("win_start", "event_type")
      .collect().map(r => (r.getAs[Timestamp]("win_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        if (r.isNullAt(r.fieldIndex("sum_k"))) -1L else r.getAs[Long]("sum_k"),
        r.getAs[Double]("sum_value")))
    val streamed = shape(spark.table("props_out"))
    val batch = shape(StreamPipelines.propsWindowAgg(ev(rows)))
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.toSeq === Seq(
      ("2024-01-01 10:00:00.0", "A", 2L, 7L, 30.0),
      ("2024-01-01 10:00:00.0", "B", 1L, 9L, 5.0),
      ("2024-01-01 10:10:00.0", "A", 1L, -1L, 30.0)))
  }
}
