package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SemiStructured

class SemiStructuredSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, typ, v, props) =>
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, typ, v, props)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("propsExtract: typed k, NULL on missing key or malformed JSON") {
    val df = ev(Seq(
      (1L, "click", 1.0, """{"k": 42}"""),
      (2L, "click", 1.0, """{"other": 9}"""),
      (3L, "click", 1.0, """not json"""),
      (4L, "view", 1.0, """{"k": 0}""")))
    val out = SemiStructured.propsExtract(df).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out(0).getAs[Long]("k") === 42L)
    assert(out(1).isNullAt(out(1).fieldIndex("k")))
    assert(out(2).isNullAt(out(2).fieldIndex("k")))
    assert(out(3).getAs[Long]("k") === 0L)
  }

  test("propsAgg: NULL k excluded from avg/distinct but not from n_events") {
    val df = ev(Seq(
      (1L, "click", 2.0, """{"k": 10}"""),
      (2L, "click", 3.0, """{"k": 20}"""),
      (3L, "click", 5.0, """{}""")))
    val r = SemiStructured.propsAgg(df).collect()(0)
    assert(r.getAs[Long]("n_events") === 3L)
    assert(r.getAs[Long]("n_k") === 2L)
    assert(r.getAs[Double]("avg_k") === 15.0)
    assert(r.getAs[Double]("sum_value") === 10.0)
  }

  test("propsHist: integer-div bucketing, NULL k rows dropped") {
    val df = ev(Seq(
      (1L, "click", 1.0, """{"k": 9}"""),
      (2L, "click", 3.0, """{"k": 10}"""),
      (3L, "click", 5.0, """{"k": 19}"""),
      (4L, "click", 7.0, """{"nope": 1}""")))
    val out = SemiStructured.propsHist(df).collect()
    assert(out.map(r => (r.getAs[Long]("k_bucket"), r.getAs[Long]("n"))).toSeq ===
      Seq((0L, 1L), (1L, 2L)))
    assert(out(1).getAs[Double]("avg_value") === 4.0)
  }

  test("propsTopValues: rank caps at 3 per type with deterministic ties") {
    val rows = Seq.tabulate(10)(i =>
      (i.toLong, "click", 1.0, s"""{"k": ${i % 4}}""")) ++ // k=0,1: 3×; k=2,3: 2×
      Seq((100L, "view", 1.0, """{"k": 5}"""))
    val out = SemiStructured.propsTopValues(ev(rows)).collect()
    val click = out.filter(_.getAs[String]("event_type") == "click")
    assert(click.length === 3)
    // counts: k=0→3, k=1→3, k=2→2 (k=3 ties k=2 but loses on k asc)
    assert(click.map(r => (r.getAs[Long]("k"), r.getAs[Long]("n"), r.getAs[Long]("rnk"))).toSeq ===
      Seq((0L, 3L, 1L), (1L, 3L, 2L), (2L, 2L, 3L)))
    assert(out.count(_.getAs[String]("event_type") == "view") === 1)
  }
}
