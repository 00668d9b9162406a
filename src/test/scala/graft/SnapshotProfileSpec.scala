package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Temporal}

/** q_dim_snapshot (daily per-user state snapshots) and
  * q_cluster_sources (embedding-cluster × metadata rollup). */
class SnapshotProfileSpec extends SparkSpec {

  test("dimSnapshot equals the naive latest-event-per-day definition") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view"),
      (2L, "2024-01-01 11:00:00", 7L, "click"),    // later same day wins
      (3L, "2024-01-03 09:00:00", 7L, "purchase"), // gap day 2 carries click
      (4L, "2024-01-02 08:00:00", 9L, "view")      // user 9 starts day 2
    ).map { case (id, ts, u, et) =>
      (id, Timestamp.valueOf(ts), u, et, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Temporal.dimSnapshot(rows).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
    val want = Seq(
      (7L, "2024-01-01", "click"),
      (7L, "2024-01-02", "click"),
      (7L, "2024-01-03", "purchase"),
      (9L, "2024-01-02", "view"),
      (9L, "2024-01-03", "view")) // grid runs to the GLOBAL max day
    assert(got.toSeq == want)
  }

  test("dimSnapshot state is never null and grids are dense per user") {
    val ev = Tables.events(spark, sf())
    val snap = Temporal.dimSnapshot(ev)
    assert(snap.filter(col("state").isNull).count() == 0)
    // every user's row count == (global max day − user's first day) + 1
    val expect = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"))
      .crossJoin(ev.agg(max(to_date(col("ts"))).as("dmax")))
      .select(col("user_id"), (datediff(col("dmax"), col("d0")) + 1).as("n"))
    val gotCounts = snap.groupBy(col("user_id")).agg(count(lit(1)).as("m"))
    assert(expect.join(gotCounts, "user_id")
      .filter(col("n") =!= col("m")).count() == 0)
  }

  test("clusterSourceProfile partitions the joined corpus exactly once") {
    val e = Tables.embeddings(spark, sf())
    val d = Tables.documents(spark, sf())
    val prof = Similarity.clusterSourceProfile(e, d)
    val joined = e.select(col("vec_id"))
      .join(d.select(col("doc_id")), col("vec_id") === col("doc_id")).count()
    // every joined doc lands in exactly one (cell, source) bucket
    assert(prof.agg(sum(col("n_docs"))).head.getLong(0) == joined)
    assert(prof.filter(col("n_docs") <= 0 || col("n_langs") <= 0).count() == 0)
    // avg_chars is total/count at 4dp
    val bad = prof.filter(
      abs(col("avg_chars") - round(col("total_chars").cast("double") /
        col("n_docs").cast("double") + lit(5e-9), 4)) > lit(1e-9)).count()
    assert(bad == 0)
  }
}
