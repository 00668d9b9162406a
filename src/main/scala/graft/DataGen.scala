package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: derives an sf(N×) dataset from an
  * existing driver-generated sf directory so the full oracle suite and
  * bench can run at 10× without touching the read-only test data.
  *
  * `runMain graft.DataGen <srcDir> <dstDir> [factor=10]`
  *
  * Scaling model (mirrors TPC-H-style SF semantics):
  * - `region`/`nation` are fixed dimensions — copied verbatim.
  * - Fact/dim tables are replicated `factor`× with per-replica key
  *   offsets of stride = max(source key)+1, so FK joins stay consistent
  *   within each replica and key spaces never collide.
  * - `orders`/`lineitem` keep their date columns (classic SF scaling:
  *   same date range, more rows — date-filtered queries scale linearly
  *   in matched rows).
  * - `events` shifts each replica's timestamps by the source's span
  *   rounded up to the 5-min bar grid, so the tick series EXTENDS in
  *   time: bars / indicator windows / gap-fill grids scale ~linearly
  *   instead of stacking 10 ticks on the same bar (and the gap-fill
  *   grid stays tight — replicas tile the axis with no multi-month
  *   holes to fill). Written as micros timestamps (both engines
  *   truncate nanos→micros identically; Tables.events handles either
  *   physical type).
  * - `documents` replicas get a deterministic content-seeded word
  *   shuffle: token multiset (and so n_chars, token counts, quality
  *   ratios) is preserved while 5-gram shingles are destroyed, so
  *   replicas are NEW documents to the near-dup operators rather than
  *   10× planted duplicates. Seeding by md5(text) — not doc_id — means
  *   exact-duplicate groups shuffle identically within a replica, so
  *   the planted exact-dup *rate* is preserved across scale.
  * - `embeddings` replicas are unit-renormalized jittered copies
  *   (deterministic hash-uniform noise, ~0.8 expected cosine to the
  *   original): same manifold, new points; the bounded query set
  *   (vec_id < QueryCount) stays the original 16 vectors.
  */
object DataGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-datagen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val reps = broadcast(spark.range(factor).select(col("id").as("rep")))
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // Fixed dimensions: verbatim.
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    val customer = spark.read.parquet(s"$src/customer.parquet")
    val supplier = spark.read.parquet(s"$src/supplier.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val custS = stride(customer, "c_custkey")
    val suppS = stride(supplier, "s_suppkey")
    val partS = stride(part, "p_partkey")
    val ordS = stride(orders, "o_orderkey")

    write(customer.crossJoin(reps)
      .withColumn("c_custkey", col("c_custkey") + col("rep") * custS)
      .drop("rep"), "customer", 4)
    write(supplier.crossJoin(reps)
      .withColumn("s_suppkey", col("s_suppkey") + col("rep") * suppS)
      .drop("rep"), "supplier", 1)
    write(part.crossJoin(reps)
      .withColumn("p_partkey", col("p_partkey") + col("rep") * partS)
      .drop("rep"), "part", 4)
    write(orders.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * ordS)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * custS)
      .drop("rep"), "orders", 8)
    write(lineitem.crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * ordS)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * partS)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * suppS)
      .drop("rep"), "lineitem", 32)

    // events: replicas tile the time axis on 5-min boundaries; written
    // as micros. The driver's parquet has TIMESTAMP(NANOS) ts read as a
    // nanosecond long (nanosAsLong); DataGen's own output is a real
    // micros timestamp — normalize to the ns long so scale-ups chain
    // (sf0.1 → sf1.0 → sf10) instead of throwing on the span math.
    val eventsRaw = spark.read.parquet(s"$src/events.parquet")
    val events = eventsRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => eventsRaw
      // TIMESTAMP_NTZ needs an explicit hop through TIMESTAMP before
      // unix_micros; the UTC session makes the reinterpretation exact.
      case org.apache.spark.sql.types.TimestampNTZType =>
        eventsRaw.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case _ => eventsRaw.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    }
    val evS = stride(events, "event_id")
    val userS = stride(events, "user_id")
    val Row5 = 300000000000L // 5 min in ns
    val span = events.agg(max(col("ts")) - min(col("ts"))).head().getLong(0)
    val shiftNs = ((span / Row5) + 2) * Row5
    write(events.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * evS)
      .withColumn("user_id", col("user_id") + col("rep") * userS)
      .withColumn("ts", expr(s"timestamp_micros((ts + rep * ${shiftNs}L) div 1000)"))
      .drop("rep"), "events", 8)

    // documents: content-seeded word shuffle for rep>0. array_sort on
    // (hash, idx, word) structs is a deterministic permutation; split
    // and join on single spaces are exact inverses modulo order, so
    // n_chars is preserved.
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val docS = stride(documents, "doc_id")
    write(documents.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * docS)
      .withColumn("text", when(col("rep") === 0, col("text")).otherwise(
        expr("""array_join(transform(array_sort(transform(split(text, ' '),
          (w, i) -> struct(xxhash64(concat_ws('|', md5(text), rep, i)) AS h,
                           i AS i, w AS w))), s -> s.w), ' ')""")))
      .drop("rep"), "documents", 8)

    // embeddings: jitter + renormalize for rep>0 (float32 output like
    // the source); noise u ∈ [-1,1] from a hash — fully deterministic.
    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val vecS = stride(embeddings, "vec_id")
    write(embeddings.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * vecS)
      .withColumn("embedding", when(col("rep") === 0, col("embedding")).otherwise(
        expr("""transform(embedding, (x, j) -> x +
          cast(1.2 / sqrt(size(embedding)) *
            (pmod(xxhash64(concat_ws('|', vec_id, rep, j)), 2000001) / 1000000.0 - 1.0)
            as float))""")))
      .withColumn("embedding", when(col("rep") === 0, col("embedding")).otherwise(
        expr("""transform(embedding, x -> cast(x /
          sqrt(aggregate(embedding, cast(0.0 as double), (a, y) -> a + y * y))
          as float))""")))
      .drop("rep"), "embeddings", 4)

    val counts = Tables.All.map { t =>
      t -> spark.read.parquet(s"$dst/$t.parquet").count()
    }
    println(counts.map { case (t, n) => s"$t=$n" }.mkString("GENERATED ", " ", ""))
    spark.stop()
  }
}
