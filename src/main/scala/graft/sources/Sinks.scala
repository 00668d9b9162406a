package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks mirroring the reference's storage layer.
  *
  * The reference dual-writes every batch: raw JSON/CSV to GCS plus raw
  * and processed BigQuery tables (reference
  * src/preprocessing/data_preprocessor.py:90-118 `save_raw_csv`,
  * src/loader/bigquery_loader.py:62-113 dual schemas). Spark-first, that
  * is partitioned columnar output: raw events partitioned by symbol,
  * processed bars partitioned by symbol (hive-style directories prune at
  * read time), with CSV/JSON escape hatches for interchange.
  */
object Sinks {

  /** Dual raw/processed write, both hive-partitioned by symbol. */
  def dualWrite(events: DataFrame, bars: DataFrame, outDir: String): Unit = {
    events.write.mode(SaveMode.Overwrite)
      .partitionBy("event_type").parquet(s"$outDir/raw")
    bars.withColumn("bar_date", to_date(col("bar_ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("symbol").parquet(s"$outDir/processed")
  }

  /** Raw CSV archive (header, ISO timestamps) — save_raw_csv analogue. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  /** JSON-lines archive — the Pub/Sub message shape. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Columnar ORC archive — the second built-in columnar interchange
    * format (some warehouse stacks are ORC-native); same predicate/
    * column pushdown behavior as parquet through the v1 ORC source. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Size-targeted parquet write: repartition so each output file holds
    * ~`rowsPerFile` rows. THE small-files control at scale — a 1000-task
    * job writing a 1 GB table otherwise leaves 1000 tiny files whose
    * open/footer cost dominates every later scan; conversely one task
    * writing 1 TB stalls the job. Callers size `rowsPerFile` from the
    * row width (target ≈128-512 MB per file). Requires one count() of
    * the input — at scale pass a known `totalRows` to skip it. */
  def writeSized(df: DataFrame, path: String, rowsPerFile: Long,
      totalRows: Long = -1L): Unit = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val n = if (totalRows >= 0) totalRows else df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Range-clustered parquet write: repartitionByRange on `cols` +
    * sortWithinPartitions, so each output file covers a disjoint key
    * range and its parquet min/max footer stats prune whole files for
    * key-range scans (poor-man's Z-order for a single sort axis — the
    * standard layout for time-series tables like bars(symbol, ts)). */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
      cols: String*): Unit = {
    val cs = cols.map(col)
    df.repartitionByRange(nFiles, cs: _*)
      .sortWithinPartitions(cs: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
