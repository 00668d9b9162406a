package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * decoded per-partition in batches.
  *
  * The image/audio codecs aren't available in this environment, so the
  * decoder is a clearly-marked deterministic stub — but the Spark-side
  * plumbing is real: a typed Dataset, `mapPartitions` batch processing
  * (the Scala analogue of `mapInPandas` batch UDFs), an explicit output
  * schema, and formulas reproducible by the oracle so the whole path is
  * correctness-gated.
  *
  * Scale notes: mapPartitions streams rows (no per-row task overhead, no
  * driver collection); a real decoder would slot into `decodeOne`
  * unchanged. Binary payloads stay columnar until the decode boundary.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, blob: Array[Byte])
  case class MediaMeta(doc_id: Long, fmt: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long, brightness: Double)

  /** STUB decoder: derives deterministic pseudo-metadata from the bytes.
    * A production build replaces the body with a real codec call; the
    * signature (bytes in, typed struct out) is the contract. */
  private def decodeOne(id: Long, b: Array[Byte]): MediaMeta = {
    val len = b.length.toLong
    val fmt = (len % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    val width = 16 + (len % 64)
    val height = 16 + ((len / 7) % 64)
    val frames = if (fmt == "video") 1 + ((b(0) & 0xff) % 8).toLong else 1L
    var s = 0
    var i = 0
    while (i < 16 && i < b.length) { s += b(i) & 0xff; i += 1 }
    MediaMeta(id, fmt, len, width, height, frames, s / 16.0)
  }

  /** Frame sampling: one row per decoded frame with a deterministic
    * per-frame feature (a real decoder slots into the same shape — the
    * explode keeps frames columnar and partition-local, no shuffle).
    * Frame feature stub: first-byte rolling mix with the frame index. */
  def sampleFrames(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val len = octet_length(col("text")).cast("long")
    val frames = when(len % 3 === 2,
      lit(1L) + pmod(ascii(substring(col("text"), 1, 1)).cast("long"), lit(8L)))
      .otherwise(lit(1L))
    docs.select(col("doc_id"), len.as("byte_len"), frames.as("n_frames"))
      .select(col("doc_id"), col("byte_len"),
        explode(sequence(lit(1L), col("n_frames"))).as("frame_idx"))
      .withColumn("frame_feature",
        pmod(col("byte_len") * 31 + col("frame_idx") * 7, lit(1000L)))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Per-format corpus statistics over the decoded metadata — the
    * "what's in this media corpus" rollup a multimodal curation run
    * starts with. Composes [[extractMeta]] (the typed decode boundary)
    * with a plain aggregate; dims/bytes sum as exact integers and
    * brightness (a dyadic 1/16-step stub value) sums in DECIMAL, so
    * the averages are engine-exact integer/decimal ratios. */
  def mediaStats(docs: DataFrame): DataFrame = {
    val meta = extractMeta(docs)
    meta.groupBy(col("fmt"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("byte_len")).as("total_bytes"),
        round(sum(col("width")).cast("double") / count(lit(1)) + lit(5e-9), 4)
          .as("avg_width"),
        round(sum(col("height")).cast("double") / count(lit(1)) + lit(5e-9), 4)
          .as("avg_height"),
        sum(col("n_frames")).as("total_frames"),
        round(sum(col("brightness").cast("decimal(18,6)")).cast("double")
          / count(lit(1)) + lit(5e-9), 4).as("avg_brightness"))
      .orderBy(col("fmt"))
  }

  /** Batch decode over a binary column (documents.text cast to bytes
    * stands in for real image/audio payloads in the test data). */
  def extractMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[MediaIn] = docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaIn]
    in.mapPartitions(_.map(r => decodeOne(r.doc_id, r.blob)))
      .toDF()
      .orderBy(col("doc_id"))
  }
}
