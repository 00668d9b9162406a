package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Indicators, Relational, TextAnalysis, TrainingData}

/** Specs for the round-4 operator wave: finance analytics (drawdown,
  * fences, beta, daily returns, z-score), segment dedup, MinHash
  * calibration, novelty, stratified sampling, and the cluster report. */
class Round4OpsSpec extends SparkSpec {

  private def mkBars(rows: Seq[(String, String, Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (sym, ts, c, v) =>
      (sym, Timestamp.valueOf(ts), c, c, c, c, v, c) }
      .toDF("symbol", "bar_ts", "open", "high", "low", "close", "volume", "vsum")
  }

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("drawdown: peak is a running max and drawdown is 0 at each new peak") {
    val b = mkBars(Seq(
      ("A", "2024-01-01 10:00:00", 100.0, 1L),
      ("A", "2024-01-01 10:05:00", 80.0, 1L),
      ("A", "2024-01-01 10:10:00", 120.0, 1L),
      ("A", "2024-01-01 10:15:00", 90.0, 1L)))
    val out = Indicators.drawdown(b).collect()
    assert(out.map(_.getAs[Double]("peak")).toSeq === Seq(100.0, 100.0, 120.0, 120.0))
    assert(out.map(_.getAs[Double]("drawdown_pct")).toSeq === Seq(0.0, 20.0, 0.0, 25.0))
  }

  private def mkOhlc(rows: Seq[(String, String, Double, Double, Double, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (sym, ts, o, h, l, c) =>
      (sym, Timestamp.valueOf(ts), o, h, l, c, 1L, c) }
      .toDF("symbol", "bar_ts", "open", "high", "low", "close", "volume", "vsum")
  }

  test("donchian: channel tracks the 20-bar extrema, warmup is null-gated") {
    val b = mkBars((0 until 25).map(i =>
      ("A", f"2024-01-01 ${10 + i / 12}%02d:${(i % 12) * 5}%02d:00", 100.0 + i, 1L)))
    val out = Indicators.donchian(b).collect()
    assert(out.take(19).forall(_.isNullAt(out(0).fieldIndex("dc_upper"))))
    val last = out.last // bars 5..24 in window: close 105..124
    assert(last.getAs[Double]("dc_upper") === 124.0)
    assert(last.getAs[Double]("dc_lower") === 105.0)
    assert(last.getAs[Double]("dc_mid") === 114.5)
  }

  test("mfi: all-rising prices saturate at 100, all-falling at 0") {
    def series(step: Double) = (0 until 20).map(i =>
      ("A", f"2024-01-01 ${10 + i / 12}%02d:${(i % 12) * 5}%02d:00", 100.0 + step * i, 5L))
    val up = Indicators.mfi(mkBars(series(1.0))).collect()
    assert(up.take(14).forall(_.isNullAt(2)))
    assert(up.drop(14).forall(_.getAs[Double]("mfi") === 100.0))
    val down = Indicators.mfi(mkBars(series(-1.0))).collect()
    assert(down.drop(14).forall(_.getAs[Double]("mfi") === 0.0))
  }

  test("candlePatterns: planted doji, hammer, and engulfing pair") {
    val out = Indicators.candlePatterns(mkOhlc(Seq(
      ("A", "2024-01-01 10:00:00", 100.0, 105.0, 95.0, 100.2),  // doji: body .2, range 10
      ("A", "2024-01-01 10:05:00", 100.0, 101.6, 90.0, 101.5),  // hammer: lw 10, body 1.5, uw .1
      ("A", "2024-01-01 10:10:00", 102.0, 102.5, 97.5, 98.0),   // red candle
      ("A", "2024-01-01 10:15:00", 97.0, 103.5, 96.5, 103.0)))) // engulfs it (green)
      .collect()
    assert(out(0).getAs[Boolean]("is_doji"))
    assert(!out(1).getAs[Boolean]("is_doji"))
    assert(out(1).getAs[Boolean]("is_hammer"))
    assert(out(3).getAs[Boolean]("bull_engulf"))
    assert(!out(3).getAs[Boolean]("bear_engulf"))
    assert(!out(2).getAs[Boolean]("bull_engulf"))
  }

  test("pivotPoints: day-2 levels derive from day-1 H/L/C, day 1 omitted") {
    val out = Indicators.pivotPoints(mkOhlc(Seq(
      ("A", "2024-01-01 10:00:00", 100.0, 110.0, 90.0, 104.0),
      ("A", "2024-01-01 10:05:00", 104.0, 112.0, 95.0, 105.0), // day1: H=112 L=90 C=105
      ("A", "2024-01-02 10:00:00", 106.0, 108.0, 104.0, 107.0)))).collect()
    assert(out.length === 1) // day 1 has no prior day
    val r = out(0)
    val p = (112.0 + 90.0 + 105.0) / 3
    assert(math.abs(r.getAs[Double]("pivot") - p) < 1e-3)
    assert(math.abs(r.getAs[Double]("r1") - (2 * p - 90.0)) < 1e-3)
    assert(math.abs(r.getAs[Double]("s1") - (2 * p - 112.0)) < 1e-3)
    assert(math.abs(r.getAs[Double]("r2") - (p + 22.0)) < 1e-3)
    assert(math.abs(r.getAs[Double]("s2") - (p - 22.0)) < 1e-3)
  }

  test("iqrOutliers flags a planted extreme volume and nothing typical") {
    val typical = (0 until 20).map(i =>
      ("A", f"2024-01-01 10:${i}%02d:00", 10.0, 100L + (i % 5)))
    val b = mkBars(typical :+ ("A", "2024-01-01 11:00:00", 10.0, 100000L))
    val out = Indicators.iqrOutliers(b).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.map(_.getAs[Long]("volume")).toSeq === Seq(100000L))
  }

  test("marketBeta: a symbol tracking the index has beta near its share") {
    // two symbols with identical prices: index = 2x each, so
    // cov(x, 2x)/var(2x) = 1/2 exactly
    val rows = (0 until 10).flatMap { i =>
      val p = 100.0 + i
      Seq(("A", f"2024-01-01 10:${5 * i}%02d:00", p, 1L),
        ("B", f"2024-01-01 10:${5 * i}%02d:00", p, 1L))
    }
    val out = Indicators.marketBeta(mkBars(rows)).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Double]("beta") === 0.5))
  }

  test("dailyReturns: intraday return and overnight gap from first/last bars") {
    val b = mkBars(Seq(
      ("A", "2024-01-01 10:00:00", 100.0, 1L),
      ("A", "2024-01-01 15:00:00", 110.0, 1L),
      ("A", "2024-01-02 10:00:00", 99.0, 1L),
      ("A", "2024-01-02 15:00:00", 99.0, 1L)))
    val out = Indicators.dailyReturns(b).orderBy("bar_date").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("intraday_pct") === 10.0)
    assert(out(0).isNullAt(out(0).fieldIndex("overnight_gap_pct")))
    // gap: (99 - 110) / 110 * 100 = -10.0
    assert(out(1).getAs[Double]("overnight_gap_pct") === -10.0)
    assert(out(1).getAs[Double]("intraday_pct") === 0.0)
  }

  test("zscoreAnomaly flags only the planted spike") {
    val calm = (0 until 30).map(i =>
      ("A", f"2024-01-01 10:${i}%02d:00", 100.0 + (i % 3), 1L))
    val b = mkBars(calm :+ ("A", "2024-01-01 11:00:00", 500.0, 1L))
    val out = Indicators.zscoreAnomaly(b).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.map(_.getAs[Double]("close")).toSeq === Seq(500.0))
    assert(flagged.head.getAs[Double]("z") > 2.0)
  }

  test("segDedup removes cross-doc shared segments, keeps unique ones") {
    val boiler = (1 to 10).map(i => s"common$i").mkString(" ")
    val d = docs(Seq(
      (1L, boiler + " " + (1 to 10).map(i => s"one$i").mkString(" ")),
      (2L, boiler + " " + (1 to 10).map(i => s"two$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"three$i").mkString(" "))))
    val out = Dedup.segDedup(d).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_seg")).toSeq === Seq(2L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_shared_seg")).toSeq === Seq(1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("kept_words")).toSeq === Seq(10L, 10L, 20L))
    // doc 3 keeps everything: cleaned text == original text
    val expected = spark.sql(
      s"SELECT md5('${(1 to 20).map(i => s"three$i").mkString(" ")}') AS m")
      .head().getString(0)
    assert(out(2).getAs[String]("clean_md5") === expected)
  }

  test("minhashEstimate: identical docs estimate and measure jaccard 1.0") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"x$i").mkString(" ")
    val d = docs(Seq((1L, text), (2L, text), (3L, other)))
    val out = Dedup.minhashEstimate(d).collect()
    val pair = out.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L).get
    assert(pair.getAs[Long]("sig_matches") === 64L)
    assert(pair.getAs[Double]("est_jaccard") === 1.0)
    assert(pair.getAs[Double]("jaccard") === 1.0)
    assert(pair.getAs[Double]("abs_err") === 0.0)
  }

  test("ngramNovelty: the earliest doc is fully novel, a copy fully redundant") {
    val text = (1 to 20).map(i => s"n$i").mkString(" ")
    val d = docs(Seq((1L, text), (2L, text)))
    val out = TextAnalysis.ngramNovelty(d).orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("novelty") === 1.0)
    assert(out(1).getAs[Double]("novelty") === 0.0)
  }

  test("stratifiedSample keeps exactly ceil(n/5) docs per stratum") {
    import spark.implicits._
    val d = (1 to 37).map(i => (i.toLong, s"text $i", if (i % 2 == 0) "en" else "de",
      s"src${i % 3}", 6L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.stratifiedSample(d)
    val got = out.groupBy("source", "lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val want = d.groupBy("source", "lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2) + 4) / 5)).toMap
    assert(got === want)
    // deterministic: same result on a second run
    assert(out.collect().toSeq === TextAnalysis.stratifiedSample(d).collect().toSeq)
  }

  test("clusterStats histogram is consistent with dedupClusters") {
    val d = Tables.documents(spark, sf())
    val clusters = Dedup.dedupClusters(d)
    val stats = Dedup.clusterStats(d).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum === clusters.count())
    val singles = stats.find(_.getAs[Long]("cluster_size") === 1L).get
    assert(singles.getAs[Long]("n_removed") === 0L)
    // every non-canonical doc in a 2+-cluster is counted as removed
    val removed = clusters.filter(!col("is_canonical")).count()
    assert(stats.map(_.getAs[Long]("n_removed")).sum === removed)
  }

  test("tokenHist buckets partition the corpus") {
    val d = Tables.documents(spark, sf())
    val hist = TextAnalysis.tokenHist(d).collect()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === d.count())
    assert(hist.forall(r => r.getAs[Long]("bucket_lo") === r.getAs[Long]("bucket") * 16))
  }

  test("contamReport covers every benchmark doc with >=5 words") {
    val d = Tables.documents(spark, sf())
    val rep = TrainingData.contamReport(d)
    val nBench = d.filter(col("source") === "src0" &&
      size(split(trim(col("text")), "\\s+")) >= 5).count()
    assert(rep.count() === nBench)
    assert(rep.filter(col("overlap_frac") < 0 || col("overlap_frac") > 1).count() === 0)
  }

  test("shippingPriority: filters apply and top-k ranks by exact revenue") {
    import spark.implicits._
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val cut = Timestamp.valueOf("1998-06-01 00:00:00")
    val before = Timestamp.valueOf("1998-01-01 00:00:00")
    val after = Timestamp.valueOf("1998-12-01 00:00:00")
    val orders = Seq(
      (10L, 1L, before, "1-URGENT"),  // qualifies
      (11L, 1L, after, "2-HIGH"),     // order too late
      (12L, 2L, before, "3-MEDIUM"))  // wrong segment
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (10L, 100.0, 0.1, after),   // rev 90
      (10L, 50.0, 0.0, after),    // rev 50 -> order 10 total 140
      (10L, 999.0, 0.0, before),  // shipped before cutoff: excluded
      (11L, 500.0, 0.0, after), (12L, 500.0, 0.0, after))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    val out = Relational.shippingPriority(cust, orders, li).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("l_orderkey") === 10L)
    assert(out(0).getAs[Double]("revenue") === 140.0)
    assert(out(0).getAs[String]("o_orderpriority") === "1-URGENT")
  }

  private def mkEvents(rows: Seq[(Long, String, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, ts, uid, typ, v) =>
      (id, Timestamp.valueOf(ts), uid, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("attribution: window cap, same-ts ties, and unattributed purchases") {
    val out = Relational.attribution(mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", 7L, "click", 0.0),
      (2L, "2024-01-01 10:10:00", 7L, "purchase", 50.0),   // gap 10min -> click 1
      (3L, "2024-01-01 12:00:00", 7L, "purchase", 60.0),   // gap 110min -> void
      (4L, "2024-01-01 09:00:00", 8L, "purchase", 70.0),   // no click at all
      (5L, "2024-01-01 11:00:00", 9L, "click", 0.0),
      (6L, "2024-01-01 11:00:00", 9L, "click", 0.0),       // same ts: larger id wins
      (7L, "2024-01-01 11:00:00", 9L, "purchase", 80.0)))) // same-ts click counts, gap 0
      .collect().map(r => r.getAs[Long]("purchase_id") -> r).toMap
    assert(out(2L).getAs[Long]("attributed_click_id") === 1L)
    assert(out(2L).getAs[Long]("gap_us") === 600000000L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("attributed_click_id")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("attributed_click_id")))
    assert(out(7L).getAs[Long]("attributed_click_id") === 6L)
    assert(out(7L).getAs[Long]("gap_us") === 0L)
  }

  test("profileEvents counts nulls and distincts per column") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", Some(1.5), Some("{}")),
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 7L, "view", None, None),
      (3L, Timestamp.valueOf("2024-01-01 10:02:00"), 8L, "click", Some(1.5), Some("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.profileEvents(ev).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(out.keySet === Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(out("value").getAs[Long]("n_null") === 1L)
    assert(out("value").getAs[Long]("n_distinct") === 1L)
    assert(out("value").getAs[Double]("min_val") === 1.5)
    assert(out("user_id").getAs[Long]("n_distinct") === 2L)
    assert(out("event_type").isNullAt(out("event_type").fieldIndex("min_val")))
    assert(out("ts").getAs[Long]("n_nonnull") === 3L)
  }

  test("mediaStats is consistent with the per-doc decoded metadata") {
    import graft.operators.Multimodal
    val d = Tables.documents(spark, sf())
    val meta = Multimodal.extractMeta(d).collect()
    val stats = Multimodal.mediaStats(d).collect()
      .map(r => r.getAs[String]("fmt") -> r).toMap
    val byFmt = meta.groupBy(_.getAs[String]("fmt"))
    assert(stats.keySet === byFmt.keySet)
    byFmt.foreach { case (fmt, rows) =>
      assert(stats(fmt).getAs[Long]("n_docs") === rows.length.toLong)
      assert(stats(fmt).getAs[Long]("total_bytes") ===
        rows.map(_.getAs[Long]("byte_len")).sum)
      assert(stats(fmt).getAs[Long]("total_duration_ms") ===
        rows.map(_.getAs[Long]("duration_ms")).sum)
    }
  }

  test("mediaQuarantine: byte-derived verdicts cover every reason code") {
    import graft.operators.Multimodal
    val payload = Array.fill[Byte](300)(7)
    // clean containers validate ok
    assert(Multimodal.validateMedia(0L, Multimodal.encodeMedia(0L, payload))
      .status === "ok")
    assert(Multimodal.validateMedia(33L, Multimodal.encodeMedia(33L, payload))
      .status === "ok")
    // truncation: magic survives, header doesn't
    val tw = Multimodal.validateMedia(10L,
      Multimodal.corruptMedia(10L, Multimodal.encodeMedia(10L, payload)))
    assert(tw.fmt === "wav" && tw.reason === "truncated" && tw.byte_len === 20L)
    val tb = Multimodal.validateMedia(3L,
      Multimodal.corruptMedia(3L, Multimodal.encodeMedia(3L, payload)))
    assert(tb.fmt === "bmp" && tb.reason === "truncated")
    // flipped magic byte -> bad_magic/unknown
    val bm = Multimodal.validateMedia(5L,
      Multimodal.corruptMedia(5L, Multimodal.encodeMedia(5L, payload)))
    assert(bm.fmt === "unknown" && bm.reason === "bad_magic")
    // size_mismatch: declared size no longer matches actual (the branch
    // the deterministic corpus never exercises — a trailing garbage byte)
    val sw = Multimodal.validateMedia(0L,
      Multimodal.encodeMedia(0L, payload) :+ 0.toByte)
    assert(sw.fmt === "wav" && sw.reason === "size_mismatch")
    val sb = Multimodal.validateMedia(33L,
      Multimodal.encodeMedia(33L, payload) :+ 0.toByte)
    assert(sb.fmt === "bmp" && sb.reason === "size_mismatch")
    // RIFF container that is not WAVE -> bad_magic with the wav tag
    val riffOnly = Multimodal.encodeMedia(0L, payload).clone()
    riffOnly(8) = 'X'.toByte
    assert(Multimodal.validateMedia(0L, riffOnly).reason === "bad_magic")
    // corpus-level: quarantine set = exactly the ids the noise formulas hit
    val d = Tables.documents(spark, sf())
    val out = Multimodal.mediaQuarantine(d).collect()
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = if (id % 7 == 3) "truncated"
        else if (id % 7 == 5) "bad_magic" else "ok"
      assert(r.getAs[String]("reason") === expect, s"doc $id")
    }
  }

  test("parseMedia recovers WAV/BMP header fields from raw container bytes") {
    import graft.operators.Multimodal
    // hand-built canonical 8 kHz mono 16-bit WAV carrying 16000 sample
    // bytes = exactly 1000 ms; parser must read rate/channels from the
    // fmt chunk and duration from the parsed byte rate
    val payload = Array.fill[Byte](16000)(7)
    val wav = Multimodal.encodeMedia(0L, payload) // even id → WAV rate 8000 ch 1
    val m = Multimodal.parseMedia(0L, wav)
    assert(m.fmt === "wav" && m.sample_rate === 8000L && m.channels === 1L)
    assert(m.duration_ms === 1000L && m.byte_len === 44L + 16000L)
    // parser is a chunk WALK, not fixed offsets: inject an extra chunk
    // ("LIST", 4 bytes) between fmt and data — fields must still parse
    val (head, tail) = wav.splitAt(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val m2 = Multimodal.parseMedia(0L, head ++ listChunk ++ tail)
    assert(m2.sample_rate === 8000L && m2.duration_ms === 1000L)
    // BMP: width/height come from BITMAPINFOHEADER little-endian fields
    val bmp = Multimodal.encodeMedia(33L, Array.fill[Byte](300)(1)) // odd → BMP
    val b = Multimodal.parseMedia(33L, bmp)
    assert(b.fmt === "bmp" && b.width === (16 + 33 % 32).toLong)
    assert(b.height === (1 + 300 / (3 * (16 + 33 % 32))).toLong)
    // corrupt magic must degrade to an "unknown" row, not an exception
    assert(Multimodal.parseMedia(9L, Array[Byte](1, 2, 3)).fmt === "unknown")
    // a hostile 32-bit chunk size near 2^32 must terminate the walk —
    // Int arithmetic would wrap it negative and either spin forever
    // (advance of 0) or index out of bounds walking backwards
    val evil = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    assert(Multimodal.parseMedia(1L, evil).fmt === "wav")
    assert(Multimodal.parseMedia(1L, evil).duration_ms === 0L)
  }

  test("parseFrames derives frames from PARSED payload bounds and header stride") {
    import graft.operators.Multimodal
    def md5hex(bs: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bs)
        .map(x => f"$x%02x").mkString
    // doc_id 2 → WAV, channels = 2 (blockAlign 4) → stride 128; 300
    // payload bytes → 3 frames, tail frame 44 bytes
    val payload = Array.tabulate[Byte](300)(i => ((i * 7) % 251).toByte)
    val frames = Multimodal.parseFrames(2L, Multimodal.encodeMedia(2L, payload))
    assert(frames.map(_.fmt).distinct === Seq("wav"))
    assert(frames.length === 3)
    assert(frames.map(_.frame_len) === Seq(128L, 128L, 44L))
    assert(frames(1).frame_md5 === md5hex(payload.slice(128, 256)))
    assert(frames(2).frame_md5 === md5hex(payload.slice(256, 300)))
    assert(frames(2).frame_peak === payload.slice(256, 300).map(_ & 0xff).max.toLong)
    // stride must come from the WALKED fmt chunk, not a fixed offset:
    // an extra LIST chunk between fmt and data must not shift anything
    val wav = Multimodal.encodeMedia(2L, payload)
    val (head, tail) = wav.splitAt(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    assert(Multimodal.parseFrames(2L, head ++ listChunk ++ tail) === frames)
    // doc_id 33 → BMP width 17 → row stride 51; 300 bytes → 6 rows
    val bmpFrames = Multimodal.parseFrames(33L, Multimodal.encodeMedia(33L, payload))
    assert(bmpFrames.map(_.fmt).distinct === Seq("bmp"))
    assert(bmpFrames.length === 6)
    assert(bmpFrames.head.frame_len === 51L)
    assert(bmpFrames.head.frame_md5 === md5hex(payload.slice(0, 51)))
    assert(bmpFrames.last.frame_len === 300L - 5 * 51L)
    // corrupt magic → one whole-payload unknown frame, never a throw
    val u = Multimodal.parseFrames(9L, Array[Byte](1, 2, 3))
    assert(u.length === 1 && u.head.fmt === "unknown" && u.head.frame_len === 3L)
  }

  test("rfmSegments: quartile scores follow the planted metric order") {
    // 4 users with strictly increasing recency/frequency/monetary ->
    // each lands alone in its quartile, segment digits all equal
    val ev = (1L to 4L).flatMap { u =>
      (1L to u).map(i => (u * 100 + i, f"2024-01-0$u%d 10:0$i%d:00", u, "purchase", 10.0 * u))
    }
    val out = Relational.rfmSegments(mkEvents(ev)).collect()
    assert(out.length === 4)
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("r_score") === u)
      assert(r.getAs[Long]("f_score") === u)
      assert(r.getAs[Long]("m_score") === u)
      assert(r.getAs[String]("segment") === s"$u$u$u")
    }
  }

  test("eventTransitions counts consecutive pairs per user with exact fractions") {
    val out = Relational.eventTransitions(mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 7L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 7L, "view", 0.0),
      (4L, "2024-01-01 10:03:00", 7L, "click", 0.0),
      (5L, "2024-01-01 10:04:00", 7L, "purchase", 0.0),
      (6L, "2024-01-01 10:00:00", 8L, "view", 0.0)))).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) -> r).toMap
    assert(out(("view", "click")).getAs[Long]("n") === 2L)
    assert(out(("view", "click")).getAs[Double]("frac") === 1.0)
    assert(out(("click", "view")).getAs[Long]("n") === 1L)
    assert(out(("click", "view")).getAs[Double]("frac") === 0.5)
    assert(out(("click", "purchase")).getAs[Double]("frac") === 0.5)
    assert(!out.contains(("purchase", "view"))) // different users never chain
  }

  test("swingPoints flags strict local extrema only") {
    val closes = Seq(100.0, 105.0, 102.0, 102.0, 108.0, 101.0)
    val b = mkBars(closes.zipWithIndex.map { case (c, i) =>
      ("A", f"2024-01-01 10:${5 * i}%02d:00", c, 1L) })
    val out = Indicators.swingPoints(b).collect()
    // bar1 (105) swing high; bars 2,3 are a flat pair (not strict); bar4 high
    assert(out.map(_.getAs[Double]("close")).toSeq === Seq(105.0, 108.0))
    assert(out.forall(_.getAs[Boolean]("swing_high")))
  }

  test("upStreaks: longest run and 3+ run count on a planted series") {
    // closes: up,up,up | down | up | down -> longest 3, one 3+ run
    val closes = Seq(100.0, 101.0, 102.0, 103.0, 99.0, 100.0, 98.0)
    val b = mkBars(closes.zipWithIndex.map { case (c, i) =>
      ("A", f"2024-01-01 10:${5 * i}%02d:00", c, 1L) } ++
      // a symbol with NO rising close must still report a (0, 0) row
      Seq(("B", "2024-01-01 10:00:00", 50.0, 1L),
        ("B", "2024-01-01 10:05:00", 49.0, 1L)))
    val out = Indicators.upStreaks(b).collect()
      .map(r => r.getAs[String]("symbol") -> r).toMap
    assert(out("A").getAs[Long]("longest_up_run") === 3L)
    assert(out("A").getAs[Long]("n_runs_3plus") === 1L)
    assert(out("B").getAs[Long]("longest_up_run") === 0L)
    assert(out("B").getAs[Long]("n_runs_3plus") === 0L)
  }

  private def docsWithSource(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("lexicalDiversity: repetitive doc gini 0, all-distinct doc gini 0.75") {
    val out = TextAnalysis.lexicalDiversity(docs(Seq(
      1L -> "a a a a", 2L -> "a b c d"))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") === 4L)
    assert(out(1L).getAs[Long]("n_distinct") === 1L)
    assert(out(1L).getAs[Double]("ttr") === 0.25)
    assert(out(1L).getAs[Double]("gini") === 0.0)
    assert(out(2L).getAs[Double]("ttr") === 1.0)
    assert(out(2L).getAs[Double]("gini") === 0.75) // 1 - 4/16
  }

  test("dupRatioBySource attributes removals to the copy's source") {
    val out = Dedup.dupRatioBySource(docsWithSource(Seq(
      (1L, "original text here", "clean"),
      (2L, "original text here", "copies"),   // dup of 1 -> removed
      (3L, "Original TEXT here!", "copies"),  // normalizes equal -> removed
      (4L, "something fresh", "copies")))).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("clean").getAs[Long]("n_removed") === 0L)
    assert(out("clean").getAs[Double]("dup_frac") === 0.0)
    assert(out("copies").getAs[Long]("n_docs") === 3L)
    assert(out("copies").getAs[Long]("n_removed") === 2L)
  }

  test("crossSourceOverlap counts shared distinct 5-grams per source pair") {
    val shared = "alpha beta gamma delta epsilon"
    val out = Dedup.crossSourceOverlap(docsWithSource(Seq(
      (1L, shared + " one two three", "s1"),
      (2L, shared + " four five six", "s2"),
      (3L, "totally different words entirely here now", "s3")))).collect()
    val pair = out.find(r => r.getAs[String]("source_a") == "s1" &&
      r.getAs[String]("source_b") == "s2").get
    assert(pair.getAs[Long]("n_shared") === 1L) // only the shared 5-gram window
    // the operator emits only pairs that actually share n-grams, so s3
    // (no shared 5-gram with anyone) must not appear on either side
    assert(!out.exists(r => r.getAs[String]("source_a") == "s3" ||
      r.getAs[String]("source_b") == "s3"))
  }

  test("intradocRepeats: repeated span flagged, short docs report (0,0)") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = Dedup.intradocRepeats(docs(Seq(
      1L -> s"$span $span",            // 20 words: 11 windows, window 10 repeats window 0
      2L -> (1 to 12).map(i => s"u$i").mkString(" "), // 3 windows, no repeats
      3L -> "too short"))).collect()   // < 10 words: (0, 0)
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_windows") === 11L)
    assert(out(1L).getAs[Long]("n_repeats") === 1L) // only the exact re-occurrence
    assert(out(2L).getAs[Long]("n_repeats") === 0L)
    assert(out(3L).getAs[Long]("n_windows") === 0L)
    assert(out(3L).getAs[Double]("repeat_frac") === 0.0)
  }

  test("temperatureMix: sqrt weights flatten a 4:1 source skew to 2:1 rates") {
    import spark.implicits._
    val d = ((1L to 100L).map(i => (i, "small")) ++
      (101L to 500L).map(i => (i, "big")))
      .map { case (id, src) => (id, s"text $id", "en", src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // w(small)=10, w(big)=20 -> shares 1/3, 2/3; target 300:
    // rate(small) = 300*(1/3)/100 = 1.0, rate(big) = 300*(2/3)/400 = 0.5
    val out = TrainingData.temperatureMix(d, targetTotal = 300).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("small").forall(_.getAs[Double]("rate") === 1.0))
    assert(bySrc("big").forall(_.getAs[Double]("rate") === 0.5))
    assert(bySrc("small").forall(_.getAs[Boolean]("keep"))) // rate 1 keeps all
    val keptBig = bySrc("big").count(_.getAs[Boolean]("keep"))
    assert(keptBig > 0 && keptBig < 400) // md5 buckets < 50 only
  }

  test("packEfficiency is consistent with shardPack's packing") {
    val d = Tables.documents(spark, sf())
    val packs = TrainingData.packEfficiency(d).collect()
    val docsTotal = TrainingData.shardPack(d).agg(sum(col("tokens"))).head().getLong(0)
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum === docsTotal)
    packs.foreach { p =>
      assert(p.getAs[Double]("fill") > 0)
      assert(p.getAs[Long]("n_docs") > 0)
    }
  }

  test("invertedIndex: planted df/tf and capped ascending postings") {
    val out = TextAnalysis.invertedIndex(docs(Seq(
      1L -> "a b a", 2L -> "b c")), postK = 10).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    assert(out("a").getAs[Long]("df") === 1L)
    assert(out("a").getAs[Long]("total_tf") === 2L)
    assert(out("a").getAs[String]("postings") === "1")
    assert(out("b").getAs[Long]("df") === 2L)
    assert(out("b").getAs[String]("postings") === "1,2")
    assert(out("c").getAs[Long]("df") === 1L)
  }

  test("localSupplierVolume keeps only same-nation customer/supplier pairs") {
    import spark.implicits._
    val cust = Seq((1L, 10L)).toDF("c_custkey", "c_nationkey")
    val ord = Seq((100L, 1L, Timestamp.valueOf("1996-06-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (100L, 1L, 200.0, 0.0),  // supplier 1: nation 10 (local) -> rev 200
      (100L, 2L, 999.0, 0.0))  // supplier 2: nation 20 (remote) -> dropped
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((1L, 10L), (2L, 20L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10L, "N10", 1L), (20L, "N20", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((1L, "ASIA")).toDF("r_regionkey", "r_name")
    val out = Relational.localSupplierVolume(cust, ord, li, sup, nat, reg).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("n_name") === "N10")
    assert(out(0).getAs[Double]("revenue") === 200.0)
    assert(out(0).getAs[Long]("n_items") === 1L)
  }

  test("largeOrderCustomers: threshold filters on the exact quantity sum") {
    import spark.implicits._
    val li = Seq(
      (100L, 200.0), (100L, 60.0),  // order 100: 260 > 250
      (101L, 250.0),                // exactly 250: NOT > 250
      (102L, 300.0))                // qualifies
      .toDF("l_orderkey", "l_quantity")
    val ord = Seq(
      (100L, 1L, Timestamp.valueOf("1996-01-01 00:00:00"), 1000.0),
      (101L, 1L, Timestamp.valueOf("1996-01-02 00:00:00"), 2000.0),
      (102L, 1L, Timestamp.valueOf("1996-01-03 00:00:00"), 3000.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, "Customer#1")).toDF("c_custkey", "c_name")
    val out = Relational.largeOrderCustomers(cust, ord, li).collect()
    assert(out.map(_.getAs[Long]("o_orderkey")).toSeq === Seq(102L, 100L)) // by totalprice desc
    assert(out(1).getAs[Double]("sum_qty") === 260.0)
  }

  test("groupingSets: subtotal levels are consistent with the base level") {
    val li = Tables.lineitem(spark, sf())
    val out = Relational.groupingSetsQty(li).collect()
    val base = out.filter(r => r.getAs[Long]("g_rf") == 0 && r.getAs[Long]("g_ls") == 0)
    val byRf = out.filter(r => r.getAs[Long]("g_rf") == 0 && r.getAs[Long]("g_ls") == 1)
    // every returnflag subtotal equals the sum of its base-level counts
    byRf.foreach { sub =>
      val rf = sub.getAs[String]("l_returnflag")
      val n = base.filter(_.getAs[String]("l_returnflag") == rf)
        .map(_.getAs[Long]("n")).sum
      assert(sub.getAs[Long]("n") === n)
      assert(sub.isNullAt(sub.fieldIndex("l_linestatus")))
    }
    // and the (linestatus) level is present: three grouping sets total
    assert(out.exists(r => r.getAs[Long]("g_rf") == 1 && r.getAs[Long]("g_ls") == 0))
  }

  test("soleLateSupplier: hand-built Q21 cases (multi-supplier, sole-late, F-only)") {
    import spark.implicits._
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // order 1 (F): suppliers 10, 20; only 10 late      -> counts for 10
    // order 2 (F): suppliers 10, 20; both late          -> counts for none
    // order 3 (F): supplier 10 alone, late              -> no other supplier
    // order 4 (O): suppliers 10, 20; 10 late            -> wrong status
    // order 5 (F): suppliers 20, 30; only 20 late twice -> ONE order for 20
    val orders = Seq(
      (1L, "F", d("2024-01-01")), (2L, "F", d("2024-01-01")),
      (3L, "F", d("2024-01-01")), (4L, "O", d("2024-01-01")),
      (5L, "F", d("2024-01-01")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val li = Seq(
      (1L, 10L, d("2024-04-01")), (1L, 20L, d("2024-01-10")),
      (2L, 10L, d("2024-04-01")), (2L, 20L, d("2024-04-02")),
      (3L, 10L, d("2024-04-01")),
      (4L, 10L, d("2024-04-01")), (4L, 20L, d("2024-01-10")),
      (5L, 20L, d("2024-04-01")), (5L, 20L, d("2024-05-01")), (5L, 30L, d("2024-01-05")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "SUP_A"), (20L, "SUP_B"), (30L, "SUP_C"))
      .toDF("s_suppkey", "s_name")
    val out = Relational.soleLateSupplier(li, orders, supp).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(10L -> 1L, 20L -> 1L))
  }

  test("skylineParts equals the naive dominance definition") {
    import spark.implicits._
    val part = Tables.part(spark, sf())
    val pts = part.select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[(Long, Double, Long)].collect()
    val naive = pts.filter { case (_, price, sz) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= price && s2 >= sz && (p2 < price || s2 > sz) }
    }.map(_._1).toSet
    val out = Relational.skylineParts(part).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(out === naive)
    assert(out.nonEmpty)
  }

  test("keywordSearch: planted tf counts, AND flag, and ranking") {
    val out = TextAnalysis.keywordSearch(docs(Seq(
      1L -> "hash join hash scan",      // tf 2,1,1 score 4, all
      2L -> "join join join",           // score 3, not all
      3L -> "nothing relevant here",    // score 0: excluded
      4L -> "hash join scan")), k = 2).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L)) // k=2 cuts doc 4
    assert(out(0).getAs[Long]("tf_hash") === 2L)
    assert(out(0).getAs[Boolean]("all_terms"))
    assert(!out(1).getAs[Boolean]("all_terms"))
    assert(out(1).getAs[Long]("score") === 3L)
  }
}
