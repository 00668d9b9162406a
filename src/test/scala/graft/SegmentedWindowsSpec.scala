package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Bars, Indicators, IndicatorsExt, SegmentedWindows}

class SegmentedWindowsSpec extends SparkSpec {

  private def cleanup(): Unit = {
    graft.operators.Ema.unpersistAll()
    spark.catalog.clearCache()
  }

  /** Gappy irregular series: chunking is by ROW COUNT, so missing bars
    * must not shift the frames. Prime-ish step pattern with holes. */
  private def plantedBars(n: Int, symbols: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = for {
      s <- symbols
      i <- 0 until n
      // irregular spacing: 5-min grid with deterministic holes
      if (i * 7 + s.length) % 11 != 0
    } yield (s, new Timestamp(1704100000000L + i.toLong * 300000L),
      100.0 + ((i * 31 + s.hashCode.abs) % 997) / 100.0)
    rows.toDF("symbol", "bar_ts", "close")
  }

  test("segmented SMA equals the per-symbol-window SMA on a gappy series crossing chunks") {
    val bars = plantedBars(700, Seq("AA", "BB"))
    try {
      // chunkRows=256 → the 700-row series spans 3 chunks; the 200-row
      // frame reaches across every chunk boundary
      val seg = SegmentedWindows.smaSegmented(bars, chunkRows = 256)
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getAs[Any](3), r.getAs[Any](4), r.getAs[Any](5)))
      val ref = Indicators.sma(bars)
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getAs[Any](3), r.getAs[Any](4), r.getAs[Any](5)))
      assert(seg.length === ref.length)
      assert(seg.toSeq === ref.toSeq)
    } finally cleanup()
  }

  test("segmented SMA equals the window SMA on real bars") {
    val bars = Bars.ohlcv(Tables.events(spark, sf()))
      .select(col("symbol"), col("bar_ts"), col("close"))
    try {
      val seg = SegmentedWindows.smaSegmented(bars, chunkRows = 512).collect()
      val ref = Indicators.sma(bars).collect()
      assert(seg.map(_.toString).toSeq === ref.map(_.toString).toSeq)
    } finally cleanup()
  }

  /** OHLCV variant of the gappy planted series for cores that read
    * high/low/volume too. */
  private def plantedOhlcv(n: Int, symbols: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = for {
      s <- symbols
      i <- 0 until n
      if (i * 7 + s.length) % 11 != 0
    } yield {
      val c = 100.0 + ((i * 31 + s.hashCode.abs) % 997) / 100.0
      val h = c + ((i * 13) % 47) / 100.0
      val l = c - ((i * 17) % 53) / 100.0
      (s, new Timestamp(1704100000000L + i.toLong * 300000L),
        c - 0.05, h, l, c, 1000L + (i * 37) % 500)
    }
    rows.toDF("symbol", "bar_ts", "open", "high", "low", "close", "volume")
  }

  // Every rolling core, segmented vs the per-symbol-window base, on a
  // gappy series spanning many chunks (chunkRows=64 → ~10 chunks), so
  // every frame shape crosses chunk boundaries repeatedly.
  private val rollingPairs: Seq[(String, DataFrame => DataFrame, DataFrame => DataFrame)] = Seq(
    ("rsi", (b: DataFrame) => SegmentedWindows.rsiSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.rsi(b)),
    ("atr", (b: DataFrame) => SegmentedWindows.atrSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.atr(b)),
    ("stochastic", (b: DataFrame) => SegmentedWindows.stochasticSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.stochastic(b)),
    ("williams_r", (b: DataFrame) => SegmentedWindows.williamsRSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.williamsR(b)),
    ("donchian", (b: DataFrame) => SegmentedWindows.donchianSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.donchian(b)),
    ("mfi", (b: DataFrame) => SegmentedWindows.mfiSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.mfi(b)),
    ("momentum", (b: DataFrame) => SegmentedWindows.momentumSegmented(b, chunkRows = 64),
      (b: DataFrame) => Indicators.momentum(b)),
    // joined-input shape: the per-bar_ts index column rides into the
    // chunking like any other bar column
    ("rolling_corr", (b: DataFrame) => SegmentedWindows.rollingCorrSegmented(b, chunkRows = 64),
      (b: DataFrame) => IndicatorsExt.rollingCorr(b)))

  for ((name, segF, refF) <- rollingPairs)
    test(s"segmented $name equals the per-symbol-window $name across chunk boundaries") {
      val bars = plantedOhlcv(700, Seq("AA", "BB"))
      try {
        val seg = segF(bars).collect().map(_.toString).toSeq
        val ref = refF(bars).collect().map(_.toString).toSeq
        assert(seg.length === ref.length)
        assert(seg === ref)
      } finally cleanup()
    }

  // Running (unbounded-preceding) devices: the 4-shuffle-partition test
  // session splits the 2-symbol series across several range partitions,
  // so local-run + prefix-offset recombination is exercised at every
  // partition boundary (including the cross-boundary OBV lag).
  private val runningPairs: Seq[(String, DataFrame => DataFrame, DataFrame => DataFrame)] = Seq(
    ("obv", (b: DataFrame) => SegmentedWindows.obvSegmented(b),
      (b: DataFrame) => Indicators.obv(b)),
    ("vwap", (b: DataFrame) => SegmentedWindows.vwapSegmented(b),
      (b: DataFrame) => Indicators.vwap(b)),
    ("drawdown", (b: DataFrame) => SegmentedWindows.drawdownSegmented(b),
      (b: DataFrame) => Indicators.drawdown(b)))

  for ((name, segF, refF) <- runningPairs)
    test(s"running-segmented $name equals the per-symbol-window $name across partition boundaries") {
      val bars = plantedOhlcv(700, Seq("AA", "BB"))
      try {
        val seg = segF(bars).collect().map(_.toString).toSeq
        val ref = refF(bars).collect().map(_.toString).toSeq
        assert(seg.length === ref.length)
        assert(seg === ref)
      } finally cleanup()
    }

  test("segmented Bollinger equals the window Bollinger (variance frame) on a gappy series") {
    val bars = plantedBars(700, Seq("AA", "BB"))
    try {
      val seg = SegmentedWindows.bollingerSegmented(bars, chunkRows = 256).collect()
      val ref = Indicators.bollinger(bars).collect()
      assert(seg.map(_.toString).toSeq === ref.map(_.toString).toSeq)
    } finally cleanup()
  }

  test("smaSegmented rejects chunks narrower than the widest frame") {
    val bars = plantedBars(50, Seq("AA"))
    intercept[IllegalArgumentException] {
      SegmentedWindows.smaSegmented(bars, chunkRows = 128)
    }
    cleanup()
  }

  test("withSeriesIndex assigns the exact global per-symbol row index") {
    import org.apache.spark.sql.expressions.Window
    val bars = plantedBars(900, Seq("CC", "DD", "EE"))
    try {
      val got = SegmentedWindows.withSeriesIndex(bars)
        .select(col("symbol"), col("bar_ts"), col("_idx"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      val want = bars.select(col("symbol"), col("bar_ts"),
          (row_number().over(Window.partitionBy(col("symbol"))
            .orderBy(col("bar_ts"))).cast("long") - 1L).as("_idx"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      assert(got.sortBy(t => (t._1, t._2)).toSeq === want.sortBy(t => (t._1, t._2)).toSeq)
    } finally cleanup()
  }

  test("window tasks are bounded: no (symbol, chunk) group exceeds chunkRows + 199") {
    val bars = plantedBars(2000, Seq("CC"))
    try {
      val chunkRows = 256
      // rebuild the operator's grouping (base + carry) and measure the
      // largest (symbol, chunk) group — the bound every window task
      // relies on at scale
      val idxd = SegmentedWindows.withSeriesIndex(bars)
      val base = idxd.withColumn("_chunk", expr(s"_idx div $chunkRows"))
      val carried = idxd.filter(col("_idx") % chunkRows >= chunkRows - 199)
        .withColumn("_chunk", expr(s"_idx div $chunkRows") + 1L)
      val sizes = base.unionByName(carried)
        .groupBy(col("symbol"), col("_chunk")).count()
        .agg(max(col("count")), count(lit(1))).collect()(0)
      assert(sizes.getLong(0) <= chunkRows + 199)
      assert(sizes.getLong(1) >= 6, "series must span several chunks for the bound to matter")
    } finally cleanup()
  }
}
