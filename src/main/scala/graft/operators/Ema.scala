package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact recursive EMA / MACD (reference app/dashboard.py:114-118).
  *
  * `ewm(span=n, adjust=False)`: e_0 = x_0; e_t = α·x_t + (1−α)·e_{t-1}
  * with α = 2/(n+1). EMA is the one inherently-sequential operator in the
  * suite, so it runs as a single sorted pass per symbol via
  * `groupByKey(symbol).flatMapGroups` — one shuffle on symbol, O(n) work,
  * no driver-side collection.
  *
  * Scale path (documented for 100 TB): per-symbol series are processed
  * independently, so throughput scales with symbol cardinality; for few
  * ultra-long series the recursion factors into a segmented scan
  * (per-chunk (Π(1−α), Σ weighted) pairs combined associatively), which
  * is the planned round-2 upgrade if profiling demands it.
  *
  * The DuckDB oracle reproduces the same fold with `list_reduce` over a
  * 500-bar trailing window; the truncation error (1−α)^500 < 1e-16 is
  * invisible at the 4dp output rounding.
  */
object Ema {
  private val A12 = 2.0 / 13.0; private val B12 = 11.0 / 13.0
  private val A26 = 2.0 / 27.0; private val B26 = 25.0 / 27.0
  private val A9 = 2.0 / 10.0; private val B9 = 8.0 / 10.0

  def macd(bars: DataFrame): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._
    val ds = bars.select(col("symbol"), col("bar_ts"), col("close"))
      .as[(String, java.sql.Timestamp, Double)]
    val raw = ds.groupByKey(_._1).flatMapGroups { (sym, it) =>
      val arr = it.map(t => (t._2, t._3)).toArray
      scala.util.Sorting.stableSort(arr, (a: (java.sql.Timestamp, Double),
          b: (java.sql.Timestamp, Double)) => a._1.getTime < b._1.getTime)
      val n = arr.length
      val macdArr = new Array[Double](n)
      var e12 = 0.0; var e26 = 0.0; var i = 0
      while (i < n) {
        val x = arr(i)._2
        if (i == 0) { e12 = x; e26 = x }
        else { e12 = x * A12 + e12 * B12; e26 = x * A26 + e26 * B26 }
        macdArr(i) = e12 - e26
        i += 1
      }
      var sig = 0.0
      (0 until n).iterator.map { j =>
        val m = macdArr(j)
        sig = if (j == 0) m else m * A9 + sig * B9
        (sym, arr(j)._1, m, sig, m - sig)
      }
    }
    raw.toDF("symbol", "bar_ts", "m", "s", "h")
      .select(col("symbol"), col("bar_ts"),
        round(col("m") + lit(5e-9), 4).as("macd"),
        round(col("s") + lit(5e-9), 4).as("macd_signal"),
        round(col("h") + lit(5e-9), 4).as("macd_hist"))
      .orderBy(col("symbol"), col("bar_ts"))
  }
}
