package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Multimodal, Relational, Similarity, TextAnalysis, TrainingData}

/** Round-11 tail specs: SemDeDup's within-cluster removal rule, the BM25
  * closed form vs a Scala replay, and DSIR's target-vs-raw ordering. */
class Round11OpsSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, lang) => (id, t, lang, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("semDedup removes the higher id of an identical pair, within-cell only") {
    import spark.implicits._
    // 1≡2 and 5≡6 (cos 1.0, same cell by the (d2, cent_id) tie-break);
    // 3, 4 are singleton cells. cos(1,5) = 0.6 ≥ τ but the pair spans
    // cells — SemDeDup compares within clusters only, so it survives.
    val e = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)), (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0.6f, 0.8f, 0f, 0f)), (6L, Seq(0.6f, 0.8f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(e).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"),
        r.getAs[Double]("cos")))
    assert(out.toSet === Set((2L, 1L, 1.0), (6L, 5L, 1.0)))
  }

  test("bm25 matches the closed form; non-matching docs are filtered") {
    val out = TextAnalysis.bm25(docs(Seq(
      (1L, "hash join scan hash", "en"),
      (2L, "hash foo bar baz", "en"),
      (3L, "nothing here at all", "en")))).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    // N=3, avgdl=4, dl=4 for every doc -> denominator tf + k1
    def idf(df: Long) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Long, df: Long) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 1.0))
    val exp1 = term(2, 2) + term(1, 1) + term(1, 1)
    val exp2 = term(1, 2)
    assert(math.abs(out(0).getAs[Double]("score") - exp1) < 2e-4)
    assert(math.abs(out(1).getAs[Double]("score") - exp2) < 2e-4)
    assert(out(0).getAs[Long]("tf_hash") === 2L)
    assert(out(0).getAs[Long]("dl") === 4L)
  }

  test("marketShare: planted two-supplier year, exact conditional share") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    val part = Seq((1L, "p", "b", "PROMO", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val supplier = Seq((10L, "s10", 0L, 0.0), (20L, "s20", 1L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nation = Seq((0L, "NATION_2", 0L), (1L, "NATION_OTHER", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0L, "EUROPE")).toDF("r_regionkey", "r_name")
    val customer = Seq((100L, "c", 0L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((1000L, 100L, "O", 1.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // NATION_2's supplier bills 100 @ 10% off = 90; the other 200 net
    val lineitem = Seq(
      (1000L, 1L, 10L, 1L, 1.0, 100.0, 0.1, 0.0, "N", "O", ts),
      (1000L, 1L, 20L, 2L, 1.0, 200.0, 0.0, 0.0, "N", "O", ts))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val out = Relational.marketShare(part, supplier, lineitem, orders,
      customer, nation, region).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("o_year") === 1996L)
    assert(out(0).getAs[Double]("nation_revenue") === 90.0)
    assert(out(0).getAs[Double]("total_revenue") === 290.0)
    assert(out(0).getAs[Double]("mkt_share") === 0.3103) // 90/290 4dp
  }

  test("ccnetBuckets: per-lang terciles are balanced and score-ordered") {
    import spark.implicits._
    val rows = for (lang <- Seq("en", "fr"); i <- 1 to 7) yield
      (lang.hashCode.toLong * 100 + i,
        (Seq.fill(i)("common").mkString(" ")) + s" rare_${lang}_$i", lang)
    val out = TextAnalysis.ccnetBuckets(docs(rows.map { case (id, t, l) =>
      (id, t, l) })).collect()
    Seq("en", "fr").foreach { lang =>
      val b = out.filter(_.getAs[String]("lang") == lang)
        .sortBy(_.getAs[Long]("bucket"))
      assert(b.map(_.getAs[Long]("bucket")).toSeq === Seq(0L, 1L, 2L))
      assert(b.map(_.getAs[String]("bucket_name")).toSeq ===
        Seq("head", "middle", "tail"))
      val sizes = b.map(_.getAs[Long]("n_docs"))
      assert(sizes.sum === 7L && sizes.max - sizes.min <= 1L)
      // tercile boundaries respect the score order (ties allowed)
      assert(b(0).getAs[Double]("max_lm") <= b(1).getAs[Double]("min_lm"))
      assert(b(1).getAs[Double]("max_lm") <= b(2).getAs[Double]("min_lm"))
    }
  }

  test("nationVolume: pair volume keeps A->B and B->A, drops same-nation") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("1997-03-01 00:00:00")
    val nation = Seq((2L, "NATION_2", 0L), (8L, "NATION_8", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, "s10", 2L, 0.0), (20L, "s20", 8L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val customer = Seq((100L, "cA", 2L, 0.0, "B"), (200L, "cB", 8L, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((1L, 100L, "O", 1.0, ts, "p"), (2L, 200L, "O", 1.0, ts, "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, 1L, 20L, 1L, 1.0, 100.0, 0.0, 0.0, "N", "O", ts), // 8 -> 2: 100
      (2L, 1L, 10L, 1L, 1.0, 50.0, 0.1, 0.0, "N", "O", ts),  // 2 -> 8: 45
      (1L, 1L, 10L, 2L, 1.0, 77.0, 0.0, 0.0, "N", "O", ts))  // 2 -> 2: dropped
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val out = Relational.nationVolume(supplier, lineitem, orders, customer, nation)
      .collect().map(r => (r.getAs[String]("supp_nation"),
        r.getAs[String]("cust_nation"), r.getAs[Long]("l_year"),
        r.getAs[Double]("revenue")))
    assert(out.toSet === Set(("NATION_2", "NATION_8", 1997L, 45.0),
      ("NATION_8", "NATION_2", 1997L, 100.0)))
  }

  test("knnClassify: planted clusters vote their own label at k=3") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(1f, 0f, 0f, 0f), 0), (3L, Seq(0f, 1f, 0f, 0f), 1),
      (4L, Seq(0f, 1f, 0f, 0f), 1), (5L, Seq(0f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(e, k = 3).collect()
    assert(out.length === 6)
    out.foreach { r =>
      // 2 same-cluster votes beat the 1 cross-cluster tie-break vote
      assert(r.getAs[Long]("votes") === 2L)
      assert(r.getAs[Long]("n_neighbors") === 3L)
      assert(r.getAs[Long]("pred_label") === r.getAs[Long]("own_label"))
      assert(r.getAs[Boolean]("correct"))
    }
  }

  test("quantilesApproxContract: exact anchors + verdict on a planted group") {
    import spark.implicits._
    val li = (1 to 100).map(i => ("N", i.toDouble)) ++ Seq(("R", 7.0))
    val out = Relational.quantilesApproxContract(
      li.toDF("l_returnflag", "l_quantity")).collect()
    val n = out.find(_.getAs[String]("l_returnflag") == "N").get
    assert(n.getAs[Long]("n") === 100L)
    assert(n.getAs[Double]("p50_exact") === 50.5) // dyadic interpolation
    assert(n.getAs[Boolean]("approx_in_band"))
    val r = out.find(_.getAs[String]("l_returnflag") == "R").get
    assert(r.getAs[Double]("p50_exact") === 7.0 && r.getAs[Boolean]("approx_in_band"))
  }

  test("seasonality: dow effect = dow mean minus overall mean, exact") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday; X: Mon 10, 20 / Tue 30 -> overall 20
    val bars = Seq(
      ("X", t("2024-01-01 10:00:00"), 10.0), ("X", t("2024-01-01 10:05:00"), 20.0),
      ("X", t("2024-01-02 10:00:00"), 30.0))
      .toDF("symbol", "bar_ts", "close")
    val out = graft.operators.Indicators.seasonality(bars).collect()
      .map(r => r.getAs[String]("day_name") ->
        (r.getAs[Long]("n_bars"), r.getAs[Double]("avg_close"),
          r.getAs[Double]("dow_effect"))).toMap
    assert(out("Monday") === ((2L, 15.0, -5.0)))
    assert(out("Tuesday") === ((1L, 30.0, 10.0)))
  }

  test("snapshotDiff classifies changed/added/none/same from one pass") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-05 00:00:00"), 1L, "click", 0.0),
      (2L, t("2024-01-15 00:00:00"), 1L, "purchase", 0.0), // changed
      (3L, t("2024-01-12 00:00:00"), 2L, "view", 0.0),     // added
      (4L, t("2024-01-25 00:00:00"), 3L, "view", 0.0),     // none
      (5L, t("2024-01-03 00:00:00"), 4L, "view", 0.0))     // same
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Temporal.snapshotDiff(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("change")).toMap
    assert(out === Map(1L -> "changed", 2L -> "added", 3L -> "none", 4L -> "same"))
  }

  test("SQL-text surface: pushdown and broadcast survive the view layer") {
    import graft.operators.SqlSurface
    val plan = SqlSurface.regionRevenueSql(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast via SQL")
    val scanPlan = SqlSurface.pricingSummarySql(spark, sf())
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      "the shipdate filter must reach the parquet scan through the view")
    val winPlan = SqlSurface.segmentTopOrdersSql(spark, sf())
      .queryExecution.executedPlan.toString
    assert(winPlan.contains("WindowGroupLimit"),
      "the SQL rank filter must rewrite to WindowGroupLimit")
  }

  test("parsePhash: uniform buffer sets every occupied cell; bright row wins") {
    // doc_id 1 -> width 17, stride 51; 102 payload bytes = 2 pixel rows,
    // header-declared height 3, so rows 0,1 land in bands 0 and 2
    val flat = Multimodal.parsePhash(1L,
      Multimodal.encodeMedia(1L, Array.fill[Byte](102)(100))).get
    assert(flat.width === 17L && flat.height === 3L)
    // every byte equals the mean -> all 16 occupied cells (row bands
    // 0 and 2 x col bands 0..7) set, nothing else
    assert(flat.phash_lo === 0xFF00FFL && flat.phash_hi === 0L)
    val split = Multimodal.parsePhash(1L, Multimodal.encodeMedia(1L,
      (Array.fill[Byte](51)(200.toByte) ++ Array.fill[Byte](51)(10)))).get
    // bright row 0 (avg 200 >= global 105) sets band 0; dim row 1 doesn't
    assert(split.phash_lo === 0xFFL && split.phash_hi === 0L)
    // WAV (even id) containers are not images
    assert(Multimodal.parsePhash(2L,
      Multimodal.encodeMedia(2L, Array.fill[Byte](64)(1))).isEmpty)
  }

  test("mediaPhash: identical texts at the same width collide, n_same = 2") {
    // ids 1 and 65 share width (65 % 32 = 1); id 3 differs, id 2 is WAV
    val out = Multimodal.mediaPhash(docs(Seq(
      (1L, "A" * 120, "en"), (65L, "A" * 120, "en"),
      (3L, "zq" * 60, "en"), (2L, "A" * 120, "en")))).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L, 65L))
    val bySame = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_same")).toMap
    assert(bySame(1L) === 2L && bySame(65L) === 2L && bySame(3L) === 1L)
  }

  test("dsirWeights ranks target-like docs first; n_feats = bigram count") {
    // target (en) speaks "x y" bigrams, raw-only (fr) speaks "p q";
    // doc 10 reuses the target bigrams, doc 11 the raw-only ones
    val out = TrainingData.dsirWeights(docs(Seq(
      (1L, "x y x y x", "en"), (2L, "x y x", "en"),
      (3L, "p q p q p", "fr"), (4L, "p q p", "fr"),
      (10L, "x y x y", "fr"), (11L, "p q p q", "en")))).collect()
    assert(out.length === 6)
    val w = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("log_w_nano")).toMap
    val nf = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_feats")).toMap
    assert(nf(1L) === 4L && nf(10L) === 3L && nf(11L) === 3L)
    // target-bigram docs outrank raw-only docs regardless of their lang
    assert(w(10L) > w(11L))
    assert(w(1L) > w(3L))
    // output is sorted by the exact integer key, descending
    val keys = out.map(_.getAs[Long]("log_w_nano")).toSeq
    assert(keys === keys.sortBy(-_))
  }
}
