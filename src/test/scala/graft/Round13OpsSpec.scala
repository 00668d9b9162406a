package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ema, SqlSurface}

/** Round-13 surfaces: SQL-text set ops / scalar subquery / grouping
  * sets (S8-S10) and the media-corpus ASCII invariant the q_audio_energy
  * oracle leans on. */
class Round13OpsSpec extends SparkSpec {

  test("SQL-text INTERSECT/EXCEPT plan as semi/anti joins and match the DataFrame twins") {
    val df = SqlSurface.orderSlicesSetOpsSql(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst rewrites both set ops out of existence: INTERSECT → left
    // semi join + distinct, EXCEPT → left anti join + distinct. If a
    // dedicated set-op operator ever survived to the physical plan the
    // statement would stop scaling like its join twin.
    assert(plan.contains("LeftSemi"), s"INTERSECT did not become a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"EXCEPT did not become an anti join:\n$plan")
    val orders = Tables.table(spark, sf(), "orders")
    val high = orders.filter(col("o_totalprice") >= 300000).select(col("o_custkey"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val twin = high.intersect(urgent).select(lit("both").as("grp"), col("o_custkey"))
      .unionAll(high.except(urgent)
        .select(lit("high_only").as("grp"), col("o_custkey")))
    assert(df.exceptAll(twin).isEmpty && twin.exceptAll(df).isEmpty,
      "q_sql_setops disagrees with the DataFrame intersect/except twins")
    // set semantics: no duplicate (grp, custkey) rows even though source
    // customers place many qualifying orders
    assert(df.count() === df.distinct().count())
  }

  test("SQL-text scalar subquery runs once (no join, no per-row re-execution)") {
    val df = SqlSurface.priorityRevenueScalarSql(spark, sf())
    val qe = df.queryExecution
    // the uncorrelated scalar subquery must plan as a ScalarSubquery
    // expression (executed once, result injected) — NOT a join
    val withSubq = qe.executedPlan.toString
    assert(withSubq.contains("Subquery") || withSubq.contains("scalar-subquery"),
      s"no scalar subquery node in:\n$withSubq")
    assert(!withSubq.contains("Join"),
      s"scalar subquery degenerated into a join:\n$withSubq")
    val rows = df.collect()
    assert(rows.length === 5)
    // shares against the one global total must sum to ~100%
    val pctSum = rows.map(_.getAs[Double]("pct_of_total")).sum
    assert(math.abs(pctSum - 100.0) < 0.01, s"pct_of_total sums to $pctSum")
    // and each share equals the hand-computed two-aggregate twin
    val orders = Tables.table(spark, sf(), "orders")
    val tot = orders.agg(sum(col("o_totalprice").cast("decimal(18,6)"))
      .cast("double")).head.getDouble(0)
    val twin = orders.groupBy(col("o_orderpriority"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val want = math.floor((twin(r.getString(0)) / tot * 100 + 5e-9) * 1e4 + 0.5) / 1e4
      assert(math.abs(r.getAs[Double]("pct_of_total") - want) < 1e-9,
        s"${r.getString(0)}: scalar-subquery share drifted")
    }
  }

  test("SQL-text GROUPING SETS matches the DataFrame twin bit-for-bit") {
    val df = SqlSurface.groupingSetsSql(spark, sf())
    // one Expand feeding one aggregate — the same physical shape the
    // DataFrame groupingSets call plans; a per-set union re-scan would
    // read the corpus three times
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand in:\n$plan")
    val twin = graft.operators.Relational.groupingSetsQty(
      Tables.table(spark, sf(), "lineitem"))
    assert(df.exceptAll(twin).isEmpty && twin.exceptAll(df).isEmpty,
      "q_sql_groupingsets disagrees with q_grouping_sets")
    Ema.unpersistAll(); spark.catalog.clearCache()
  }

  test("ivfChooseNprobe wires the tuning argmax into annIvf and beats fixed nprobe=6 on recall-per-candidate") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf())
    val report = Similarity.ivfTuning(emb).collect()
      .map(r => r.getAs[Long]("nprobe") ->
        (r.getAs[Long]("eff_ppm"), r.getAs[Long]("recall_ppm"),
          r.getAs[Boolean]("chosen"))).toMap
    // the driver twin returns exactly the gated query's chosen row
    val chosen = Similarity.ivfChooseNprobe(emb)
    assert(report(chosen.toLong)._3, s"ivfChooseNprobe=$chosen is not the chosen row")
    // the contract: the chosen probe budget is at least as
    // recall-efficient per candidate as the fixed default nprobe=6
    assert(report(chosen.toLong)._1 >= report(6L)._1,
      s"chosen nprobe=$chosen eff=${report(chosen.toLong)._1} " +
        s"does not beat fixed 6 eff=${report(6L)._1}")
    // recall must be monotone in nprobe (candidate sets are nested)
    val byNp = report.toSeq.sortBy(_._1).map(_._2._2)
    assert(byNp === byNp.sorted, "recall_ppm not monotone in nprobe")
    // and the wired probe path accepts the chosen point
    val probed = Similarity.annIvf(emb, k = 3, nprobe = chosen)
    assert(probed.count() > 0)
    // a larger probe budget can only widen each query's candidate cell
    // set, so the nprobe=12 result must contain every nprobe=chosen
    // top-1 hit's quality or better: top-1 cos at 12 >= top-1 cos at chosen
    val t1 = Similarity.annIvf(emb, k = 1, nprobe = chosen)
      .select(col("q_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val t12 = Similarity.annIvf(emb, k = 1, nprobe = 12)
      .select(col("q_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    t1.foreach { case (q, c) =>
      assert(t12(q) >= c - 1e-9, s"query $q: wider probe budget lost recall") }
    Ema.unpersistAll(); spark.catalog.clearCache()
  }

  test("unigram vocab: protected singles, exact char-mass conservation, learned-vocab round-trip") {
    import graft.operators.Unigram
    val docs = Tables.documents(spark, sf())
    val out = Unigram.unigramVocab(docs).collect()
    val singles = out.filter(_.getAs[Boolean]("is_single"))
    val multis = out.filterNot(_.getAs[Boolean]("is_single"))
    // budget honored and the single-char base never pruned
    assert(multis.length <= Unigram.Budgets.last,
      s"${multis.length} multi-char pieces exceed the final budget")
    // every corpus character survives as a single (coverage guarantee)
    val corpusChars = docs.select(
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .select(explode(expr("split(w, '')")).as("c"))
      .filter(length(col("c")) === 1).distinct()
      .collect().map(_.getString(0)).toSet
    assert(corpusChars.subsetOf(singles.map(_.getString(0)).toSet),
      "a corpus character was pruned from the vocabulary")
    // char-mass conservation: the final greedy segmentation covers every
    // character of every word exactly once, so Σ usage·len(piece) must
    // equal the exact corpus word-character mass
    val massFromVocab = out.map(r =>
      r.getAs[Long]("usage") * r.getAs[Long]("n_chars")).sum
    val corpusMass = docs.select(
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .agg(sum(length(col("w")).cast("long"))).head.getLong(0)
    assert(massFromVocab === corpusMass,
      s"segmentation char mass $massFromVocab != corpus mass $corpusMass")
    // round-trip: re-segmenting the corpus words with the LEARNED vocab
    // (the consumer API) reproduces the gated usage counts exactly
    val vocabSeq = out.map(_.getString(0)).toSeq
    val words = docs.select(
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val segmented = Unigram.segmentWith(words.select("word"), vocabSeq)
      .join(words, Seq("word"))
    val rederived = segmented
      .select(col("freq"), explode(col("tokens")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("usage"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val got = rederived.getOrElse(r.getString(0), 0L)
      assert(got === r.getAs[Long]("usage"),
        s"piece ${r.getString(0)}: round-trip usage $got != gated ${r.getAs[Long]("usage")}")
    }
    // the learned vocab must compress: fewer tokens than the all-singles
    // baseline (the whole point of induction)
    val nTokLearned = segmented
      .agg(sum(col("n_tokens") * col("freq"))).head.getLong(0)
    assert(nTokLearned < corpusMass,
      s"learned vocab does not compress: $nTokLearned tokens vs $corpusMass chars")
    Ema.unpersistAll(); spark.catalog.clearCache()
  }

  test("greedy_seg kernel: longest match wins, uncovered positions fall back to chars") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("abcde", Seq("ab", "abc", "c", "de", "a", "b", "d", "e")),
        ("zzz", Seq("a")), // nothing matches: per-char fallback
        ("abab", Seq("ab", "aba", "b"))) // greedy takes aba then b... then fallback a? no: aba+b
      .toDF("word", "v")
      .select(col("word"),
        expr("greedy_seg(word, sort_array(v))").as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(df("abcde") === Seq("abc", "de"), s"got ${df("abcde")}")
    assert(df("zzz") === Seq("z", "z", "z"), s"got ${df("zzz")}")
    assert(df("abab") === Seq("aba", "b"), s"got ${df("abab")}")
  }

  test("media corpus text is ASCII (the byte==char invariant the audio oracle decodes with)") {
    // The q_audio_energy / q_multimodal_frames oracles read payload
    // bytes via ascii(substr(text, p)) — CHARACTER-indexed — while the
    // engine parses raw UTF-8 container bytes. Those agree iff the
    // corpus text is pure ASCII (octet_length == char length, every
    // codepoint < 128). The driver generates the corpus, so gate the
    // invariant here at the consuming boundary: if a future corpus drop
    // ships multi-byte text this trips before the oracle silently
    // diverges.
    val docs = Tables.table(spark, sf(), "documents")
    val nonAscii = docs.filter(
      octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii === 0L,
      s"$nonAscii documents carry non-ASCII text — the audio/frames " +
        "oracle byte==char decoding assumption no longer holds")
  }
}
