package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE vocabulary induction (Sennrich/Haddow/Birch 2016,
  * arXiv:1508.07909 — public): learn the top-k byte-pair merges from a
  * corpus. This is the missing step between a raw corpus and the
  * declared vocabulary [[TextAnalysis.tokenize]] applies — induction
  * produces the subword units; tokenization consumes them.
  *
  * Semantics (mirrored EXACTLY by the DuckDB oracle's k unrolled CTE
  * rounds): words are maximal `[a-z0-9]+` runs of the lowercased text
  * (the wp_stats word definition); each word starts as its character
  * sequence; each round counts adjacent-token pairs weighted by corpus
  * word frequency, picks the max under the deterministic tie-break
  * (count DESC, left ASC, right ASC), and merges every occurrence
  * greedily left-to-right. The merge application is a sequential fold
  * over the token list (list_reduce in DuckDB, `aggregate` here) with
  * the segmentation held as a '|'-delimited string — one fixed walk
  * order, so both engines produce byte-identical segmentations.
  *
  * Scale shape: the ONE corpus-scale pass is the word-frequency
  * aggregate (map-side combinable — each mapper ships (word, count)
  * rows at local-vocabulary cardinality). Every round after that runs
  * at VOCABULARY scale: pair counting explodes the distinct-word
  * table (≪ corpus), the argmax is a 1-row TakeOrdered, and the merge
  * application is a per-word projection. The driver-side loop is
  * inherent to the algorithm (round i+1's counts depend on round i's
  * chosen merge — the [[Dedup.dedupClusters]] iterative pattern);
  * per-round frames localCheckpoint so lineage stays flat across k
  * rounds.
  */
object Bpe {

  /** Initial segmentation of a word: '|c1|c2|…|cn|'. */
  private val initSeg: Column =
    concat(lit("|"), regexp_replace(col("word"), "(.)", "$1|"))

  /** SQL for one greedy left-to-right merge application of (l, r) over
    * the '|'-delimited `segCol` — the sequential fold both engines run.
    * l and r must be [a-z0-9]+ tokens (the wp_stats word alphabet) so
    * inlining them as SQL string literals is safe; [[bpeSegment]] is
    * public and accepts arbitrary merge lists, so enforce it here —
    * a quote/backslash-bearing token would otherwise build a broken or
    * injectable expression string. */
  private val MergeToken = "^[a-z0-9]+$".r
  private def applyMergeSql(segCol: String, l: String, r: String): String = {
    require(MergeToken.matches(l) && MergeToken.matches(r),
      s"BPE merge tokens must match [a-z0-9]+, got ('$l', '$r')")
    s"""aggregate(filter(split($segCol, '\\\\|'), t -> t != ''), '|',
        (acc, t) -> IF(t = '$r' AND endswith(acc, '|$l|'),
          concat(substring(acc, 1, length(acc) - ${l.length + 1}), '$l$r|'),
          concat(acc, t, '|')))"""
  }

  /** (word, freq, seg) with seg = the initial per-character split. */
  def initialSegments(docs: DataFrame): DataFrame =
    docs.select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), initSeg.as("seg"))

  /** Learn the top-`k` BPE merges. Output: (merge_rank, t_left,
    * t_right, merged, pair_count), one row per learned merge in order.
    * Stops early if the corpus runs out of adjacent pairs. */
  def bpeMerges(docs: DataFrame, k: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // truncateLazy: each round's 1-row argmax action materializes the
    // round's checkpoint in the same job (one job per round, not two)
    var seg = Checkpoints.truncateLazy(initialSegments(docs))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var exhausted = false
    while (!exhausted && merges.length < k) {
      val pairs = seg
        .select(col("freq"),
          expr("filter(split(seg, '\\\\|'), t -> t != '')").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
               i -> named_struct('l', element_at(toks, i),
                                 'r', element_at(toks, i + 1)))""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
      // 1-row TakeOrdered — the per-round driver gate every iterative
      // induction needs (round i+1's counts depend on this choice)
      val top = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, c))
        if (merges.length < k)
          seg = Checkpoints.truncateLazy(seg.select(col("word"), col("freq"),
            expr(applyMergeSql("seg", l, r)).as("seg")))
      }
    }
    merges.toSeq.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, l + r, c) }
      .toDF("merge_rank", "t_left", "t_right", "merged", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** Apply a learned merge list to arbitrary words — the tokenizer the
    * induction feeds: each word is char-split and the merges replay IN
    * LEARNED ORDER (BPE-proper inference). Output: (word, tokens,
    * n_tokens). Pure per-row projection — zero shuffles at any corpus
    * size; the merge list compiles into the expression chain. */
  def bpeSegment(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg0 = words.select(col("word"), initSeg.as("seg"))
    val segN = merges.foldLeft(seg0) { case (df, (l, r)) =>
      df.select(col("word"), expr(applyMergeSql("seg", l, r)).as("seg"))
    }
    segN.select(col("word"),
      expr("filter(split(seg, '\\\\|'), t -> t != '')").as("tokens"))
      .select(col("word"), col("tokens"),
        size(col("tokens")).cast("long").as("n_tokens"))
  }
}
