package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `greedy_seg(word, vocab)` → array of subword pieces: greedy
  * longest-match segmentation of `word` against a SORTED vocabulary
  * array — the E-step of unigram-LM vocabulary induction
  * ([[graft.operators.Unigram]]) and the segmentation a learned vocab
  * is consumed with. At each cursor position the longest vocabulary
  * piece matching there is taken; a position no piece covers falls
  * back to its single character (total function — with the induction's
  * protected single-char set the fallback never fires on corpus
  * words).
  *
  * The vocabulary arrives as an ARRAY COLUMN (a one-row
  * `sort_array(collect_list(piece))` cross-joined in), not a compiled
  * constant like [[WordPieceVocab]] — induction re-segments against a
  * DIFFERENT, data-derived vocab each prune round, so the pieces must
  * flow through the plan. The array MUST be sorted ascending (binary
  * UTF8 order, `sort_array`'s default): membership probes are binary
  * searches, so one position costs O(maxPieceLen · log |V|).
  *
  * Fused native kernel with codegen (the r11 lesson: a higher-order
  * lambda walk here would run interpreted at corpus-word scale). All
  * output is substrings of the input — no float path, so cross-engine
  * parity with the oracle's fold is exact by construction. */
case class GreedySeg(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "greedy_seg requires (string, array<string>) inputs")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "greedy_seg"

  override def nullSafeEval(w: Any, v: Any): Any =
    GreedySeg.compute(w.asInstanceOf[UTF8String], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, v) => s"graft.functions.GreedySeg.compute($w, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GreedySeg {

  /** Binary search over the sorted vocab for an exact piece match. */
  private def contains(vocab: ArrayData, n: Int, piece: UTF8String): Boolean = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = vocab.getUTF8String(mid).compareTo(piece)
      if (c == 0) return true
      if (c < 0) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  /** Shared by interpreted eval and generated code. */
  def compute(word: UTF8String, vocab: ArrayData): ArrayData = {
    val w = word.toString
    val wl = w.length
    val n = vocab.numElements()
    var maxLen = 1
    var i = 0
    while (i < n) {
      val l = vocab.getUTF8String(i).numChars()
      if (l > maxLen) maxLen = l
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](wl)
    var pos = 0
    while (pos < wl) {
      var l = math.min(maxLen, wl - pos)
      var matched = 0
      while (matched == 0 && l >= 1) {
        if (contains(vocab, n, UTF8String.fromString(w.substring(pos, pos + l))))
          matched = l
        else l -= 1
      }
      // uncovered position: fall back to its single character
      if (matched == 0) matched = 1
      out += UTF8String.fromString(w.substring(pos, pos + matched))
      pos += matched
    }
    new GenericArrayData(out.toArray)
  }
}
