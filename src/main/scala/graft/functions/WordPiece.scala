package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The declared subword vocabulary for [[WpStats]] — one definition
  * feeding BOTH the compiled greedy matcher and the oracle's `VALUES`
  * table, so the two engines tokenize against byte-identical vocab.
  *
  * Shape of a real WordPiece vocab in miniature: multi-character units
  * for frequent fragments plus single-character fallbacks. The
  * single-char set deliberately omits j/q/x/z — a word needing one of
  * those at a position no multi-char unit covers is out-of-vocabulary
  * (whole-word [UNK], the WordPiece convention), so the OOV path is
  * exercised by real corpus words (e.g. "join"), not synthetic ones. */
object WordPieceVocab {
  val entries: Seq[String] = Seq(
    // multi-char subword units
    "the", "qu", "er", "or", "ow", "an", "in", "on", "at", "en", "ue",
    "al", "ar", "le", "ne", "re", "st", "sc", "sp", "ch", "sh", "gg",
    "ta", "to", "ge", "mer", "val", "row", "line", "sort", "part",
    "data", "hash", "fast", "scan", "key", "big", "ream",
    // single-char fallbacks (no j/q/x/z)
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "k", "l", "m", "n",
    "o", "p", "r", "s", "t", "u", "v", "w", "y",
    "0", "1", "2", "3", "4", "5", "6", "7", "8", "9")

  val MaxLen: Int = entries.map(_.length).max

  /** Hash set for the hot path (per-position longest-prefix probes). */
  private[functions] val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](entries.size * 2)
    entries.foreach(s.add)
    s
  }
}

/** Greedy longest-match subword tokenization stats over a document —
  * `wp_stats(text)` → struct(n_words, n_tokens, n_unk).
  *
  * Semantics (mirrored exactly by the oracle's recursive-CTE walk):
  * words are maximal `[A-Za-z0-9]+` runs (every other code point is a
  * separator), ASCII-lowercased; each word is encoded by repeatedly
  * taking the LONGEST vocabulary entry matching at the current
  * position; a position with no match makes the whole word [UNK]
  * (1 token, counted in n_unk). One fused pass per document — the
  * operator is embarrassingly per-row, so the tokenize query plan has
  * ZERO shuffles before its output sort; at 100 TB it is a pure
  * map-side projection. All counting is exact integer work: no float
  * parity risk cross-engine. */
case class WpStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("wp_stats requires a string input")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def prettyName: String = "wp_stats"

  override def nullSafeEval(input: Any): Any =
    WpStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WpStats.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WpStats {

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Shared by interpreted eval and generated code. Works on the
    * materialized String: the word alphabet is ASCII, and any non-ASCII
    * char (including each half of a surrogate pair) is a separator —
    * the same word set DuckDB's codepoint-level regexp split produces. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    var nWords = 0L; var nTokens = 0L; var nUnk = 0L
    var i = 0
    val buf = new java.lang.StringBuilder(16)
    while (i <= n) {
      if (i < n && isAlnum(str.charAt(i))) {
        buf.append(lower(str.charAt(i)))
      } else if (buf.length > 0) {
        nWords += 1
        val w = buf.toString
        buf.setLength(0)
        // greedy longest-match walk
        var pos = 0; var tokens = 0L; var ok = true
        val wl = w.length
        while (ok && pos < wl) {
          var l = math.min(WordPieceVocab.MaxLen, wl - pos)
          var matched = 0
          while (matched == 0 && l >= 1) {
            if (WordPieceVocab.set.contains(w.substring(pos, pos + l))) matched = l
            else l -= 1
          }
          if (matched > 0) { pos += matched; tokens += 1 }
          else ok = false
        }
        if (ok) nTokens += tokens
        else { nTokens += 1; nUnk += 1 }
      }
      i += 1
    }
    InternalRow(nWords, nTokens, nUnk)
  }
}
