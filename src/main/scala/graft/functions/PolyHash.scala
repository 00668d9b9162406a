package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit polynomial rolling hash (base 31, mod 2^32) over a
  * string's characters — the document-fingerprint kernel. Replaces the
  * `aggregate(sequence(1, length(s)), 0L, (acc, i) ->
  * (acc*31 + ascii(substring(s, i, 1))) % 4294967296)` fold, which
  * materializes an index array and runs an interpreted lambda (with a
  * substring allocation) PER CHARACTER. Iterates code points, so it is
  * bit-identical to the ascii() fold for any input; the fingerprint
  * pipeline feeds it ASCII-normalized text. */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("poly_hash requires a string input")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.PolyHash.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Shared by interpreted eval and the generated code. `ascii(c)` is
    * the code point of the character, so iterate code points — decoded
    * directly from the UTF8String's bytes (no per-row String copy; the
    * toString allocation showed up as the residual cost on large
    * normalized documents). Falls back to the String path on a
    * malformed sequence so the result stays bit-identical to
    * `codePointAt` (whose decoder substitutes U+FFFD) on any input. */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 0
      if (b0 < 0x80) { cp = b0; len = 1 }
      else if (b0 < 0xC2) return computeSlow(s) // continuation/overlong lead
      else if (b0 < 0xE0) { cp = b0 & 0x1F; len = 2 }
      else if (b0 < 0xF0) { cp = b0 & 0x0F; len = 3 }
      else if (b0 < 0xF5) { cp = b0 & 0x07; len = 4 }
      else return computeSlow(s)
      if (i + len > n) return computeSlow(s)
      var j = 1
      while (j < len) {
        val bj = s.getByte(i + j) & 0xFF
        if ((bj & 0xC0) != 0x80) return computeSlow(s)
        cp = (cp << 6) | (bj & 0x3F)
        j += 1
      }
      // Overlong encodings and surrogate code points are malformed UTF-8:
      // Java's decoder replaces them, so defer to it for bit-equality.
      if ((len == 2 && cp < 0x80) || (len == 3 && (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF))) ||
          (len == 4 && (cp < 0x10000 || cp > 0x10FFFF))) return computeSlow(s)
      acc = (acc * 31L + cp) % 4294967296L
      i += len
    }
    acc
  }

  /** Reference path: materialize the String and walk `codePointAt`,
    * matching the original ascii()-fold semantics on malformed input. */
  private def computeSlow(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % 4294967296L
      i += Character.charCount(cp)
    }
    acc
  }
}
