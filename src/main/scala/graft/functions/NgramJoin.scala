package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle generator: `ngram_join(words, n)` produces the
  * array of space-joined n-grams of a token array — element i is
  * `concat_ws(' ', words[i], …, words[i+n-1])`, exactly the strings of
  * the `transform(sequence(0, size-n), i -> concat_ws(' ', …))` chain
  * it replaces (null tokens skipped like concat_ws; fewer than n
  * tokens → empty array). That chain is the hottest per-document
  * kernel of the dedup/ngram family (every document expands to ~one
  * shingle per word across minhash, jaccard, novelty, top-ngrams,
  * overlap) and Spark evaluates it interpreted: a materialized index
  * array plus a lambda dispatch and an expression-tree concat per
  * element. Here it is one loop, one UTF8String concat per gram. */
case class NgramJoin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      // n is foldable, so evaluating it at analysis time is safe; n < 1
      // is rejected rather than silently diverging from the
      // transform+concat_ws chain (whose n=0 form yields size+1 empty
      // strings — a shape no caller wants).
      right.eval() match {
        case n: Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("ngram_join requires n >= 1")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "ngram_join requires (array<string>, foldable int)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_join"

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramJoin.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) =>
      s"${ev.value} = graft.functions.NgramJoin.compute($arr, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object NgramJoin {
  private val SPACE = UTF8String.fromString(" ")

  /** Shared by interpreted eval and the generated code. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0 || n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      var k = 0
      while (j < n) {
        // concat_ws semantics: null tokens are skipped, not rendered
        if (!words.isNullAt(i + j)) {
          window(k) = words.getUTF8String(i + j)
          k += 1
        }
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE,
        (if (k == n) window else java.util.Arrays.copyOf(window, k)): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
