package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native element-wise vector mean with 6dp rounding:
  * `vec_mean6(array<double>)` → `array<double>`.
  *
  * The declarative formulation (k-means centroid update) exploded every
  * vector into `dim` (cent_id, d, x) rows, per-dim `round(avg(x), 6)`,
  * then re-collected the array — a dim× row amplification plus TWO
  * shuffles per Lloyd iteration. This buffer keeps one running
  * double[dim] sum + count per group, merges element-wise, and rounds
  * each mean exactly as Spark SQL's `round(_, 6)` does (BigDecimal
  * HALF_UP on the double's decimal representation), so the result is
  * identical to the exploded form up to the same summation-order drift
  * the 6dp rounding is there to absorb (the determinism device the
  * Lloyd oracle mirrors). One shuffle, no amplification. */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_mean6 requires array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_mean6"

  override def createAggregationBuffer(): VecMeanAgg.Buf = VecMeanAgg.Buf(null, 0L)

  override def update(buf: VecMeanAgg.Buf, input: InternalRow): VecMeanAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = if (buf.sums == null) new Array[Double](n) else buf.sums
    // Registered as a general session function, so mixed-length input is
    // reachable — fail fast instead of silently truncating dimensions.
    if (n != sums.length) throw new IllegalArgumentException(
      s"vec_mean6: vector length $n != group's first vector length ${sums.length}")
    var i = 0
    while (i < n) { sums(i) += arr.getDouble(i); i += 1 }
    VecMeanAgg.Buf(sums, buf.count + 1)
  }

  override def merge(a: VecMeanAgg.Buf, b: VecMeanAgg.Buf): VecMeanAgg.Buf = {
    if (b.sums == null) return a
    if (a.sums == null) return b
    if (a.sums.length != b.sums.length) throw new IllegalArgumentException(
      s"vec_mean6: cannot merge buffers of length ${a.sums.length} and ${b.sums.length}")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    VecMeanAgg.Buf(a.sums, a.count + b.count)
  }

  override def eval(buf: VecMeanAgg.Buf): Any = {
    if (buf.sums == null || buf.count == 0) return null
    val out = new Array[Double](buf.sums.length)
    var i = 0
    while (i < out.length) {
      // exactly Spark SQL round(x, 6): HALF_UP on the decimal repr
      out(i) = BigDecimal(buf.sums(i) / buf.count)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecMeanAgg.Buf): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * n)
    bb.putLong(buf.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    if (n == 0) VecMeanAgg.Buf(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble(); i += 1 }
      VecMeanAgg.Buf(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
}

object VecMeanAgg {
  /** Running element-wise sums (sized lazily from the first vector) and
    * the contributing row count. */
  case class Buf(sums: Array[Double], count: Long)
}
