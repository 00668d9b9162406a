package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 60-bit SimHash vote aggregate: `simhash_agg(h)` folds the ±1
  * per-bit votes of 60-bit token hashes into the final hash in ONE
  * aggregate pass.
  *
  * The declarative formulation needs 60 separate `sum((h >> i & 1)*2-1)`
  * aggregate columns — 60 projections and a 60-column partial-agg row
  * per group shuffled between stages. This buffer keeps one int[60] of
  * vote counts per group (240 B serialized), updates it with a single
  * bit-scan loop per token, and merges element-wise — integer
  * arithmetic, so the result is bit-identical to the per-column sums
  * (and to the DuckDB oracle) regardless of partial-aggregation order.
  * Runs under ObjectHashAggregate with map-side partial merge: only one
  * compact buffer per (doc) group crosses the shuffle. */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val Bits = 60

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires bigint token hashes, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < Bits) {
        buffer(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < Bits) {
      if (buffer(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Bits * 4)
    var i = 0
    while (i < Bits) { bb.putInt(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Int](Bits)
    var i = 0
    while (i < Bits) { out(i) = bb.getInt(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
}
