package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate: `minhash_agg(h, k)` folds 32-bit
  * shingle hashes into the k-permutation signature
  * `min_j((2j+1)·h + j mod p)` in ONE aggregate pass.
  *
  * The declarative formulation needs k separate `min(...)` aggregate
  * columns — k projection expressions per input row and a k-column
  * partial-agg row per group. This buffer keeps one long[k] of running
  * minima per group, updates with a single permutation loop per
  * shingle, and merges element-wise — integer arithmetic throughout
  * ((2j+1)·h < 2^39, far from overflow), so the signature is
  * bit-identical to the per-column mins and to the DuckDB oracle.
  * `k` must be a foldable literal (it sizes the buffer). */
case class MinhashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import graft.operators.Dedup.MinhashPrime

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case LongType => TypeCheckResult.TypeCheckFailure("minhash_agg needs k > 0")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires bigint shingle hashes, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < k) {
        val p = (h * (2L * j + 1) + j) % MinhashPrime
        if (p < buffer(j)) buffer(j) = p
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (other(j) < buffer(j)) buffer(j) = other(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var j = 0
    while (j < k) { bb.putLong(buffer(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) { out(j) = bb.getLong(); j += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(inputAggBufferOffset = newOffset)
}
