package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k best (price desc, id asc) pairs in
  * a bounded buffer.
  *
  * The window `row_number` formulation of top-k-per-group shuffles every
  * row and sorts each partition; this Aggregator does map-side partial
  * top-k (each partial buffer is ≤ k entries), so only k rows per group
  * per mapper cross the wire — the scale-correct shape for 100 TB
  * grouped top-k. Results are identical (same deterministic tie-break).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  /** SQL total ordering, not Scala `>`: primitive Double comparisons are
    * always-false on NaN, which would let a NaN value land anywhere in
    * the merged partial top-k while the oracle's `ORDER BY value DESC`
    * sorts NaN as the largest value. `java.lang.Double.compare` ranks
    * NaN above every finite double — the same total order Spark and
    * DuckDB use — so merge ≡ recompute holds even on NaN inputs. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def topK(xs: Array[(Double, Long)]): Array[(Double, Long)] =
    xs.sortWith(better).take(k)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], row: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) topK(buf :+ row)
    else if (better(row, buf.last)) topK(buf :+ row)
    else buf

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    topK(a ++ b)

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    Encoders.kryo[Array[(Double, Long)]]
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    Encoders.kryo[Array[(Double, Long)]]
}
