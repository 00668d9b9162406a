package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot join keys.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the explicit pre-plan fix when one key dominates (e.g. one symbol with
  * 100× traffic at 100 TB): the probe side gets a deterministic salt from
  * a high-cardinality column, the build side is replicated once per salt,
  * and the join key becomes (key, salt) — spreading a hot key over
  * `salt` reducers at the cost of replicating the build side.
  */
object Skew {

  /** Inner-join `left` (large, possibly skewed on `key`) with `right`
    * (small enough to replicate `salt` times). `saltSource` must be a
    * left-side column with per-row variety (an id); results equal the
    * plain join exactly. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltSource: String, salt: Int = 8): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(salt)))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
