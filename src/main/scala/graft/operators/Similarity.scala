package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Brute-force cosine top-k is the correctness baseline (O(Q·N) with the
  * query side broadcast); the random-hyperplane LSH variant is the scale
  * path (bucketed equi-join instead of a cross join). The cosine itself
  * is a native Catalyst expression ([[graft.functions.CosineSim]]) — one
  * fused codegen'd loop per pair, accumulating in the same sequential
  * order as the DuckDB oracle's `list_reduce`, so values match
  * bit-for-bit. Null (zero-norm) cosines are filtered identically to the
  * oracle's `nrm > 0` guards.
  *
  * Scale notes: at 100 TB the brute-force path broadcasts only the query
  * set and streams the corpus once; LSH buckets bound each join side.
  * Embedding near-dup (`embedNeardup`) uses an offset-explode equi-join
  * rather than a range join so it shuffles on a key and scales linearly.
  */
object Similarity {

  /** Float embedding → double array (exact widening). */
  private def vecd(c: Column): Column = transform(c, x => x.cast("double"))

  private def withVec(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    embeddings.select(col("vec_id"), vecd(col("embedding")).as("v"))
  }

  /** Brute-force cosine top-k per query vector (queries: vec_id % 100 = 0).
    * Deterministic tie-break on neighbor id; self-pairs excluded. */
  def annBruteforce(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val e = withVec(embeddings)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .filter(col("q_id") % 100 === 0)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        expr("cosine_sim(v, qv)").as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("nn_id"), round(col("cos") + lit(5e-9), 4).as("cos"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Deterministic ±1 hyperplane signs, md5-derived so the oracle can
    * inline the identical constants: sign(j,d) = +1 iff the first 32 md5
    * bits of the string (j·64+d) are even. */
  def lshSign(j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(String.valueOf(j * 64 + d).getBytes("UTF-8"))
    val v = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    if (v % 2 == 0) 1.0 else -1.0
  }

  val LshBits = 8
  val Dim = 64

  /** Random-hyperplane LSH bucket id (LshBits-bit signature).
    * The ±1 signs fold into a flat add/subtract chain over the array
    * elements — no per-row literal arrays, no lambda folds — which stays
    * inside whole-stage codegen (the fold version fell back to
    * interpreted evaluation and was ~20× slower). */
  private def bucket(v: Column): Column =
    (0 until LshBits).map { j =>
      val proj = (0 until Dim).foldLeft(lit(0.0): Column) { (acc, d) =>
        if (lshSign(j, d) > 0) acc + v.getItem(d) else acc - v.getItem(d)
      }
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: candidates share the 8-bit bucket,
    * then exact cosine ranks within the bucket. */
  def annLsh(embeddings: DataFrame, k: Int = 3): DataFrame = {
    val e = withVec(embeddings).withColumn("bucket", bucket(col("v")))
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("bucket").as("qbucket"))
      .filter(col("q_id") % 100 === 0)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    e.join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"), col("bucket"),
        expr("cosine_sim(v, qv)").as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("nn_id"), col("bucket"),
        round(col("cos") + lit(5e-9), 4).as("cos"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Multi-probe LSH ANN: each query also probes the 8 buckets at
    * Hamming distance 1 from its own (9 probes total), recovering most of
    * the recall a single-bucket lookup loses on near-boundary projections
    * while still bounding candidates to ~9/256 of the corpus. */
  def annLshMultiprobe(embeddings: DataFrame, k: Int = 3): DataFrame = {
    val e = withVec(embeddings).withColumn("bucket", bucket(col("v")))
    val probes = array(lit(0L) +: (0 until LshBits).map(j => lit(1L << j)): _*)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("bucket").as("qbucket"))
      .filter(col("q_id") % 100 === 0)
      .withColumn("probe", explode(probes))
      .withColumn("probe", col("qbucket").bitwiseXOR(col("probe")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    e.join(broadcast(q), col("bucket") === col("probe") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"), col("bucket"),
        expr("cosine_sim(v, qv)").as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("nn_id"), col("bucket"),
        round(col("cos") + lit(5e-9), 4).as("cos"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Squared L2 distance as a sequential fold (mirrors the oracle). */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** IVF-flat ANN (nprobe = 1): deterministic sampled centroids
    * (vec_id % 97 = 0), every vector assigned to its nearest centroid by
    * squared L2, queries probe their own cell and rank candidates by
    * exact cosine. The scale shape of inverted-file search: assignment is
    * a broadcast of ~n/97 centroids + one narrow pass; the probe is a
    * cell equi-join instead of a cross join. (A Lloyd-iterated k-means
    * refines the same structure; sampled centroids keep it
    * engine-reproducible for the oracle gate.) */
  def annIvf(embeddings: DataFrame, k: Int = 3): DataFrame = {
    val e = withVec(embeddings)
    val cents = e.select(col("vec_id").as("cent_id"), col("v").as("cv"))
      .filter(col("cent_id") % 97 === 0)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cent_id"))
    val assign = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cent_id"),
        dist2(col("v"), col("cv")).as("d2"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val q = assign.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("cell").as("qcell"))
      .filter(col("q_id") % 100 === 0)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    assign.join(broadcast(q), col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"), col("cell"),
        expr("cosine_sim(v, qv)").as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("nn_id"), col("cell"),
        round(col("cos") + lit(5e-9), 4).as("cos"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Embedding-cosine near-dup pairs in an id-banded candidate window
    * (offset-explode equi-join: b.vec_id = a.vec_id + off, off ∈ 1..10). */
  def embedNeardup(embeddings: DataFrame, maxOffset: Int = 10,
      threshold: Double = 0.25): DataFrame = {
    val e = withVec(embeddings)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
      .withColumn("off", explode(sequence(lit(1), lit(maxOffset))))
      .withColumn("b_id", col("vec_a") + col("off"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, col("b_id") === col("vec_b"))
      .select(col("vec_a"), col("vec_b"), expr("cosine_sim(va, vb)").as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos") + lit(5e-9), 4).as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
