package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  * Two paths, per the scale plan:
  *  - [[cosineTopK]]: brute-force exact top-k — the correctness baseline.
  *    O(n²) dot products; only for modest n or as the within-bucket kernel.
  *  - [[lshTopK]]: random-hyperplane LSH — vectors are bucketed by the sign
  *    pattern of `nPlanes` fixed hyperplanes; candidate pairs only form
  *    within a bucket (self-join on bucket id), turning the cross join into
  *    a bucketed join that scales linearly with bucket occupancy. The
  *    hyperplanes are a pure function of a seed (splitmix64), so every
  *    executor regenerates them identically — nothing is broadcast.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd higher-order
  * functions) — no UDF.
  */
object SimOps {

  /** dot(a, b) accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** (vec_id, embedding, nrm) with the L2 norm precomputed once per vector —
    * never per pair. Uses the native codegen [[FloatVecDot]] expression. */
  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.fnorm(col("embedding")).as("nrm"))

  private def pairCos(q: String, c: String): Column =
    graft.functions.VectorFunctions.fdot(col(s"$q.embedding"), col(s"$c.embedding")) /
      (col(s"$q.nrm") * col(s"$c.nrm"))

  /** Exact brute-force cosine top-k neighbors per vector (excluding self).
    * Output (vec_id, rank, neighbor_id). Ties broken by neighbor id. */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val pairs = e.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("neighbor_id"),
        pairCos("q", "c").as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }

  /** Deterministic hyperplane component for (plane, dim) — in [-1, 1].
    * `Synth.mix` masks with `& Long.MaxValue`, so the quotient is in [0, 1]
    * and the affine map lands in [-1, 1], unbiased (the oracle SQL embeds
    * the same literal values, so both sides always agree by construction). */
  def planeComponent(seed: Long, plane: Int, dim: Int): Double =
    (graft.synth.Synth.mix(seed, plane.toLong, dim.toLong).toDouble /
      Long.MaxValue.toDouble) * 2.0 - 1.0

  def planes(seed: Long, nPlanes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dims)((p, d) => planeComponent(seed, p, d))

  /** Sign-pattern LSH bucket id per vector: bit p = (embedding · plane_p ≥ 0). */
  def lshBucket(embeddings: DataFrame, seed: Long, nPlanes: Int, dims: Int): DataFrame = {
    val ps = planes(seed, nPlanes, dims)
    val bucket = (0 until nPlanes).map { p =>
      val plane = array(ps(p).map(lit): _*)
      when(dot(col("embedding"), plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.withColumn("bucket", bucket)
  }

  /** Bucket histogram — (bucket, n_vectors, min_vec, max_vec). */
  def lshBucketStats(embeddings: DataFrame, seed: Long, nPlanes: Int, dims: Int): DataFrame =
    lshBucket(embeddings, seed, nPlanes, dims)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))

  /** Approximate top-k: exact cosine ranking but only within an LSH bucket.
    * The scale path — the join key is the bucket, so the shuffle is by
    * bucket and no cross product ever materializes. Vectors alone in their
    * bucket produce no rows (the usual multi-probe/rotation tricks would
    * fix recall; out of scope here). */
  def lshTopK(embeddings: DataFrame, k: Int, seed: Long, nPlanes: Int, dims: Int): DataFrame = {
    val b = lshBucket(withNorm(embeddings), seed, nPlanes, dims)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val pairs = b.as("q").join(b.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("neighbor_id"),
        pairCos("q", "c").as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }

  /** Embedding-cosine near-duplicate pairs: (a, b) with cosine ≥ threshold,
    * candidate-limited to shared LSH buckets. */
  def cosineNearDups(embeddings: DataFrame, threshold: Double, seed: Long,
      nPlanes: Int, dims: Int): DataFrame = {
    val b = lshBucket(withNorm(embeddings), seed, nPlanes, dims)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        pairCos("x", "y").as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cosine"))
  }
}
