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

  /** Top-k over a (vec_id, neighbor_id, cos) pair table with the canonical
    * (cos DESC, neighbor_id ASC) tie-break.
    *
    * k = 1 (every declared query) avoids the window's full per-partition
    * SORT of the pair table: `max(struct(cos, -neighbor_id))` picks the
    * identical winner — struct ordering is (cos, then -id), so highest cos,
    * ties → smallest neighbor — as ONE hash aggregate with map-side partial
    * aggregation: the n² pair rows reduce to one row per vec_id per task
    * BEFORE the exchange, instead of all pairs being sorted. Spark orders
    * NaN above all doubles and nulls below, in sorts and comparisons alike,
    * so the aggregate and the window agree on every edge case. */
  private def topK(pairs: DataFrame, k: Int): DataFrame =
    if (k == 1)
      pairs.groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("neighbor_id")).as("nid"))).as("m"))
        .select(col("vec_id"), lit(1).as("rank"),
          (-col("m.nid")).as("neighbor_id"))
    else {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("vec_id", "rank", "neighbor_id")
    }

  /** Spread a small-on-disk side of a quadratic pair join over the cluster:
    * a tiny parquet scan arrives as ONE split, and a broadcast join keyed on
    * it then runs the whole O(n²) pair loop in ONE task. No-op once the
    * input already has ≥ cluster-parallelism partitions — see
    * [[graft.util.Spread]]. */
  private def spread(df: DataFrame): DataFrame = graft.util.Spread.upTo(df)

  /** Exact brute-force cosine top-k neighbors per vector (excluding self).
    * Output (vec_id, rank, neighbor_id). Ties broken by neighbor id. */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val pairs = spread(e).as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("neighbor_id"),
        pairCos("q", "c").as("cos"))
    topK(pairs, k)
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

  /** Sign-pattern LSH bucket id per vector: bit p = (embedding · plane_p ≥ 0).
    * Plane dots run through the native codegen [[FloatDoubleVecDot]] — same
    * double fold order as the HOF `dot` (and the oracle), none of its
    * per-element interpreted lambda dispatch. */
  def lshBucket(embeddings: DataFrame, seed: Long, nPlanes: Int, dims: Int): DataFrame = {
    val ps = planes(seed, nPlanes, dims)
    val bucket = (0 until nPlanes).map { p =>
      val plane = array(ps(p).map(lit): _*)
      when(graft.functions.VectorFunctions.fddot(col("embedding"), plane) >= 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.withColumn("bucket", bucket)
  }

  /** Bucket histogram — (bucket, n_vectors, min_vec, max_vec). */
  def lshBucketStats(embeddings: DataFrame, seed: Long, nPlanes: Int, dims: Int): DataFrame =
    lshBucket(embeddings, seed, nPlanes, dims)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))

  /** Buckets holding more than `max` rows — the tiny set broadcast into the
    * skew anti-join (same mechanism as DedupOps.minhashNearDups's cap:
    * group-count the key, broadcast the oversized keys, left-anti the
    * CANDIDATE side — never a count window over the hot key). */
  private def oversizedKeys(df: DataFrame, key: String, max: Int): DataFrame =
    df.groupBy(col(key)).count().filter(col("count") > max).select(col(key))

  /** Approximate top-k: exact cosine ranking but only within an LSH bucket.
    * The scale path — the join key is the bucket, so the shuffle is by
    * bucket and no cross product ever materializes. Vectors alone in their
    * bucket produce no rows (the usual multi-probe/rotation tricks would
    * fix recall; out of scope here).
    *
    * `maxBucketSize` is the skew ceiling: a degenerate bucket (a mass of
    * duplicate or near-zero embeddings sharing one sign pattern) must not
    * turn the self-join quadratic, so oversized buckets are dropped from
    * the CANDIDATE side only (queries in them simply find no rows — a
    * documented recall trade, not a correctness one). No-op at test SF, so
    * the cap-free SQL oracle stays bit-identical. */
  def lshTopK(embeddings: DataFrame, k: Int, seed: Long, nPlanes: Int, dims: Int,
      maxBucketSize: Int = 1 << 20): DataFrame = {
    val b = lshBucket(withNorm(embeddings), seed, nPlanes, dims)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val cand = b.join(broadcast(oversizedKeys(b, "bucket", maxBucketSize)),
      Seq("bucket"), "left_anti")
    val pairs = spread(b).as("q").join(cand.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("neighbor_id"),
        pairCos("q", "c").as("cos"))
    topK(pairs, k)
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** Deterministic unit-norm IVF centroid: splitmix64 per component
    * (identical generator to [[planeComponent]] — callers must use a seed
    * distinct from their LSH seed), then L2-normalized so argmax-dot equals
    * argmax-cosine. Data-independent by design: no k-means training job, so
    * at 100 TB the cell assignment stays a pure map-only projection and the
    * oracle SQL can embed the identical literal values. */
  def centroid(seed: Long, cell: Int, dims: Int): Array[Double] = {
    val raw = Array.tabulate(dims)(d => planeComponent(seed, cell, d))
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  def centroids(seed: Long, kCells: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(kCells)(c => centroid(seed, c, dims))

  /** One `(dot, -cell)` struct per centroid — max of these is "highest dot,
    * ties → smallest cell id" under Spark's lexicographic struct ordering.
    * Centroid dots use the codegen [[FloatDoubleVecDot]] (identical values,
    * no interpreted HOF lambda per element — see [[lshBucket]]). */
  private def cellPacked(cs: Array[Array[Double]]): Seq[Column] =
    cs.indices.map { c =>
      struct(graft.functions.VectorFunctions.fddot(col("embedding"),
        array(cs(c).map(lit): _*)).as("d"),
        lit(-c).as("nc"))
    }

  /** Hard cell assignment: argmax over centroid dot products, computed as
    * ONE narrow projection (`greatest` over packed structs) — no join, no
    * explode, nothing broadcast; survives any scale that can scan the
    * embeddings. */
  def ivfCell(embeddings: DataFrame, seed: Long, kCells: Int, dims: Int): DataFrame = {
    require(kCells >= 2, "IVF needs at least 2 cells")
    val best = greatest(cellPacked(centroids(seed, kCells, dims)): _*)
    embeddings.withColumn("cell", (-best.getField("nc")).cast("int"))
  }

  /** Cell histogram — (cell, n_vectors, min_vec, max_vec). */
  def ivfCellStats(embeddings: DataFrame, seed: Long, kCells: Int, dims: Int): DataFrame =
    ivfCell(embeddings, seed, kCells, dims)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))

  /** IVF approximate top-k: every vector is assigned to its nearest cell;
    * each QUERY probes its `nprobe` nearest cells (the standard recall
    * lever) and is ranked by exact cosine against the vectors assigned
    * there. The probe fan-out multiplies query rows by `nprobe`, never
    * candidates; the candidate join is keyed on the cell id, so the shuffle
    * is by cell and no cross product materializes. `maxCellSize` is the
    * skew ceiling (same rationale as DedupOps.minhashNearDups): a
    * degenerate cell must not go quadratic, so oversized cells are dropped
    * from the CANDIDATE side only — vectors assigned there still run as
    * queries through their remaining probe cells instead of silently
    * losing their neighbors (no-op at test scale, pinned by the oracle). */
  def ivfTopK(embeddings: DataFrame, k: Int, seed: Long, kCells: Int, dims: Int,
      nprobe: Int = 2, maxCellSize: Int = 1 << 20): DataFrame = {
    require(nprobe >= 1 && nprobe <= kCells)
    val cs = centroids(seed, kCells, dims)
    val assigned = ivfCell(withNorm(embeddings), seed, kCells, dims)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val cand = assigned.join(
      broadcast(oversizedKeys(assigned, "cell", maxCellSize)),
      Seq("cell"), "left_anti")
    // top-nprobe probe cells: reverse(array_sort) over the packed structs is
    // descending dot with ties → ascending cell, matching the assignment rule
    val probeCells = transform(
      slice(reverse(array_sort(array(cellPacked(cs): _*))), 1, nprobe),
      p => (-p.getField("nc")).cast("int"))
    val qside = assigned.drop("cell")
      .withColumn("cell", explode(probeCells))
    val pairs = qside.as("q").join(spread(cand).as("c"),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("neighbor_id"),
        pairCos("q", "c").as("cos"))
    topK(pairs, k)
  }

  /** Multi-probe LSH top-k: like [[lshTopK]], but each QUERY also probes
    * the `nPlanes` buckets at Hamming distance 1 (one sign bit flipped) —
    * the standard recall fix for vectors near a hyperplane. Candidates stay
    * keyed by their one home bucket, so the join remains a bucket join; the
    * probe explode multiplies only the query side by `nPlanes + 1`. A
    * (query, candidate) pair can meet in at most one probe bucket (the
    * candidate has one home bucket), so no dedup is needed.
    *
    * `maxBucketSize`: see [[lshTopK]] — candidate side only, so queries
    * homed in a degenerate bucket still rank via their other probes. */
  def lshTopKMultiProbe(embeddings: DataFrame, k: Int, seed: Long, nPlanes: Int,
      dims: Int, maxBucketSize: Int = 1 << 20): DataFrame = {
    val home = lshBucket(withNorm(embeddings), seed, nPlanes, dims)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val cand = home.join(broadcast(oversizedKeys(home, "bucket", maxBucketSize)),
      Seq("bucket"), "left_anti")
    val probeBuckets = array(
      col("bucket") +: (0 until nPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val qside = spread(home).select(col("vec_id"), col("embedding"), col("nrm"),
      explode(probeBuckets).as("bucket"))
    val pairs = qside.as("q").join(cand.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("neighbor_id"),
        pairCos("q", "c").as("cos"))
    topK(pairs, k)
  }

  /** Embedding-cosine near-duplicate pairs: (a, b) with cosine ≥ threshold,
    * candidate-limited to shared LSH buckets.
    *
    * `maxBucketSize`: see [[lshTopK]]. Pairs only ever form inside one
    * bucket, so anti-joining ONE side of the self-join suffices to drop a
    * degenerate bucket's quadratic pair set (recall trade, documented). */
  def cosineNearDups(embeddings: DataFrame, threshold: Double, seed: Long,
      nPlanes: Int, dims: Int, maxBucketSize: Int = 1 << 20): DataFrame = {
    val b = lshBucket(withNorm(embeddings), seed, nPlanes, dims)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val cand = b.join(broadcast(oversizedKeys(b, "bucket", maxBucketSize)),
      Seq("bucket"), "left_anti")
    spread(b).as("x").join(cand.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        pairCos("x", "y").as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cosine"))
  }
}
