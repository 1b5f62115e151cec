package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation over `documents`:
  * exact (hash-groupBy), MinHash signatures + LSH banding, SimHash, word
  * n-gram Jaccard, and embedding-cosine near-dup (in [[SimOps]]).
  *
  * Portability contract: every function here that feeds a DuckDB oracle uses
  * only constructs with bit-identical semantics in both engines — `md5` hex
  * strings (string min = unsigned-byte min, identical collation for hex),
  * integer arithmetic, and exact rational ratios rounded at 4 decimals.
  * Hash-based signatures therefore use min-over-md5 rather than xxhash64
  * (which DuckDB lacks). At scale md5-per-token is still cheap relative to
  * the shuffle the groupBy needs anyway, and stays inside whole-stage
  * codegen.
  */
object DedupOps {

  /** Exact dedup by full-content hash: one row per distinct md5(text) with
    * the kept doc (min id) and the duplicate count. The canonical
    * "hash-groupBy" exact dedup — at 100 TB this is a single shuffle on a
    * 16-byte key with map-side partial aggregation. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct whitespace tokens per doc, exploded: (doc_id, tok). The
    * explode fans each row out ~|tokens| ways, so the input is spread to
    * cluster parallelism first (no-op at scale — [[graft.util.Spread]]). */
  def docTokens(docs: DataFrame): DataFrame =
    graft.util.Spread.upTo(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** MinHash signature over the distinct-token set: k portable "hash
    * permutations", permutation i = md5("i:" ++ token); the signature
    * component is the minimum hex digest. */
  def minhash(docs: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("tok")))).as(s"mh$i"))
    docTokens(docs).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a k-hash MinHash signature with `rows` hashes per band:
    * output (band, band_sig, n_docs, min_doc, max_doc) — the bucket
    * histogram. Docs sharing (band, band_sig) are near-dup candidates; the
    * bucket-join (self-join on the band signature) is how candidates pair up
    * at scale without the O(n²) cross join. */
  /** (doc_id, band, band_sig) in ONE pass over the signature table:
    * posexplode of the per-band signature array — the nBands-way union of
    * full signature scans this replaces re-read (and re-shuffled) the
    * signature aggregation once per band. `pos` is exactly the band index
    * (same 0-based order, same int type as the old `lit(b)`). */
  private def bandsOf(sig: DataFrame, k: Int, rows: Int): DataFrame = {
    val nBands = k / rows
    val bandSigs = (0 until nBands).map { b =>
      concat_ws("|", (b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*)
    }
    sig.select(col("doc_id"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "band_sig")))
  }

  def minhashLshBuckets(docs: DataFrame, k: Int, rows: Int): DataFrame =
    bandsOf(minhash(docs, k), k, rows)
      .groupBy(col("band"), col("band_sig"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  /** Candidate near-dup pairs from LSH buckets, verified with the exact
    * token-set Jaccard, keeping pairs ≥ threshold. This is the full
    * shingle→minhash→band→bucket-join pipeline; the exact-verify join only
    * touches candidate pairs, never the cross product. */
  def minhashNearDups(docs: DataFrame, k: Int, rows: Int, threshold: Double,
      maxBucketSize: Int = 1 << 20): DataFrame = {
    // Eager localCheckpoint, NOT .cache() (the r5 version leaked both
    // persists in the CacheManager for the session's lifetime — keyed on the
    // canonical plan, those entries survive even after the result is
    // dropped): the signature table feeds FOUR subtrees (self-join x/y,
    // the oversized-bucket count, and transitively the band explode), and
    // its min-over-md5-hex aggregation is a SortAggregate tower over the
    // full token explode — without materialization the plan pays it four
    // times (measured 11 s → 190 s at sf0.1). A localCheckpoint runs the
    // tower exactly once, truncates the plan to an RDD leaf, and the
    // ContextCleaner releases the partitions when the result is dropped.
    val sig = minhash(docs, k).localCheckpoint(true)
    val bands0 = bandsOf(sig, k, rows)
    // Skew ceiling: a degenerate band signature (empty/boilerplate docs)
    // turns the bucket self-join quadratic — count(bucket)² pairs. Buckets
    // over maxBucketSize are dropped BEFORE the join (their members are
    // exact-duplicate-shaped and belong to exactDedup, not near-dup pairing).
    // groupBy + broadcast anti-join, NOT a window: a count window partitioned
    // by the bucket key would funnel the very bucket it defends against into
    // one sort task, while groupBy partial-aggregates it map-side; the
    // oversized-key set is tiny by construction (≤ rows/maxBucketSize keys).
    val oversized = bands0.groupBy(col("band"), col("band_sig")).count()
      .filter(col("count") > maxBucketSize).select(col("band"), col("band_sig"))
    val bands = bands0.join(broadcast(oversized), Seq("band", "band_sig"), "left_anti")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    // same reasoning: the token-set table feeds both verify-join sides.
    // Set size is computed ONCE per doc here; the per-pair |A∪B| is then
    // pure arithmetic (|A|+|B|−|A∩B| — exact for the duplicate-free
    // collect_set arrays), so each verified pair pays ONE array hash-set
    // pass (the intersect) instead of the intersect + a same-cost
    // array_union.
    val toks = docTokens(docs).groupBy("doc_id")
      .agg(collect_set(col("tok")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("sz"))
      .localCheckpoint(true)
    cand.join(toks.select(col("doc_id").as("a"), col("toks").as("ta"),
        col("sz").as("sza")), "a")
      .join(toks.select(col("doc_id").as("b"), col("toks").as("tb"),
        col("sz").as("szb")), "b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ---------- SimHash ----------

  /** Portable 64-bit SimHash over the distinct-token set, emitted as a
    * 64-char '0'/'1' string. Bit b comes from hex digit b/4 (1-indexed
    * substring position b/4+1) of md5(token), mask 8>>(b%4); the bit is 1
    * iff the (+1/-1) vote sum over tokens is ≥ 0. Every sub-expression is
    * integer-exact and shared verbatim with the DuckDB oracle
    * ([[simhashOracleSql]]).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val bitCols = (0 until 64).map { b =>
      val d = b / 4 + 1
      val p = 8 >> (b % 4)
      // digit value 0..15, then extract bit via floor-div/mod; `h` is the
      // per-token md5 computed ONCE in the projection below — 64 aggregate
      // expressions referencing one shared digest column instead of each
      // embedding its own md5(tok) call. NOTE (r6): hoisting the 16
      // instr(substr(h,d,1)) digit extractions into their own projection was
      // tried and measured NEUTRAL-to-worse (interleaved best-of-5: 1.06 s
      // old vs 1.27 s hoisted at sf0.1) — whole-stage codegen's
      // subexpression elimination already shares them across the 64
      // aggregate expressions (unlike across a lambda boundary, see
      // [[shinglesOf]]), so the extra projection only adds a row copy.
      val v = expr(s"instr('0123456789abcdef', substr(h, $d, 1)) - 1")
      val bit = (floor(v / p.toDouble).cast("int") % 2)
      sum(bit * 2 - 1).as(s"s$b")
    }
    val sums = docTokens(docs).withColumn("h", md5(col("tok")))
      .groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val bits = (0 until 64).map(b => when(col(s"s$b") >= 0, lit("1")).otherwise(lit("0")))
    sums.select(col("doc_id"), concat(bits: _*).as("simhash_bits"))
  }

  /** DuckDB SQL computing the identical simhash over `documents`. */
  def simhashOracleSql(docsTable: String): String = {
    val sums = (0 until 64).map { b =>
      val d = b / 4 + 1
      val p = 8 >> (b % 4)
      s"sum((cast(floor((instr('0123456789abcdef', substr(md5(tok), $d, 1)) - 1) / $p.0) as int) % 2) * 2 - 1) AS s$b"
    }.mkString(", ")
    val bits = (0 until 64).map(b => s"CASE WHEN s$b >= 0 THEN '1' ELSE '0' END").mkString(", ")
    s"""SELECT doc_id, concat($bits) AS simhash_bits FROM (
       |  SELECT doc_id, $sums FROM (
       |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM $docsTable
       |  ) GROUP BY doc_id
       |) ORDER BY doc_id""".stripMargin
  }

  // ---------- word n-gram Jaccard ----------

  /** Distinct word n-gram set over a PRE-SPLIT token-array column.
    *
    * The tokens must arrive as a bound column (split once per row in a
    * projection below), never as `split(text,' ')` inlined here: a `split`
    * inside the transform lambda is re-evaluated per element — Catalyst's
    * subexpression elimination does not hoist across the lambda boundary —
    * making shingling O(|tokens|²) per document. Measured at sf0.1
    * (interleaved best-of-5): the per-doc size projection 1.48 s → 0.42 s
    * per pass, the shingle explode 0.29 s → 0.20 s, the full
    * q_ngram_jaccard 3.6 s → 0.94 s. */
  def shinglesOf(toks: Column, n: Int = 3): Column = {
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** Exact n-gram Jaccard similarity for doc pairs within the same `source`
    * block, emitting pairs with jaccard > minJaccard (≥ 0 ⇒ only pairs
    * sharing at least one shingle).
    *
    * Inverted-index formulation, not a blocked cross join: explode distinct
    * shingles, self-join on (source, shingle) to count |A∩B| — only pairs
    * that actually share a shingle ever materialize — then
    * |A∪B| = |A|+|B|−|A∩B| from per-doc shingle counts. Work scales with
    * the number of truly-overlapping pairs instead of the block size
    * squared (the 250-doc blocks at sf0.1 made the cross-join version
    * ~100× slower than this). */
  /** @param maxDocFreq document-frequency ceiling per (source, gram):
    *   shingles appearing in more docs than this are dropped from the
    *   inverted index BEFORE the self-join (0 = disabled). At corpus scale a
    *   boilerplate trigram shared by 10^6 docs would alone contribute 10^12
    *   join rows; ultra-common shingles carry no near-dup signal (their
    *   selectivity is ~1) so a ceiling bounds the join at negligible recall
    *   cost. NOTE: with a ceiling the |A∩B| counts exclude capped grams while
    *   sizes still include them — jaccard becomes a lower bound (documented
    *   scale/exactness trade; leave 0 where oracle parity is required). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.0,
      maxDocFreq: Long = 0L): DataFrame = {
    // The shingle explode fans every doc out ~|tokens| ways, so its input is
    // spread to cluster parallelism first (no-op at scale — Spread.upTo).
    // Tokens are split ONCE per row into a bound column below the shingle
    // transform (see [[shinglesOf]]); the token array itself is never
    // shuffled — the spread moves the raw text, the split runs post-shuffle.
    val spreadDocs = graft.util.Spread.upTo(
      docs.select(col("doc_id"), col("text"), col("source")))
    val sh0 = spreadDocs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), col("source"),
        explode(shinglesOf(col("__toks"), n)).as("gram"))
    val sh =
      if (maxDocFreq <= 0L) sh0
      else {
        // groupBy + broadcast anti-join, not a window, for the same
        // skew-safety reason as minhashNearDups' bucket ceiling
        val common = sh0.groupBy(col("source"), col("gram")).count()
          .filter(col("count") > maxDocFreq).select(col("source"), col("gram"))
        sh0.join(broadcast(common), Seq("source", "gram"), "left_anti")
      }
    // SHUFFLE_HASH self-join on (source, gram): the two sides' exchanges are
    // identical, so ReuseExchange computes the exploded inverted index ONCE
    // and reads it twice — where the r5 broadcast plan exploded it once per
    // side and collected one full copy through the driver — and a hash join
    // needs none of the sort-merge join's two per-partition sorts of the
    // index. Skewed hot grams stay AQE-splittable, and the build side is a
    // single (source, gram) hash partition, the standard inverted-index
    // join shape.
    val inter = sh.as("x").hint("shuffle_hash").join(sh.as("y"),
        col("x.source") === col("y.source") && col("x.gram") === col("y.gram") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    // |A| is the LENGTH of the distinct-shingle array — a map-only
    // projection (the r5 plan re-exploded and re-aggregated the corpus
    // twice to count it); joined onto the much smaller pair table. The
    // two-step select keeps the split bound OUTSIDE the shingle lambda
    // (CollapseProject never inlines a multiply-referenced non-trivial
    // alias, so the hoist survives optimization).
    val sizes = docs.select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), size(shinglesOf(col("__toks"), n)).as("sz"))
    // filter on the UNROUNDED ratio (round only in the projection): a pair
    // with tiny-but-positive jaccard must survive minJaccard=0 exactly as in
    // the oracle's `intersection > 0` predicate (inter >= 1 by construction,
    // so the 0-threshold filter is vacuous — kept for minJaccard > 0)
    val raw = col("inter").cast("double") / (col("sza") + col("szb") - col("inter"))
    val joined = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
    (if (minJaccard > 0.0) joined.filter(raw > minJaccard) else joined)
      .withColumn("jaccard", round(raw, 4))
      .select("a", "b", "jaccard")
  }
}
