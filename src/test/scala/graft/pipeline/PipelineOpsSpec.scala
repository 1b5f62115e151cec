package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def docs = Seq(
    (0L, "the cat sat on the mat", "en", "srcA", 22L),
    (1L, "the cat sat on the mat", "en", "srcA", 22L), // exact dup of 0
    (2L, "the cat sat on the red mat", "en", "srcA", 26L), // near dup
    (3L, "completely different words here entirely", "en", "srcB", 40L),
    (4L, "der hund und die katze sind schön", "de", "srcB", 33L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---------- TextOps ----------

  test("token stats and quality metrics") {
    val q = TextOps.qualityScore(docs).collect().map(r =>
      r.getLong(0) -> r).toMap
    assert(q(0L).getAs[Int]("n_tokens") == 6)
    // "the" twice + "on" of 6 tokens
    assert(q(0L).getAs[Double]("stopword_ratio") == 0.5)
    // (22 - 6 + 1)/6
    assert(q(0L).getAs[Double]("mean_token_len") == 2.8333)
  }

  test("bpeish tokens split words, digits and symbols") {
    val n = docs.select(size(TextOps.bpeishTokens(col("text")))).as[Int].collect()
    assert(n(0) == 6)
    val one = Seq((9L, "ab12 c-d!", "x", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val toks = one.select(TextOps.bpeishTokens(col("text"))).as[Seq[String]].head()
    assert(toks == Seq("ab", "12", "c", "-", "d", "!"))
  }

  test("fingerprint is deterministic, content-sensitive, shift-robust min-hash") {
    val (h1, m1) = TextOps.fingerprint("the cat sat on the mat and then some more")
    val (h2, m2) = TextOps.fingerprint("the cat sat on the mat and then some more")
    val (h3, _) = TextOps.fingerprint("the cat sat on the mat and then some morE")
    assert(h1 == h2 && m1 == m2)
    assert(h1 != h3)
    // winnowing min-hash survives a prefix shift (same 16-byte windows exist)
    val (_, mShift) = TextOps.fingerprint("XYZ the cat sat on the mat and then some more")
    assert(mShift <= m1) // min over a superset of windows
  }

  test("langId picks a language deterministically") {
    val out = TextOps.langId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "en")
    assert(out(4L) == "de")
  }

  // ---------- DedupOps ----------

  test("exact dedup groups identical texts") {
    val d = DedupOps.exactDedup(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(d.length == 4) // 5 docs, one exact dup pair
    val dup = d.filter(_._3 == 2)
    assert(dup.length == 1 && dup.head._2 == 0L)
  }

  test("minhash: identical texts share signatures; banding buckets them") {
    val sig = DedupOps.minhash(docs, 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(sig(0L) == sig(1L))
    assert(sig(0L) != sig(3L))
    val buckets = DedupOps.minhashLshBuckets(docs, 4, 2).collect()
    val withDup = buckets.filter(_.getAs[Long]("n_docs") >= 2)
    assert(withDup.nonEmpty)
  }

  test("minhash near-dups finds the exact and near pair, jaccard exact") {
    val pairs = DedupOps.minhashNearDups(docs, 4, 2, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((0L, 1L)).contains(1.0))
    // doc2 vs doc0: tokens {the,cat,sat,on,mat} vs +{red}: 5/6
    pairs.get((0L, 2L)).foreach(j => assert(j == 0.8333))
  }

  test("minhash near-dup bucket ceiling bounds degenerate buckets") {
    // 30 identical docs land in one band bucket → 435 candidate pairs; the
    // ceiling must drop the degenerate bucket BEFORE the self-join
    val dup = (0L until 30L).map(i => (i, "same same same text", "en", "srcA", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(DedupOps.minhashNearDups(dup, 4, 2, 0.0).count() == 30L * 29 / 2)
    assert(DedupOps.minhashNearDups(dup, 4, 2, 0.0, maxBucketSize = 8).count() == 0)
    // non-degenerate pairs unaffected by an active ceiling
    val mixed = DedupOps.minhashNearDups(docs, 4, 2, 0.5, maxBucketSize = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(mixed.get((0L, 1L)).contains(1.0))
  }

  test("ngram document-frequency ceiling drops boilerplate shingles") {
    val n = 10
    val boiler = (0L until n.toLong).map(i =>
        (i, s"common boiler plate unique$i tail$i end$i", "en", "srcA", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // every doc shares exactly one gram ("common boiler plate") → all pairs
    assert(DedupOps.ngramJaccardPairs(boiler, 3, 0.0).count() == n.toLong * (n - 1) / 2)
    // DF ceiling below n removes the boilerplate gram → no pairs join
    assert(DedupOps.ngramJaccardPairs(boiler, 3, 0.0, maxDocFreq = 5).count() == 0)
    // uncapped pairs on ordinary docs are unchanged by a high ceiling
    val a = DedupOps.ngramJaccardPairs(docs, 3, 0.0).collect().map(_.toSeq).toSet
    val b = DedupOps.ngramJaccardPairs(docs, 3, 0.0, maxDocFreq = 100).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("simhash: 64 bits, equal for dups, unequal for different docs") {
    val sh = DedupOps.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(sh(0L) == sh(1L))
    assert(sh(0L) != sh(3L))
    // near-dup should be close in hamming distance
    val ham = sh(0L).zip(sh(2L)).count { case (a, b) => a != b }
    val hamFar = sh(0L).zip(sh(3L)).count { case (a, b) => a != b }
    assert(ham < hamFar)
  }

  test("ngram jaccard pairs within source blocks") {
    val pairs = DedupOps.ngramJaccardPairs(docs, 3, 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L))) // share "the cat sat", "cat sat on"
    assert(!pairs.exists { case ((a, b), _) => a == 3L || b == 3L }) // srcB no overlap
  }

  // ---------- SimOps ----------

  def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.95f, 0.05f), 1),
    (4L, Array(-1.0f, -1.0f, -1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force cosine top-1 finds the obvious neighbors") {
    val nn = SimOps.cosineTopK(vecs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nn(0L) == 1L && nn(1L) == 0L)
    assert(nn(2L) == 3L && nn(3L) == 2L)
  }

  test("LSH bucketing is deterministic and bucket-join top-k ⊆ brute-force candidates") {
    val b1 = SimOps.lshBucket(vecs, 42L, 6, 3).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    val b2 = SimOps.lshBucket(vecs, 42L, 6, 3).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(b1 == b2)
    val approx = SimOps.lshTopK(vecs, 1, 42L, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // any returned neighbor must share the bucket of its query
    val bk = SimOps.lshBucket(vecs, 42L, 4, 3).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    approx.foreach { case (q, n) => assert(bk(q) == bk(n)) }
  }

  test("IVF cell assignment matches an independent scala-side argmax") {
    val cs = SimOps.centroids(7L, 4, 3)
    val assigned = SimOps.ivfCell(vecs, 7L, 4, 3).select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val raw = vecs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    raw.foreach { case (id, emb) =>
      val dots = cs.map(c => emb.indices.map(i => emb(i) * c(i)).sum)
      val want = dots.indices.minBy(i => (-dots(i), i)) // max dot, tie → min cell
      assert(assigned(id) == want, s"vec $id")
    }
  }

  test("IVF top-k with full probe equals brute force; neighbors come from probed cells") {
    // nprobe = kCells ⇒ every (query, candidate) pair is considered exactly
    // once (candidates sit in their one assigned cell) ⇒ brute-force parity
    val full = SimOps.ivfTopK(vecs, 1, 7L, 4, 3, nprobe = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val brute = SimOps.cosineTopK(vecs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(full == brute)
    // nprobe = 2: any returned neighbor's assigned cell ∈ query's 2 nearest
    val cs = SimOps.centroids(7L, 4, 3)
    val raw = vecs.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def ranked(emb: Array[Float]) = cs.indices
      .sortBy(i => (-cs(i).indices.map(d => emb(d) * cs(i)(d)).sum, i))
    val assigned = SimOps.ivfCell(vecs, 7L, 4, 3).select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    SimOps.ivfTopK(vecs, 1, 7L, 4, 3, nprobe = 2).collect().foreach { r =>
      val probes = ranked(raw(r.getLong(0))).take(2).toSet
      assert(probes.contains(assigned(r.getLong(2))))
    }
  }

  test("multi-probe LSH: candidate set contains single-probe's; probes are Hamming-1") {
    val single = SimOps.lshTopK(vecs, 1, 42L, 4, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val multi = SimOps.lshTopKMultiProbe(vecs, 1, 42L, 4, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every query answered by single-probe is answered by multi-probe (its
    // candidate set is a superset), and with a >= cosine neighbor
    val brute = SimOps.cosineTopK(vecs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    single.keys.foreach(q => assert(multi.contains(q)))
    assert(multi.size >= single.size)
    // any multi-probe neighbor shares the query's bucket up to 1 flipped bit
    val bk = SimOps.lshBucket(vecs, 42L, 4, 3).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    multi.foreach { case (q, n) =>
      val ham = java.lang.Long.bitCount(bk(q) ^ bk(n))
      assert(ham <= 1, s"q=$q n=$n hamming=$ham")
    }
    // recall against brute force can only improve
    val recS = single.count { case (q, n) => brute(q) == n }
    val recM = multi.count { case (q, n) => brute(q) == n }
    assert(recM >= recS)
  }

  test("IVF skew ceiling drops a degenerate cell from the candidate side only") {
    // 6 identical vectors all land in one cell; cap 4 ⇒ that cell's vectors
    // never serve as candidates, but they still run as QUERIES through
    // their remaining probe cells (the r2 both-sides drop silently returned
    // no neighbors for them)
    val degen = ((0L to 5L).map(i => (i, Array(1.0f, 0.0f, 0.0f), 0)) :+
      ((9L, Array(-1.0f, -0.5f, 0.2f), 1))).toDF("vec_id", "embedding", "label")
    // nprobe=1: queries only probe their own (emptied) cell → no pairs; the
    // outlier probes its own cell where it is the only vector → no pairs
    val capped1 = SimOps.ivfTopK(degen, 1, 7L, 4, 3, nprobe = 1, maxCellSize = 4)
    assert(capped1.count() == 0)
    val uncapped = SimOps.ivfTopK(degen, 1, 7L, 4, 3, nprobe = 1)
    assert(uncapped.count() >= 6)
    // full probe: every degenerate-cell vector still finds the outlier (the
    // one surviving candidate); no returned neighbor comes from the capped
    // cell
    val cappedFull = SimOps.ivfTopK(degen, 1, 7L, 4, 3, nprobe = 4, maxCellSize = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L to 5L).foreach(q => assert(cappedFull.get(q).contains(9L),
      s"query $q must keep ranking via surviving probe cells"))
    assert(cappedFull.values.forall(_ == 9L))
  }

  test("hyperplane-LSH skew ceiling: degenerate bucket never self-joins") {
    // 6 duplicate embeddings share one sign pattern; cap 4 ⇒ the bucket is
    // dropped from the candidate side in all three LSH-family ops
    val degen = ((0L to 5L).map(i => (i, Array(1.0f, 0.0f, 0.0f), 0)) :+
      ((9L, Array(-1.0f, -0.5f, 0.2f), 1))).toDF("vec_id", "embedding", "label")
    assert(SimOps.lshTopK(degen, 1, 42L, 4, 3, maxBucketSize = 4).count() == 0)
    assert(SimOps.lshTopK(degen, 1, 42L, 4, 3).count() >= 6) // cap-free baseline
    assert(SimOps.cosineNearDups(degen, 0.0, 42L, 4, 3, maxBucketSize = 4).count() == 0)
    assert(SimOps.cosineNearDups(degen, 0.9, 42L, 4, 3).count() >= 15) // 6C2 dups
    // multi-probe: queries homed in the capped bucket still rank via their
    // Hamming-1 probes; any surviving neighbor is outside the capped bucket
    val bk = SimOps.lshBucket(degen, 42L, 4, 3).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    val mp = SimOps.lshTopKMultiProbe(degen, 1, 42L, 4, 3, maxBucketSize = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    mp.foreach { case (_, n) => assert(bk(n) != bk(0L),
      "no candidate may come from the capped bucket") }
    if (java.lang.Long.bitCount(bk(0L) ^ bk(9L)) <= 1)
      (0L to 5L).foreach(q => assert(mp.get(q).contains(9L)))
  }

  test("cosine near-dups at high threshold keep only the close pairs") {
    val nd = SimOps.cosineNearDups(vecs, 0.99, 42L, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!nd.contains((0L, 2L)))
  }

  // ---------- MediaOps ----------

  test("media stats and frame features: deterministic stub decode plumbing") {
    val stats = MediaOps.mediaStats(docs, frameSize = 8).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("n_bytes"), r.getLong(2))).toMap
    assert(stats(0L)._1 == 22 && stats(0L)._2 == 3) // ceil(22/8)
    val frames = MediaOps.frameFeatures(docs, frameSize = 8, sampleEvery = 2)
      .filter(col("media_id") === 0).collect()
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 2)) // frames 0,1,2 → sampled 0,2
    val f0 = frames.head
    assert(f0.getAs[Int]("f_len") == 8)
    // "the cat " bytes: min=' '(32), max='t'(116)
    assert(f0.getAs[Int]("f_min") == 32 && f0.getAs[Int]("f_max") == 116)
  }

  // ---------- CorpusOps ----------

  test("boilerplate line removal: distinct-doc frequency, order, all-boilerplate docs") {
    val multi = Seq(
      (1L, "BANNER\nalpha one\nFOOTER"),
      (2L, "BANNER\nbeta two\nFOOTER"),
      (3L, "BANNER\ngamma three"),
      (4L, "BANNER\nFOOTER"), // all boilerplate
      // "echo" repeats inside ONE doc -> doc_freq 1 -> content, kept 3x;
      // interleaving pins order preservation
      (5L, "echo\necho\ndelta five\necho")
    ).toDF("doc_id", "text")
    // BANNER df=4, FOOTER df=3 (== threshold, removed), echo df=1 (kept)
    val boiler = CorpusOps.boilerplateLines(multi, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(boiler == Map("BANNER" -> 4L, "FOOTER" -> 3L))
    val out = CorpusOps.removeBoilerplateLines(multi, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha one", 1L, 2L)))
    assert(out(3L) == (("gamma three", 1L, 1L)))
    assert(out(4L) == (("", 0L, 2L))) // fully boilerplate, not dropped
    assert(out(5L) == (("echo\necho\ndelta five\necho", 4L, 0L)))

    // broadcastBoiler=false (the huge-boilerplate-set regime: Catalyst picks
    // the join strategy) must be result-identical to the forced broadcast
    val noBcast = CorpusOps.removeBoilerplateLines(multi, 3, broadcastBoiler = false)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(noBcast == out)
  }

  test("pii scrub: emails, phones, ipv4 redacted; lookalikes untouched") {
    val in = Seq(
      (1L, "mail bob@corp.net or call 555-867-5309 from 10.0.0.1"),
      (2L, "user@localhost and v1.2.3.4 are not pii"),
      (3L, "dotted 123.456.7890 is a phone, not an ip"),
      (4L, "ip-shaped email host bob@1.2.3.4.net counts once")
    ).toDF("doc_id", "text")
    val out = CorpusOps.scrubPii(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ==
      "mail <EMAIL> or call <PHONE> from <IP>")
    assert(out(1L).getAs[Int]("n_emails") == 1 &&
      out(1L).getAs[Int]("n_phones") == 1 && out(1L).getAs[Int]("n_ips") == 1)
    // no TLD -> not an email; no word boundary after 'v' -> not an ip
    assert(out(2L).getAs[String]("clean_text") ==
      "user@localhost and v1.2.3.4 are not pii")
    assert(out(3L).getAs[String]("clean_text") ==
      "dotted <PHONE> is a phone, not an ip")
    assert(out(3L).getAs[Int]("n_ips") == 0)
    // counts mirror the replacement chain: a match redacted as an EMAIL is
    // never also counted as an IP (each kind counts on the text with all
    // earlier-stage redactions applied)
    assert(out(4L).getAs[String]("clean_text") ==
      "ip-shaped email host <EMAIL> counts once")
    assert(out(4L).getAs[Int]("n_emails") == 1 &&
      out(4L).getAs[Int]("n_phones") == 0 && out(4L).getAs[Int]("n_ips") == 0)
  }

  test("hash split is deterministic, in-range, and pinned to md5 semantics") {
    val in = Seq((1L, "abc"), (2L, "abc"), (3L, "xyz")).toDF("doc_id", "text")
    val rows = CorpusOps.hashSplit(in).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // md5("abc") = 900150 98... -> 0x90015098 = 2416005272 -> % 100 = 72
    assert(rows(1L) == ((72L, "train")))
    assert(rows(1L) == rows(2L)) // pure function of content
    rows.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      assert(s == (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    // split boundaries honor custom percentages
    val splits = CorpusOps.hashSplit(in, trainPct = 10, valPct = 80).collect()
      .map(r => r.getLong(1) -> r.getString(2))
    splits.foreach { case (b, s) =>
      assert(s == (if (b < 10) "train" else if (b < 90) "val" else "test"))
    }
  }
}
