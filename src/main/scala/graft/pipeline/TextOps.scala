package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents(doc_id, text, lang, source, n_chars)` table: token counting,
  * quality scoring, language-ID, and document fingerprinting.
  *
  * Everything except language-ID and the rolling-hash fingerprint stays in
  * built-in codegen'd `functions._` (no UDF in the hot path), so at 100 TB the
  * whole stage is one whole-stage-codegen pass over the parquet scan with only
  * `text` read.
  */
object TextOps {

  /** Whitespace tokens — split on single spaces, matching DuckDB
    * `string_split(text,' ')` exactly for oracle parity. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword tokens: word pieces + digits + punctuation runs. A
    * regex approximation of byte-pair-encoded token counts (the usual
    * pre-tokenizer split), good enough for corpus-size accounting. */
  def bpeishTokens(text: Column): Column =
    // contiguous letter runs, digit runs, or single non-space symbols
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for")

  /** Per-document quality metrics (length / stopword / mean-token-length
    * ratios). All ratios are exact rational arithmetic over token counts →
    * deterministic and oracle-portable at round(…,4). */
  def qualityScore(df: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    df.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      round(expr(s"size(filter(split(text, ' '), t -> t IN ($sw)))") /
        size(toks), 4).as("stopword_ratio"),
      round((length(col("text")) - size(toks) + 1).cast("double") /
        size(toks), 4).as("mean_token_len"))
  }

  // ---------- language ID (n-gram heuristic) ----------

  /** Tiny deterministic character-trigram language profiles. Public-knowledge
    * heuristic (rank-order trigram profiling à la Cavnar & Trenkle 1994),
    * trained on nothing — just hand-picked high-frequency trigrams per
    * language. Scoring = count of profile trigram hits per language,
    * normalized by text length; argmax wins, ties broken by language code.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "de" -> Seq ("er ", " de", "der", "ie ", "ein", "ich", "sch", "ch ", "die", "und"),
    "fr" -> Seq(" le", "le ", " de", "de ", "es ", "ent", " la", "la ", "ion", "que"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "ión", "ent", "que"),
    "it" -> Seq(" di", "di ", "to ", " il", "il ", "re ", "la ", "che", "one", "ent"))

  /** Sorted language list and per-language trigram hash sets, built once:
    * the scoring loop walks the text ONCE per language with an O(1) set
    * probe instead of substring-scanning a Seq — same hits, same argmax. */
  private val langProfileSets: Seq[(String, Set[String])] =
    langProfiles.toSeq.sortBy(_._1).map { case (l, p) => (l, p.toSet) }

  /** (guessedLang, score) — pure function, usable as a UDF. */
  def guessLang(text: String): (String, Double) = {
    if (text == null || text.length < 3) return ("und", 0.0)
    val t = text.toLowerCase
    val nTri = t.length - 2
    // one substring per position, shared across the language loop (the
    // per-language substring allocation dominated the old kernel)
    val tris = new Array[String](nTri)
    var i = 0
    while (i < nTri) { tris(i) = t.substring(i, i + 3); i += 1 }
    var best = "und"; var bestScore = 0.0
    langProfileSets.foreach { case (lang, profile) =>
      var hits = 0
      i = 0
      while (i < nTri) {
        if (profile.contains(tris(i))) hits += 1
        i += 1
      }
      val score = hits.toDouble / nTri
      if (score > bestScore) { best = lang; bestScore = score }
    }
    (best, bestScore)
  }

  val guessLangUdf = udf((text: String) => guessLang(text))

  def langId(df: DataFrame): DataFrame =
    df.select(col("doc_id"), guessLangUdf(col("text")).as("g"))
      .select(col("doc_id"), col("g._1").as("lang_guess"),
        round(col("g._2"), 4).as("lang_score"))

  // ---------- document fingerprinting (rolling hash) ----------

  /** Rabin–Karp rolling hash fingerprint: polynomial hash of the UTF-8 bytes
    * (base 257, mod 2^61-1) plus the minimum windowed hash (winnowing-style
    * w=16 window min), giving both an exact-content fingerprint and a
    * shift-robust one. Pure; deterministic.
    */
  def fingerprint(text: String): (Long, Long) = {
    if (text == null) return (0L, 0L)
    val MOD = (1L << 61) - 1
    val BASE = 257L
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = multmod(h, BASE, MOD)
      h = (h + (bytes(i) & 0xff) + 1) % MOD
      i += 1
    }
    // windowed min-hash of w-byte windows (winnowing, Schleimer et al. 2003)
    val w = 16
    var minWin = Long.MaxValue
    if (bytes.length >= w) {
      var basePow = 1L
      (0 until w - 1).foreach(_ => basePow = multmod(basePow, BASE, MOD))
      var wh = 0L
      i = 0
      while (i < bytes.length) {
        if (i >= w) {
          val out = ((bytes(i - w) & 0xff) + 1) % MOD
          wh = (wh - multmod(out, basePow, MOD) % MOD + MOD) % MOD
        }
        wh = multmod(wh, BASE, MOD)
        wh = (wh + (bytes(i) & 0xff) + 1) % MOD
        if (i >= w - 1 && wh < minWin) minWin = wh
        i += 1
      }
    } else minWin = h
    (h, minWin)
  }

  /** (a*b) mod m without overflow for m < 2^62, via Math.multiplyHigh. */
  private def multmod(a: Long, b: Long, m: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // 128-bit mod via shift-reduce for m = 2^61-1 (Mersenne): fold hi bits
    // (hi:lo) mod (2^61-1): x = lo&M + (hi<<3 | lo>>>61); repeat fold
    val M = (1L << 61) - 1
    require(m == M, "multmod specialized for 2^61-1")
    var x = (lo & M) + ((hi << 3) | (lo >>> 61))
    if (x >= M) x -= M
    if (x >= M) x -= M
    x
  }

  val fingerprintUdf = udf((text: String) => fingerprint(text))

  def fingerprints(df: DataFrame): DataFrame =
    df.select(col("doc_id"), fingerprintUdf(col("text")).as("f"))
      .select(col("doc_id"), col("f._1").as("content_hash"),
        col("f._2").as("min_window_hash"))
}
