package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-maintenance operators a large-scale training-data pipeline needs
  * beyond per-document dedup/quality: corpus-frequency boilerplate-line
  * removal (the CCNet / RefinedWeb line-level dedup step — navigation bars,
  * cookie banners and footers repeat across documents of a host and must be
  * stripped before training) and deterministic hash-based train/val/test
  * splitting (assignment must be a pure function of content so re-runs,
  * backfills and multi-site runs agree without coordination).
  *
  * Portability contract (same as [[DedupOps]]): only constructs with
  * bit-identical DuckDB semantics — newline split, distinct-count, md5 hex,
  * integer arithmetic — so every operator here is oracle-checkable.
  */
object CorpusOps {

  /** Lines occurring in at least `minDocs` DISTINCT documents — the
    * boilerplate set. Distinct-doc counting (not raw occurrence counting)
    * is the pinned semantic: a line repeated inside ONE document is content
    * (e.g. a refrain), not boilerplate.
    *
    * Scale shape: TWO exchanges, both with map-side partial aggregation —
    * distinct-doc counting is inherently a two-exchange aggregate (partial
    * dedup keyed (line, doc_id), exchange on that pair, then the count
    * re-shuffled on line); no single-shuffle plan computes countDistinct
    * exactly. The RESULT is small by construction — at threshold K the
    * boilerplate set has at most total_lines/K members and in practice is
    * tiny (it is the site chrome of the corpus) — which is what makes the
    * broadcast in [[removeBoilerplateLines]] safe at 100 TB. */
  def boilerplateLines(docs: DataFrame, minDocs: Long): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Per-document boilerplate-line removal: rebuilds each document's text
    * with every boilerplate line dropped, preserving the original line
    * order, plus kept/removed counts. A document that is ALL boilerplate
    * yields an empty `cleaned_text` (a downstream length filter drops it).
    *
    * Three exchanges total (the boilerplate count's two — see
    * [[boilerplateLines]] — plus the per-doc reassembly); the per-line
    * membership test itself is a broadcast hash join against the small
    * boilerplate set, so the EXPLODED lines are shuffled exactly once (on
    * doc_id), never on the join key.
    *
    * `broadcastBoiler = false` drops the forced broadcast for the regime
    * where the boilerplate set itself is huge — a low ABSOLUTE threshold
    * over a very large corpus (minDocs=3 at 100 TB can yield billions of
    * lines, past any driver/executor memory). Catalyst then picks the
    * strategy itself: with AQE it still broadcasts when the aggregated set
    * measures small at runtime, and degrades to a shuffled join (one extra
    * exchange of the exploded lines, never an OOM) when it does not. */
  def removeBoilerplateLines(docs: DataFrame, minDocs: Long,
      broadcastBoiler: Boolean = true): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val boiler0 = boilerplateLines(docs, minDocs)
      .select(col("line"), lit(1).as("__boiler"))
    val boiler = if (broadcastBoiler) broadcast(boiler0) else boiler0
    lines.join(boiler, Seq("line"), "left")
      .groupBy(col("doc_id"))
      .agg(
        // collect_list skips nulls, so only kept lines enter; array_sort on
        // the (pos, line) struct restores document order deterministically
        array_join(transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("cleaned_text"),
        count(when(col("__boiler").isNull, 1)).as("kept_lines"),
        count(when(col("__boiler").isNotNull, 1)).as("removed_lines"))
  }

  // PII patterns (Java regex, evaluated by Catalyst's codegen'd
  // RegExpReplace/RegExpCount — no UDF). Scrub order matters: emails first
  // (their digits must not half-match the phone pattern), then phones, then
  // IPv4. The \b guards keep version-ish strings ("v1.2.3.4") intact.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Map-only PII redaction over a text column: emails → `<EMAIL>`, simple
    * NANP-style phone numbers → `<PHONE>`, IPv4 literals → `<IP>`, plus
    * per-kind match counts (for scrub-rate monitoring). Pure per-row
    * projection — no shuffle, stays inside whole-stage codegen, and the
    * counts aggregate map-side if rolled up downstream.
    *
    * Each kind is COUNTED on the text with all earlier-stage redactions
    * applied, mirroring the replacement chain exactly — so a match the
    * chain redacts as one kind is never double-counted as another (an
    * email like `bob@1.2.3.4.net` is one email, zero IPs; a phone-shaped
    * email local part never increments n_phones). Counts always agree
    * with what `clean_text` actually replaced. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val afterEmails = regexp_replace(t, emailRe, "<EMAIL>")
    val afterPhones = regexp_replace(afterEmails, phoneRe, "<PHONE>")
    docs
      .withColumn("n_emails", regexp_count(t, lit(emailRe)))
      .withColumn("n_phones", regexp_count(afterEmails, lit(phoneRe)))
      .withColumn("n_ips", regexp_count(afterPhones, lit(ipv4Re)))
      .withColumn("clean_text", regexp_replace(afterPhones, ipv4Re, "<IP>"))
  }

  /** Deterministic content-hash split assignment: bucket = first 32 bits of
    * md5(text) mod 100, split by cumulative percentage (train < trainPct ≤
    * val < trainPct+valPct ≤ test). Pure per-row projection — map-only, no
    * shuffle, embarrassingly parallel at any scale — and a pure function of
    * content, so the assignment survives re-partitioning, re-runs and
    * engine changes (md5 is the same everywhere; xxhash64 is not). */
  def hashSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"), lit(100L))
    docs.select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }
}
