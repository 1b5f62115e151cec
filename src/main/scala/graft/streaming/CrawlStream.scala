package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.crawl.FrontierRound

/** Structured-Streaming expression of the reference's continuous
  * event-driven loop (tarantula is an always-on service: pages arrive,
  * links flow out, the seen-set grows — SURVEY.md §2.9). The batch-iterative
  * [[graft.crawl.CrawlJob]] is the deterministic round model; this module is
  * the streaming face of the same operators for ingest-time use:
  *
  *  - [[extractedLinks]]: pages stream → canonicalized scoped links stream
  *    (X1/X2/U1-U8 as one stage, html never crosses the stream shuffle);
  *  - [[dedupedLinks]]: stateful URL-seen filter — first occurrence of each
  *    canonical url passes, duplicates drop (J2 as streaming state, keyed by
  *    url so state is hash-partitioned across executors like the seen
  *    table's buckets);
  *  - [[hostRates]]: per-host fetch-rate accounting over event-time tumbling
  *    windows with a watermark (the politeness ledger, A1/A4).
  */
object CrawlStream {

  final case class StreamLink(url: String, host: String, parent_url: String, rank: Int)

  /** Pages stream → links stream. Same kernel as the batch path
    * ([[FrontierRound.extractChildrenUdf]]), so batch and streaming dedup
    * agree on the canonical url space. */
  def extractedLinks(pages: DataFrame): DataFrame =
    pages
      .withColumn("host", FrontierRound.hostOfUdf(col("url")))
      .withColumn("protocol", FrontierRound.protocolOfUdf(col("url")))
      .select(col("url").as("parent_url"), col("warc_ts"),
        explode(FrontierRound.extractChildrenUdf(
          col("protocol"), col("host"), col("html"), col("url")).getField("children")).as("c"))
      .select(col("c.url").as("url"), FrontierRound.hostOfUdf(col("c.url")).as("host"),
        col("parent_url"), col("c.rank").as("rank"), col("warc_ts"))

  /** Stateful URL-seen filter: keyed by canonical url; the first arrival
    * passes, every later one is dropped. State per key is a single boolean —
    * at 10^10 urls the state store is sharded by the url hash across
    * executors exactly like the batch seen table's buckets. */
  def dedupedLinks(spark: SparkSession, links: DataFrame): Dataset[StreamLink] = {
    import spark.implicits._
    links.select(col("url"), col("host"), col("parent_url"), col("rank"))
      .as[StreamLink]
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[StreamLink], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
        })
  }

  /** Streaming exact content-dedup for a documents stream — the streaming
    * face of [[graft.pipeline.DedupOps.exactDedup]] (same md5(text) key),
    * for ingest-time curation. `dropDuplicatesWithinWatermark` keeps the
    * state store BOUNDED: at corpus ingest rates an unbounded dedup state
    * is an executor OOM, so keys age out past the watermark horizon —
    * trading cross-horizon duplicates (caught later by the exhaustive batch
    * exactDedup) for bounded state. Input needs (doc_id, text, ts). */
  def dedupedDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_md5", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** One url awaiting its polite fetch slot; `event_ms` is the link's
    * event time (e.g. discovery time) — a slot is never earlier than it. */
  final case class FetchRequest(url: String, host: String, event_ms: Long)

  final case class ScheduledFetch(url: String, host: String, not_before_ms: Long)

  /** Streaming politeness scheduler — A1's per-host budget in streaming
    * form (the reference enforces ≥ crawl_delay_ms between a host's
    * requests at fetch time, page_loader/src/http/http_client.rs:79-83).
    * Instead of dropping or buffering over-quota links (a streaming
    * pipeline has no defer queue), every admitted url is stamped with its
    * earliest POLITE fetch time:
    * `slot = max(event_ms, previous_slot + crawlDelayMs + 1)` — the +1
    * matches the reference gate exactly: `is_blocked` holds while
    * `elapsed <= rate_limiting_ms` (http_client.rs:79-83), so the first
    * allowed millisecond is strictly past the delay, not at it. The
    * event-time clamp means a host that goes quiet re-anchors to the
    * present instead of handing out a backlog of already-elapsed slots
    * (which a fetcher would fire all at once, violating the invariant).
    * State per host is ONE long (the last slot), so the state store is
    * bounded by host count. Each host's micro-batch slice is SORTED by
    * (event_ms, url) before slots are assigned: group-iterator order is not
    * stable across micro-batch replays, so without the sort a
    * failure-recovery replay could append different url→slot pairings than
    * the original attempt (Append-mode sinks would then hold both). The
    * sort materializes one host's slice of one micro-batch — bounded by the
    * trigger (maxFilesPerTrigger / maxOffsetsPerTrigger), not by the host's
    * total url count. That bound is ENFORCED, not assumed: an unbounded
    * trigger (e.g. the whole backlog in the first micro-batch after a
    * restart) would otherwise materialize a mega-host's full url set in one
    * task heap — `maxHostSlice` fails the query fast with the trigger
    * config to fix, instead of an executor OOM mid-sort. */
  def politenessSchedule(spark: SparkSession, links: Dataset[FetchRequest],
      crawlDelayMs: Long, maxHostSlice: Int = 4 << 20): Dataset[ScheduledFetch] = {
    import spark.implicits._
    links.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (host: String, rows: Iterator[FetchRequest], state: GroupState[Long]) => {
          var last: Option[Long] = state.getOption
          val buf = new scala.collection.mutable.ArrayBuffer[FetchRequest]
          while (rows.hasNext) {
            buf += rows.next()
            if (buf.size > maxHostSlice) throw new IllegalStateException(
              s"politenessSchedule: host '$host' exceeds $maxHostSlice urls in one " +
                "micro-batch slice (replay-deterministic slot assignment sorts the " +
                "slice in memory). Bound the trigger (maxFilesPerTrigger / " +
                "maxOffsetsPerTrigger) or raise maxHostSlice.")
          }
          buf.sortInPlace()(Ordering.by(r => (r.event_ms, r.url))).iterator.map { r =>
            val slot = last.map(l => math.max(r.event_ms, l + crawlDelayMs + 1))
              .getOrElse(r.event_ms)
            last = Some(slot)
            state.update(slot)
            ScheduledFetch(r.url, host, slot)
          }
        })
  }

  /** Per-host politeness ledger: fetches per host per 1-second event-time
    * window, 10-second watermark for late captures. */
  def hostRates(pages: DataFrame): DataFrame =
    pages
      .withColumn("host", FrontierRound.hostOfUdf(col("url")))
      .withWatermark("warc_ts", "10 seconds")
      .groupBy(window(col("warc_ts"), "1 second"), col("host"))
      .agg(count(lit(1)).as("fetches"))
      .select(col("window.start").as("win_start"), col("host"), col("fetches"))
}
