package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.canon.{UrlCanon, LinkExtract, UriScope}
import graft.model._
import graft.robots.Robots

/** A canonicalized child link produced by one parent page. */
final case class ChildLink(url: String, raw_url: String, rank: Int)

/** Link-extraction output for one fetched page. */
final case class PageLinks(n_links: Int, children: Seq[ChildLink])

/** One extracted link in the reference's response shape
  * (responses/src/link.rs:7-13: uri + optional scope/protocol/source_tag) —
  * the JSONL export's per-page link inventory, including the scoped-out
  * classes (External/Mailto/…) that never reach the frontier. */
final case class LinkOut(uri: String, scope: String, protocol: String,
    source_tag: String)

/** One crawl round as pure DataFrame transformations (SURVEY.md §3.4).
  *
  * Spark-first layout: everything is a declarative plan — Catalyst pushes the
  * cheap gates below the joins, prunes the fat `html` column until the single
  * projection that parses it, and AQE handles skewed shuffles. UDFs appear
  * exactly where the north rule allows them: URL canonicalization and HTML
  * link extraction.
  */
object FrontierRound {

  /** DDL of the per-hop redirect chain ([[graft.model.RedirectHop]]). */
  val chainType: String =
    "array<struct<source:string,destination:string,status:int,headers:map<string,string>>>"

  // ---------- UDFs (pure; never marked nondeterministic) ----------

  val hostOfUdf = udf((u: String) => UrlCanon.hostOf(u).getOrElse(""))
  val protocolOfUdf = udf((u: String) => UrlCanon.protocolOf(u).getOrElse("https"))

  val canonUdf = udf((proto: String, uri: String, host: String, parent: String) =>
    UrlCanon.formFullUrl(proto, uri, host, Option(parent)))

  val canAccessUdf = udf((disallowAll: Boolean, allowAll: Boolean, body: String, agent: String, url: String) =>
    Robots.canAccess(disallowAll, allowAll, Option(body).getOrElse(""), agent, url))

  val prioChildUdf = udf((parent: Array[Byte], rank: Int) => Priority.child(parent, rank))

  /** The whole per-page child pipeline in one pass over the html, so the fat
    * body bytes never cross a shuffle (SURVEY.md §7.4):
    * extract (document order, first href/src/data-src per element) → sort by
    * raw uri → adjacent dedup → retain scoped → whitelist
    * Root/SameDomain/DifferentSubDomain → form_full_url → rank.
    * n_links counts ALL sorted links pre-dedup (the reference keeps the full
    * list on the response, page_loader_service.rs:140-144).
    */
  val extractChildrenUdf = udf((protocol: String, host: String, html: Array[Byte], parentUrl: String) => {
    if (html == null) PageLinks(-1, Seq.empty)
    else {
      val body = new String(html, java.nio.charset.StandardCharsets.UTF_8)
      val links = LinkExtract.extractLinks(protocol, host, body)
      val deduped = LinkExtract.dedupByUri(links)
      val children = deduped.iterator
        .filter(l => l.scope.exists(UriScope.enqueueable.contains))
        .zipWithIndex
        .map { case (l, i) =>
          ChildLink(UrlCanon.formFullUrl(protocol, l.uri, host, Some(parentUrl)), l.uri, i)
        }
        .toSeq
      PageLinks(links.size, children)
    }
  })

  /** FULL sorted pre-dedup link list of one page — the reference keeps this
    * list on the PageResponse (page_response.rs:17, set from the extraction
    * before enqueue-side dedup, page_loader_service.rs:140-144), so
    * `links.size == n_links` by construction. Export-path only: the hot
    * round keeps the lean [[extractChildrenUdf]] output. */
  val extractAllLinksUdf = udf((protocol: String, host: String, html: Array[Byte]) =>
    if (html == null) Seq.empty[LinkOut]
    else LinkExtract.extractLinks(protocol, host,
        new String(html, java.nio.charset.StandardCharsets.UTF_8))
      .map(l => LinkOut(l.uri, l.scope.orNull, l.protocol.orNull, l.sourceTag)))

  /** Per-page link inventory for the JSONL export (url → links array):
    * re-joins the fat `html` only for rows that parsed a body (n_links ≥ 0)
    * and re-runs the extraction with the SAME (protocol, host, body) triple
    * the round used, so the array agrees with the row's n_links. Runs only
    * when `exportJsonl` is on — never in the hot round loop. */
  def exportLinks(results: DataFrame, pages: DataFrame): DataFrame =
    results.filter(col("n_links") >= 0)
      .select(col("url"), col("host"), col("final_url"))
      .join(pages.select(col("url").as("pb_url"), col("html").as("pb_html")),
        col("final_url") === col("pb_url"), "left")
      .select(col("url"),
        extractAllLinksUdf(protocolOfUdf(col("url")), col("host"),
          col("pb_html")).as("links"))

  // ---------- static per-job preparation ----------

  /** Per-host robots decision cache (reference derives it per task from one
    * robots.txt fetch, robots_service.rs:55-110). Small → broadcast. */
  def buildRobotsCache(robots: DataFrame): DataFrame = {
    val mk = udf((status: Int, body: String) => Robots.fromStatus(status, Option(body).getOrElse("")))
    robots.select(col("host"), mk(col("status"), col("body")).as("r"))
      .select(col("host"), col("r.disallowAll").as("disallow_all"),
        col("r.allowAll").as("allow_all"), col("r.body").as("robots_body"))
  }

  /** Transitive closure of the redirects fixture, bounded by maxRedirects —
    * computed ONCE per job (redirect chains are static), so each round pays a
    * single join instead of maxRedirects+1 iterative ones
    * (reference follows redirects recursively per request,
    * fetch_header_command.rs:31-69; location headers are canonicalized
    * against the CURRENT hop's scheme/host, :73-90).
    *
    * Output: (start_url, final_url, n_redirects, terminal_is_redirect,
    * terminal_status, redirects). final_url = last followed destination
    * (= the reference's get_final_uri, head_response.rs:30-36); `redirects`
    * is the per-hop (source, destination, status) chain of FOLLOWED hops —
    * one struct per append_redirect call (fetch_header_command.rs:73-90); a
    * budget-terminal 3xx is never appended (the guard stops before
    * following it).
    */
  def resolveRedirects(spark: SparkSession, redirects: DataFrame, cfg: CrawlConfig): DataFrame = {
    import spark.implicits._
    // hop headers: optional fixture column (keys lowercased on ingestion —
    // F9, same rule as page headers); absent/null rows get the minimal
    // faithful map — a followed redirect response always carried at least
    // its location header (fetch_header_command.rs:47-52 reads it from the
    // response whose full header map rides the hop)
    val defaultHopHeaders = map(lit("location"), col("location"))
    val hopHeaders =
      if (redirects.columns.contains("headers"))
        coalesce(transform_keys(col("headers"), (k, _) => lower(k)), defaultHopHeaders)
      else defaultHopHeaders
    val r = redirects.select(
      col("src_url"), col("location"), col("status").cast("int"),
      hopHeaders.as("hop_headers"))
      .withColumn("dest", canonUdf(protocolOfUdf(col("src_url")), col("location"),
        hostOfUdf(col("src_url")), col("src_url")))
      .cache()

    // Exact hop-table size, known up front (the count materializes `r`'s
    // cache, which the first hop would have paid anyway): small tables get
    // (a) broadcast hop joins below and (b) a single-partition closure leaf
    // — a LocalRelation-fed closure otherwise checkpoints at ~one partition
    // per row, and every round's redirect join then dispatches that many
    // near-empty tasks.
    val smallHopTable = r.count() <= cfg.redirectBroadcastMaxRows

    // Collapse the finished closure to a LogicalRDD leaf HERE (eager
    // checkpoint): the closure is a maxRedirects-deep join/union tree that
    // every round's plan would otherwise embed and re-analyze, and
    // materializing inside lets `r`'s cache — which exists only to dedupe
    // the hop joins of this one build — be released immediately instead of
    // lingering for the job's lifetime.
    def finish(plan: DataFrame): DataFrame = {
      val out = (if (smallHopTable) plan.coalesce(1) else plan).localCheckpoint(true)
      r.unpersist()
      out
    }

    val emptyChain = array().cast(FrontierRound.chainType)

    if (cfg.ignoreRedirects || cfg.maxRedirects == 0) {
      // HEAD answers 3xx but the chain is never followed (run_config
      // ignore_redirects, fetch_header_command.rs:49) — no hops recorded
      return finish(r.select(col("src_url").as("start_url"), col("src_url").as("final_url"),
        lit(0).as("n_redirects"), lit(true).as("terminal_is_redirect"),
        col("status").as("terminal_status"), emptyChain.as("redirects")))
    }

    def hop(source: Column, destination: Column, status: Column, headers: Column): Column =
      struct(source.as("source"), destination.as("destination"), status.as("status"),
        headers.as("headers"))

    // Join-strategy choice for the per-hop joins: a small hop table takes a
    // broadcast hint, so all maxRedirects hop joins become map-side
    // BroadcastHashJoins over ONE reused broadcast exchange — no per-hop
    // shuffle or sort. A big hop table keeps the shuffle joins (broadcast
    // would be the scale-killer). Either path computes the identical
    // closure.
    val hopSide = if (smallHopTable) broadcast(r) else r

    var resolved = r.select(
      col("src_url").as("start_url"), col("dest").as("cur_url"),
      lit(1).as("n_redirects"), col("status").as("last_status"),
      array(hop(col("src_url"), col("dest"), col("status"), col("hop_headers"))).as("chain"))
    // terminal legs are BUFFERED and unioned once after the loop: an
    // incremental `done.union(leg)` would re-analyze an O(hops)-leg union
    // tree on every hop — quadratic total Catalyst work in maxRedirects
    // (same fix as the in-memory loop's resultRounds buffer)
    val doneLegs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var hops = 1
    // follow while n_redirects < maxRedirects allows another hop
    while (hops < cfg.maxRedirects) {
      val joined = resolved.join(hopSide.select(col("src_url").as("j_src"), col("dest").as("j_dest"),
        col("status").as("j_status"), col("hop_headers").as("j_headers")),
        resolved("cur_url") === col("j_src"), "left")
      val terminal = joined.filter(col("j_src").isNull)
        .select(col("start_url"), col("cur_url"), col("n_redirects"), col("last_status"), col("chain"))
      val continuing = joined.filter(col("j_src").isNotNull)
        .select(col("start_url"), col("j_dest").as("cur_url"),
          (col("n_redirects") + 1).as("n_redirects"), col("j_status").as("last_status"),
          concat(col("chain"), array(hop(col("cur_url"), col("j_dest"), col("j_status"),
            col("j_headers")))).as("chain"))
      doneLegs += terminal
      resolved = continuing
      hops += 1
    }
    val done: DataFrame = doneLegs.reduceOption(_ union _).orNull
    // whatever is still redirecting at the budget: terminal 3xx head on cur
    val exhausted = resolved.join(hopSide.select(col("src_url").as("j_src"), col("status").as("j_status")),
      resolved("cur_url") === col("j_src"), "left")
    val exhaustedRedirect = exhausted.filter(col("j_src").isNotNull)
      .select(col("start_url"), col("cur_url").as("final_url"), col("n_redirects"),
        lit(true).as("terminal_is_redirect"), col("j_status").as("terminal_status"),
        col("chain").as("redirects"))
    val exhaustedClean = exhausted.filter(col("j_src").isNull)
      .select(col("start_url"), col("cur_url").as("final_url"), col("n_redirects"),
        lit(false).as("terminal_is_redirect"), lit(0).as("terminal_status"),
        col("chain").as("redirects"))
    val tail = exhaustedRedirect.union(exhaustedClean)
    finish(
      if (done == null) tail
      else done.select(col("start_url"), col("cur_url").as("final_url"),
        col("n_redirects"), lit(false).as("terminal_is_redirect"), lit(0).as("terminal_status"),
        col("chain").as("redirects"))
        .union(tail))
  }

  // ---------- the round ----------

  /** Convert the round-relative `fetch_offset_ms` emitted by [[run]] into
    * the absolute virtual-clock stamps of [[graft.model.ResultRow]]
    * (`fetch_start_ms`/`fetch_end_ms`). Applied by the drivers ABOVE the
    * round's plan (the in-memory loop applies it above its checkpoint
    * leaf): `round` is a changing literal, and embedding it inside the
    * otherwise identically-shaped round tree would bust the generated-code
    * cache every round. */
  def stampTimings(results: DataFrame, round: Int, cfg: CrawlConfig): DataFrame = {
    val slotMs = cfg.crawlDelayMs.toLong + 1L
    val roundBase = cfg.virtualEpochMs + round.toLong * cfg.hostQuotaPerRound * slotMs
    val start = lit(roundBase) + col("fetch_offset_ms")
    results
      .withColumn("fetch_start_ms", start)
      // rows with an HTTP exchange occupy their politeness window; pure
      // gate decisions (depth/robots) are zero-duration in virtual time
      .withColumn("fetch_end_ms", start + when(
        col("crawl_status").isin(CrawlStatus.Fetched, CrawlStatus.ConnectionError),
        cfg.crawlDelayMs.toLong).otherwise(0L))
      .drop("fetch_offset_ms")
  }

  final case class RoundOutput(
      results: DataFrame,     // ResultRow schema, minus round and with
                              // fetch_offset_ms in place of the absolute
                              // fetch_start/end_ms — see [[stampTimings]]
      newSeen: DataFrame,     // (url)
      newFrontier: DataFrame, // FrontierEntry schema (frontier for next round)
      departed: DataFrame,    // (url) — left the frontier this round (the
                              // scheduled slice; cuckoo DELETES, CrawlJob)
      entered: DataFrame,     // (url) — enqueued this round (cuckoo INSERTS)
      cached: Seq[DataFrame]) // round-scoped persisted intermediates
  {
    /** Release the round's persisted intermediates once outputs are written. */
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  private val prioOrder: Seq[Column] = Seq(col("depth"), col("priority"), col("url"))

  /** Seen-set delta for a batch of result rows: every emitted result's
    * requested url + every successful fetch's final url enter the seen set
    * (page_loader_service.rs:192-201 — status rows included, because
    * consume_crawl_result runs for them too), minus already-seen. The ONE
    * definition of the seen-update rule — both the persistent loop
    * ([[graft.crawl.CrawlJob.run]] via RoundOutput) and the in-memory loop
    * (which re-plans it over a checkpointed results leaf) use it. */
  def newSeenOf(results: DataFrame, seen: DataFrame): DataFrame =
    results.select(col("url"))
      .union(results.filter(col("final_url").isNotNull).select(col("final_url").as("url")))
      .distinct()
      .join(seen.select("url"), Seq("url"), "left_anti")

  /** Hosts whose pending count exceeds the salting threshold — the ONLY
    * hosts routed through the two-phase salted top-k, as a (host) DataFrame
    * that is never collected to the driver: the production path
    * ([[run]] via the DataFrame [[scheduleFlagged]] overload) folds it into
    * the round plan as a broadcast semi/anti join, so even a pathological
    * frontier with thousands of mega hosts stays a small broadcast relation
    * instead of a thousands-long `isin` literal in the plan. Mega-ness is a
    * pure performance heuristic (any choice yields the same exact top-k), so
    * the caller may also feed stale/raw counts (e.g. last round's metrics). */
  def findMegaHostsDf(frontier: DataFrame, threshold: Long): DataFrame =
    frontier.groupBy(col("host")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .select(col("host"))

  /** [[findMegaHostsDf]] collected to a host list — test/fixture
    * convenience for the literal [[scheduleFlagged]] overload. */
  def findMegaHosts(frontier: DataFrame, threshold: Long): Seq[String] =
    findMegaHostsDf(frontier, threshold).collect().map(_.getString(0)).toSeq

  /** Politeness scheduler: exact per-host top-k by canonical priority
    * (north_rule: "host-keyed priority queue", "salted-key skew handling for
    * mega-hosts"), returning the frontier with an `is_scheduled` flag in ONE
    * declarative plan — no persist, no branch.
    *
    * Non-mega hosts (the overwhelming majority): a single per-host
    * row_number window — one shuffle+sort, exact top-k.
    *
    * Mega hosts (pending > cfg.megaHostThreshold, passed in by the caller):
    * phase 1 ranks within (host, salt) so no sort task ever sees more than
    * ~pending/saltBuckets rows of one host; phase 2 ranks only the
    * ≤ saltBuckets·k phase-1 survivors per host. Rows with rn1 > k are
    * deferred without touching phase 2.
    */
  def scheduleFlagged(frontier: DataFrame, cfg: CrawlConfig,
      megaHosts: Seq[String] = Seq.empty): DataFrame =
    if (megaHosts.isEmpty) scheduleSingle(frontier, cfg)
    else {
      // literal isin flag — test/fixture overload for hand-picked host
      // lists; the production path is the DataFrame overload below
      val isMega = col("host").isin(megaHosts: _*)
      scheduleSplit(frontier.filter(!isMega), frontier.filter(isMega), cfg)
    }

  /** Production overload: mega hosts as a (host) DataFrame, split via
    * broadcast LEFT ANTI / LEFT SEMI joins. Semi/anti joins never duplicate
    * probe rows (safe even if the mega set has dup hosts) and add no
    * columns, so the output schema is identical to the literal overload.
    * The mega relation is tiny by construction (hosts over the threshold);
    * `broadcast` keeps the split shuffle-free on the frontier side. */
  def scheduleFlagged(frontier: DataFrame, cfg: CrawlConfig,
      megaHostsDf: DataFrame): DataFrame = {
    val mega = broadcast(megaHostsDf.select(col("host")))
    // using-column semi/anti joins move the join key first; the trailing
    // projection restores the frontier's column order so both overloads
    // emit the identical schema
    scheduleSplit(
      frontier.join(mega, Seq("host"), "left_anti"),
      frontier.join(mega, Seq("host"), "left_semi"), cfg)
      .select(frontier.columns.map(col).toIndexedSeq :+
        col("is_scheduled") :+ col("host_slot"): _*)
  }

  /** Single-window top-k — the path when no host can be mega. */
  private def scheduleSingle(frontier: DataFrame, cfg: CrawlConfig): DataFrame = {
    val whost = Window.partitionBy(col("host")).orderBy(prioOrder: _*)
    slotted(frontier.withColumn("__rn", row_number().over(whost)),
      col("__rn"), cfg.hostQuotaPerRound).drop("__rn")
  }

  // host_slot = the politeness rank (1-based) of a SCHEDULED row within
  // its host — the row's position in the host's polite fetch calendar
  // (feeds the virtual-clock timings, see [[stampTimings]]); null on
  // deferred rows (they have no slot this round)
  private def slotted(df: DataFrame, rn: Column, k: Int): DataFrame = df
    .withColumn("is_scheduled", rn <= k)
    .withColumn("host_slot", when(rn <= k, rn))

  /** The two-lane scheduler over a pre-split frontier: plain window for
    * `normalRows`, two-phase salted top-k for `megaRows`. */
  private def scheduleSplit(normalRows: DataFrame, megaRows: DataFrame,
      cfg: CrawlConfig): DataFrame = {
    val k = cfg.hostQuotaPerRound
    val whost = Window.partitionBy(col("host")).orderBy(prioOrder: _*)
    val normal = slotted(normalRows
      .withColumn("__rn", row_number().over(whost)), col("__rn"), k).drop("__rn")
    val p1 = megaRows
      .withColumn("__salt", pmod(xxhash64(col("url")), lit(cfg.saltBuckets.toLong)))
      .withColumn("__rn1", row_number().over(
        Window.partitionBy(col("host"), col("__salt")).orderBy(prioOrder: _*)))
      .drop("__salt")
    val surv = slotted(p1.filter(col("__rn1") <= k).drop("__rn1")
      .withColumn("__rn2", row_number().over(whost)), col("__rn2"), k).drop("__rn2")
    val rest = p1.filter(col("__rn1") > k).drop("__rn1")
      .withColumn("is_scheduled", lit(false))
      .withColumn("host_slot", lit(null).cast("int"))
    normal.unionByName(surv).unionByName(rest)
  }

  /** [[scheduleFlagged]] materialized once and split into (scheduled,
    * deferred, cached). The single persist exists because callers act on
    * both branches; callers that only need one pass over the flagged rows
    * should use [[scheduleFlagged]] directly (zero persists). Caller must
    * unpersist `cached` when done. */
  def schedule(frontier: DataFrame, cfg: CrawlConfig,
      megaHosts: Option[DataFrame] = None): (DataFrame, DataFrame, Seq[DataFrame]) = {
    val flagged = megaHosts.map(scheduleFlagged(frontier, cfg, _))
      .getOrElse(scheduleSingle(frontier, cfg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (flagged.filter(col("is_scheduled")).drop("is_scheduled"),
      flagged.filter(!col("is_scheduled")).drop("is_scheduled", "host_slot"),
      Seq(flagged))
  }

  /** Run one round. `pages` must expose (url, html, text); `seen` is (url)
    * (bucket column optional); `robotsCache` from [[buildRobotsCache]];
    * `resolvedRedirects` from [[resolveRedirects]]. */
  def run(
      spark: SparkSession,
      round: Int,
      frontier: DataFrame,
      seen: DataFrame,
      pages: DataFrame,
      robotsCache: DataFrame,
      resolvedRedirects: DataFrame,
      cfg: CrawlConfig,
      seenBlooms: Option[org.apache.spark.broadcast.Broadcast[SeenFilter.BloomProbe]] = None,
      megaHosts: Option[DataFrame] = None,
      frontierProbe: Option[org.apache.spark.broadcast.Broadcast[SeenFilter.BloomProbe]] = None): RoundOutput = {

    // bloom-accelerated exact anti-join vs the seen set (when blooms cover
    // exactly `seen`): definitely-new urls skip the join; bloom-positives
    // take the exact path — identical output, a fraction of the shuffle
    def antiSeen(candidates: DataFrame): DataFrame = seenBlooms match {
      case Some(b) => SeenFilter.bloomAntiJoin(candidates, seen, b)
      case None => candidates.join(seen.select("url"), Seq("url"), "left_anti")
    }

    // 1. politeness top-k per host
    val (scheduled0, deferred, schedCached) = schedule(frontier, cfg, megaHosts)

    // 2. dequeue-time AlreadyKnown gate — SILENT skip, no result row
    //    (page_crawl_command.rs:82-85 returns Ok(None); urls can become seen
    //    while queued, e.g. as someone else's redirect target)
    val scheduled = antiSeen(scheduled0)

    // 3. depth gate → status rows (page_crawl_command.rs:73-77; 0 = unlimited)
    val depthGate = lit(cfg.maxDepth) > 0 && col("depth") >= cfg.maxDepth
    val depthRejected = scheduled.filter(depthGate)
    val underDepth = scheduled.filter(!depthGate)

    // 4. robots gate → status rows (page_crawl_command.rs:92-95;
    //    decision robots_service.rs:46-52; missing cache row = default allow)
    val withRobots = underDepth.join(broadcast(robotsCache), Seq("host"), "left")
    val allowed =
      if (!cfg.respectRobots) lit(true)
      else canAccessUdf(
        coalesce(col("disallow_all"), lit(false)),
        coalesce(col("allow_all"), lit(false)),
        coalesce(col("robots_body"), lit("")),
        lit(cfg.userAgent), col("url"))
    val robotsRejected = withRobots.filter(!allowed).drop("disallow_all", "allow_all", "robots_body")
    val crawlable = withRobots.filter(allowed).drop("disallow_all", "allow_all", "robots_body")

    // 5. redirect resolution (one static-closure join) + page lookup.
    //    A url in the redirects fixture answers 3xx; otherwise a url in
    //    pages answers its http_status (default 200) with its headers
    //    (default: text/html when html is present, octet-stream otherwise);
    //    otherwise the HEAD fails → ConnectionError
    //    (page_crawl_command.rs:116-135).
    val withRedirects = crawlable
      .join(resolvedRedirects, crawlable("url") === resolvedRedirects("start_url"), "left")
      .withColumn("target", coalesce(col("final_url"), col("url")))
      .drop("start_url", "final_url")
    // optional fixture columns: headers (keys lowercased on ingestion — F9,
    // http_utils.rs:7-12) and per-page http_status; a bare input_hint table
    // (url, warc_ts, html, text, lang) gets the synthesized defaults
    val hasHeaders = pages.columns.contains("headers")
    val hasStatus = pages.columns.contains("http_status")
    val pagesMeta = pages.select(col("url").as("pg_url"),
      col("html").isNotNull.as("pg_has_html"), col("text").as("pg_text"),
      (if (hasHeaders) transform_keys(col("headers"), (k, _) => lower(k))
       else lit(null).cast("map<string,string>")).as("pg_headers"),
      (if (hasStatus) coalesce(col("http_status"), lit(200)) else lit(200)).as("pg_status"))
    // persisted: results + seen + frontier all hang off this subtree, and the
    // caller writes each separately — without the persist every write would
    // re-run the joins (3× the round cost)
    val headed = withRedirects
      .join(pagesMeta, col("target") === col("pg_url"), "left")
      .withColumn("n_redirects", coalesce(col("n_redirects"), lit(0)))
      .withColumn("is_redirect_terminal", coalesce(col("terminal_is_redirect"), lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val connError = col("is_redirect_terminal") === false && col("pg_url").isNull
    val headOk = !connError

    // 6. download + link extraction, gated by should_download
    //    (page_crawl_command.rs:157-166): (HTTP success OR an `x-cache`
    //    header containing "cloudfront" — a CDN-cached error page still
    //    serves a body) AND content-type contains text/html (F5+F6)
    val fetchedCols = headed.filter(headOk)
      .withColumn("http_code", when(col("is_redirect_terminal"), col("terminal_status")).otherwise(col("pg_status")))
      // the final response's header map (keys already lowercased in
      // pagesMeta — F9). The synthesized single-entry default applies ONLY
      // to bare 5-column input (headers column null): the reference's
      // is_html REQUIRES the content-type key when headers exist
      // (page_crawl_command.rs:163-166) — a present-but-keyless map means
      // NOT html. A budget-terminal 3xx has no final response → null map.
      .withColumn("resp_headers",
        when(col("is_redirect_terminal"), lit(null).cast("map<string,string>"))
          .otherwise(when(col("pg_headers").isNotNull, col("pg_headers"))
            .otherwise(map(lit("content-type"),
              when(col("pg_has_html"), lit("text/html"))
                .otherwise(lit("application/octet-stream"))))))
      .withColumn("content_type", element_at(col("resp_headers"), "content-type"))
      .withColumn("should_download",
        col("is_redirect_terminal") === false &&
          (col("http_code").between(200, 299) ||
            coalesce(element_at(col("pg_headers"), "x-cache").contains("cloudfront"), lit(false))) &&
          coalesce(col("content_type").contains("text/html"), lit(false)))

    // re-join the fat html column only for rows that will parse it — the
    // pages scan for everyone else never reads html (column pruning)
    val pagesBody = pages.select(col("url").as("pb_url"), col("html").as("pb_html"))
    // persisted AFTER the html is consumed by the extraction UDF and dropped:
    // the fat bytes live only inside this one join stage, never in the cache
    // or any later shuffle (SURVEY.md §7.4)
    val fetched = fetchedCols
      .join(pagesBody, col("should_download") && col("target") === col("pb_url"), "left")
      .withColumn("pl",
        when(col("should_download"),
          extractChildrenUdf(col("protocol"), col("host"), col("pb_html"), col("url")))
          .otherwise(lit(null)))
      .drop("pb_url", "pb_html")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---------- results ----------
    val nullChain = lit(null).cast(chainType)
    val nullHeaders = lit(null).cast("map<string,string>")
    // round-relative start of the row's politeness slot on the virtual
    // fetch calendar: slot s of a host fires at (s−1)·(delay+1) after the
    // round opens (+1 = the reference's strictly-greater gate, is_blocked
    // holds while elapsed <= rate_limiting_ms, http_client.rs:79-83).
    // [[stampTimings]] adds the round's absolute base — `round` is a
    // changing literal and must stay OUT of this (identically-shaped,
    // codegen-cached) round tree.
    val fetchOffset = ((col("host_slot") - 1).cast("long") *
      (cfg.crawlDelayMs.toLong + 1L)).as("fetch_offset_ms")

    val statusResults = depthRejected
      .withColumn("crawl_status", lit(CrawlStatus.MaximumCrawlDepthReached))
      .unionByName(robotsRejected.withColumn("crawl_status", lit(CrawlStatus.RestrictedByRobotsTxt)))
      .select(col("url"), col("raw_url"), col("host"),
        lit(null).cast("string").as("final_url"), lit(-1).as("http_code"),
        lit(null).cast("string").as("status_label"),
        lit(null).cast("string").as("content_type"),
        nullHeaders.as("headers"), col("crawl_status"),
        col("depth"), col("priority"), lit(0).as("n_redirects"),
        nullChain.as("redirects"),
        lit(-1).as("n_links"), lit(null).cast("string").as("text"),
        fetchOffset)

    val connResults = headed.filter(connError)
      .select(col("url"), col("raw_url"), col("host"),
        lit(null).cast("string").as("final_url"), lit(-1).as("http_code"),
        lit(null).cast("string").as("status_label"),
        lit(null).cast("string").as("content_type"),
        nullHeaders.as("headers"),
        lit(CrawlStatus.ConnectionError).as("crawl_status"),
        col("depth"), col("priority"), lit(0).as("n_redirects"),
        nullChain.as("redirects"),
        lit(-1).as("n_links"), lit(null).cast("string").as("text"),
        fetchOffset)

    val fetchResults = fetched
      .select(col("url"), col("raw_url"), col("host"),
        col("target").as("final_url"), col("http_code"),
        StatusCodes.labelCol(col("http_code")).as("status_label"),
        col("content_type"),
        col("resp_headers").as("headers"),
        lit(CrawlStatus.Fetched).as("crawl_status"),
        col("depth"), col("priority"), col("n_redirects"),
        // a successful HEAD always carries a (possibly empty) chain
        // (head_response.rs:9-17: redirects is a Vec, never absent)
        coalesce(col("redirects"), array().cast(chainType)).as("redirects"),
        coalesce(col("pl.n_links"), lit(-1)).as("n_links"),
        when(col("should_download"), col("pg_text")).otherwise(lit(null).cast("string")).as("text"),
        fetchOffset)

    val results = statusResults.unionByName(connResults).unionByName(fetchResults)

    // ---------- seen update ----------
    val newSeen = newSeenOf(results, seen)

    // ---------- children → next frontier ----------
    // enqueue gate: parent depth <= maxDepth (page_loader_service.rs:142 —
    // note this makes maxDepth=0 enqueue only the seeds' children)
    val kids = fetched
      .filter(col("pl").isNotNull && col("depth") <= cfg.maxDepth)
      .select(col("depth"), col("priority"), explode(col("pl.children")).as("c"))
      .select(col("c.url").as("url"), col("c.raw_url").as("raw_url"),
        (col("depth") + 1).as("depth"),
        prioChildUdf(col("priority"), col("c.rank")).as("priority"))
      .withColumn("host", hostOfUdf(col("url")))
      .withColumn("protocol", protocolOfUdf(col("url")))

    // within-round dedup by canonical url, keeping best priority (the
    // reference enqueues both and silently drops the later at dequeue —
    // same output, page_crawl_command.rs:87-90)
    val kidsDeduped = kids
      .withColumn("rn", row_number().over(Window.partitionBy(col("url")).orderBy(col("depth"), col("priority"))))
      .filter(col("rn") === 1).drop("rn")

    // enqueue-time anti-join vs seen ∪ newSeen ∪ still-queued frontier
    // (page_loader_service.rs:157). Anti-joining against the UNION of the
    // reject sets is set-identical to chaining one anti-join per set (the
    // kids side is never duplicated by an anti-join) but pays ONE shuffle
    // of the kids instead of three — the union legs are map-side. The legs
    // a membership filter accelerates stay separate: blooms cover `seen`
    // (through the previous round), the cuckoo probe covers the frontier
    // (⊇ deferred), and each probe's filter-rejected kids skip the exact
    // join entirely.
    val newEntries0 = ((seenBlooms, frontierProbe) match {
      case (None, None) =>
        kidsDeduped.join(
          seen.select("url").union(newSeen.select("url"))
            .union(deferred.select("url")),
          Seq("url"), "left_anti")
      case (Some(b), None) =>
        SeenFilter.bloomAntiJoin(kidsDeduped, seen, b)
          .join(newSeen.select("url").union(deferred.select("url")),
            Seq("url"), "left_anti")
      case (_, Some(p)) =>
        SeenFilter.bloomAntiJoin(
          antiSeen(kidsDeduped).join(newSeen.select("url"), Seq("url"), "left_anti"),
          deferred.select("url"), p)
    }).select("url", "raw_url", "host", "protocol", "depth", "priority")

    // when a cuckoo gate is configured, the round's `entered` slice is
    // consumed a second time by the delta writer (CrawlJob) AFTER the
    // frontier write already materialized it — persist so the delta job
    // reads the cache instead of re-running the whole enqueue-gate join
    // chain (measured: DeepCrawlProbe --cuckoo median round 8.0 s vs 4.4 s
    // control before this; the persist is skipped entirely when no gate is
    // configured, so the bench/flagship path is untouched)
    val newEntries =
      if (cfg.useCuckooFrontier || cfg.cuckooAutoEnableAt > 0)
        newEntries0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else newEntries0

    val newFrontier = deferred.select("url", "raw_url", "host", "protocol", "depth", "priority")
      .unionByName(newEntries)

    RoundOutput(results, newSeen, newFrontier,
      scheduled0.select("url"), newEntries.select("url"),
      schedCached ++ Seq(headed, fetched) ++
        (if (newEntries ne newEntries0) Seq(newEntries) else Seq.empty))
  }
}
