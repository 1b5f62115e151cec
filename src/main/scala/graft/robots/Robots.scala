package graft.robots

/** robots.txt matching, behaviorally equivalent to the reference's
  * RobotsService (reference: page_loader/src/task_context/robots_service.rs:22-110),
  * which wraps Google's robotstxt matcher. Semantics implemented here follow
  * the published Google robots.txt spec (RFC 9309):
  *
  *   - groups of `user-agent:` lines followed by allow/disallow rules;
  *   - the crawler picks the group whose user-agent token is the longest
  *     match for its own product token ("*" matches everything, weakest);
  *   - within the group, the rule with the longest matching pattern wins;
  *     on a tie, allow wins;
  *   - patterns support `*` (any run) and `$` (end anchor); empty pattern
  *     matches nothing; no rules → allowed.
  *
  * Mode precedence (robots_service.rs:46-52, pinned by its unit tests):
  * disallowAll > allowAll > parsed rules.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Per-host robots decision cache entry (SURVEY.md §1.2). */
  final case class HostRobots(disallowAll: Boolean, allowAll: Boolean, body: String)

  /** Derive the per-host mode from the robots.txt fetch status
    * (reference status dispatch: robots_service.rs:84-106):
    * 401/403 → disallow_all; other 4xx → allow_all; 200 → parse rules;
    * anything else (5xx, unreachable) → no rules → default allow. */
  def fromStatus(status: Int, body: String): HostRobots = status match {
    case 401 | 403            => HostRobots(disallowAll = true, allowAll = false, "")
    case s if s >= 400 && s < 500 => HostRobots(disallowAll = false, allowAll = true, "")
    case 200                  => HostRobots(disallowAll = false, allowAll = false, if (body == null) "" else body)
    case _                    => HostRobots(disallowAll = false, allowAll = false, "")
  }

  /** reference: robots_service.rs:46-52 */
  def canAccess(disallowAll: Boolean, allowAll: Boolean, body: String, agent: String, url: String): Boolean =
    !disallowAll && (allowAll || allowedByRules(body, agent, url))

  def parse(body: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inAgentRun = false // consecutive user-agent lines accumulate one group

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    }

    (if (body == null) "" else body).linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" | "useragent" | "user agent" =>
            if (!inAgentRun) flush()
            agents += value.toLowerCase
            inAgentRun = true
          case "allow" =>
            inAgentRun = false
            if (agents.nonEmpty) rules += Rule(allow = true, value)
          case "disallow" =>
            inAgentRun = false
            if (agents.nonEmpty) rules += Rule(allow = false, value)
          case _ => inAgentRun = false // sitemap, crawl-delay, etc: ignored
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** Longest-user-agent-match group selection (RFC 9309 §2.2.1). The agent
    * product token is matched as a prefix, case-insensitively. */
  private def selectGroup(groups: Seq[Group], agent: String): Option[Group] = {
    val token = agent.toLowerCase.takeWhile(c => c != '/' && !c.isWhitespace)
    var best: Option[(Int, Group)] = None
    groups.foreach { g =>
      g.agents.foreach { ga =>
        val score =
          if (ga == "*") 0
          else if (token.startsWith(ga) || ga.startsWith(token)) ga.length + 1
          else -1
        if (score >= 0 && best.forall(_._1 < score)) best = Some((score, g))
      }
    }
    best.map(_._2)
  }

  /** Per-executor memoized parse: the reference parses robots.txt ONCE per
    * host (robots_service.rs:55-110); evaluating rules per frontier row must
    * not re-parse the body per row (billions of rows/round at scale). Keyed
    * by body text (1:1 with host in practice); BOUNDED with single-entry
    * random eviction at the ceiling (same policy as
    * [[graft.canon.LinkTypeChecker.forHost]]) — a whole-cache clear would
    * thundering-herd every executor thread crossing the boundary together
    * into a simultaneous re-parse of the hot bodies. */
  private val MaxParsed = 4096
  private val parsed = new java.util.concurrent.ConcurrentHashMap[String, Seq[Group]]()
  def parseCached(body: String): Seq[Group] = {
    val hit = parsed.get(body)
    if (hit != null) hit
    else {
      if (parsed.size >= MaxParsed) graft.util.BoundedEvict.evictOne(parsed)
      parsed.computeIfAbsent(body, parse _)
    }
  }

  /** Test seam: current parse-cache size (contention specs pin that an
    * overflow evicts one entry, never clears the cache whole). */
  private[graft] def parsedCacheSize: Int = parsed.size

  /** `*` / `$` wildcard path match, longest-match-wins, allow wins ties. */
  def allowedByRules(body: String, agent: String, url: String): Boolean = {
    val groups = parseCached(body)
    selectGroup(groups, agent) match {
      case None => true
      case Some(g) =>
        val path = pathOf(url)
        var bestLen = -1
        var bestAllow = true
        g.rules.foreach { r =>
          if (r.pattern.nonEmpty && matches(r.pattern, path)) {
            val len = r.pattern.length
            if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
              bestLen = len; bestAllow = r.allow
            }
          }
        }
        bestAllow
    }
  }

  def pathOf(url: String): String = {
    val schemeEnd = url.indexOf("://")
    val afterHost =
      if (schemeEnd >= 0) {
        val slash = url.indexOf('/', schemeEnd + 3)
        if (slash < 0) "/" else url.substring(slash)
      } else if (url.startsWith("/")) url
      else "/" + url
    afterHost
  }

  /** Greedy wildcard matcher: pattern must match a prefix of path unless
    * anchored with `$`. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    // all parts except the last: greedy left-to-right
    while (i < parts.length - 1) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else {
        val found = path.indexOf(part, pos)
        if (found < 0) return false
        pos = found + part.length
      }
      i += 1
    }
    val last = parts.last
    if (parts.length == 1) {
      // no '*' at all
      if (!path.startsWith(last)) return false
      if (anchored) last.length == path.length else true
    } else if (anchored) {
      // last literal must sit at the very end (empty last = pattern ends
      // with '*', any tail matches)
      last.isEmpty || (path.endsWith(last) && path.length - last.length >= pos)
    } else {
      path.indexOf(last, pos) >= 0
    }
  }
}
