package graft.robots

import org.scalatest.funsuite.AnyFunSuite

/** Robots semantics pinned by the reference unit tests
  * (reference: robots_service.rs:124-185) plus Google-spec matcher cases. */
class RobotsSpec extends AnyFunSuite {

  test("disallow_all blocks everything (reference :129-139)") {
    assert(!Robots.canAccess(disallowAll = true, allowAll = false, "", "tarantula", "https://example.com"))
  }

  test("allow_all allows (reference :142-153)") {
    assert(Robots.canAccess(disallowAll = false, allowAll = true, "", "tarantula", "https://example.com"))
  }

  test("disallow_all precedes allow_all (reference :156-167)") {
    assert(!Robots.canAccess(disallowAll = true, allowAll = true, "", "tarantula", "https://example.com"))
  }

  test("status dispatch (reference robots_service.rs:84-106)") {
    assert(Robots.fromStatus(401, "") == Robots.HostRobots(true, false, ""))
    assert(Robots.fromStatus(403, "") == Robots.HostRobots(true, false, ""))
    assert(Robots.fromStatus(404, "") == Robots.HostRobots(false, true, ""))
    assert(Robots.fromStatus(451, "") == Robots.HostRobots(false, true, ""))
    assert(Robots.fromStatus(200, "x") == Robots.HostRobots(false, false, "x"))
    assert(Robots.fromStatus(500, "x") == Robots.HostRobots(false, false, ""))
  }

  test("agent-specific disallow / blocks deep links (reference :170-184 shape)") {
    val body = "user-agent: tarantula\ndisallow: /\n"
    assert(!Robots.allowedByRules(body, "tarantula", "https://example.com/some-deeplink"))
    // other agents unaffected (no * group)
    assert(Robots.allowedByRules(body, "otherbot", "https://example.com/some-deeplink"))
  }

  test("longest match wins; allow wins ties; * and $ wildcards") {
    val body =
      """user-agent: *
        |disallow: /private/
        |allow: /private/ok
        |disallow: /*.pdf$
        |""".stripMargin
    assert(!Robots.allowedByRules(body, "tarantula", "https://x.com/private/secret"))
    assert(Robots.allowedByRules(body, "tarantula", "https://x.com/private/ok/page"))
    assert(!Robots.allowedByRules(body, "tarantula", "https://x.com/docs/file.pdf"))
    assert(Robots.allowedByRules(body, "tarantula", "https://x.com/docs/file.pdfx"))
    assert(Robots.allowedByRules(body, "tarantula", "https://x.com/public"))
  }

  test("group selection: longest user-agent match beats *") {
    val body =
      """user-agent: *
        |disallow: /
        |
        |user-agent: tarantula
        |disallow:
        |""".stripMargin
    assert(Robots.allowedByRules(body, "tarantula", "https://x.com/anything"))
    assert(!Robots.allowedByRules(body, "googlebot", "https://x.com/anything"))
  }

  test("empty / missing rules default to allow") {
    assert(Robots.allowedByRules("", "tarantula", "https://x.com/a"))
    assert(Robots.allowedByRules("# nothing here", "tarantula", "https://x.com/a"))
  }

  test("parseCached memoizes per body (micro-bench printed, not asserted)") {
    val body =
      """user-agent: *
        |disallow: /private
        |allow: /private/ok
        |disallow: /*.pdf$
        |disallow: /tmp/*
        |allow: /tmp/keep
        |user-agent: tarantula
        |disallow: /internal
        |allow: /internal/public
        |""".stripMargin
    // memoized result is the same object graph the plain parse produces
    assert(Robots.parseCached(body) == Robots.parse(body))
    assert(Robots.parseCached(body) eq Robots.parseCached(body)) // cache hit
    val n = 200000
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    time((1 to 1000).foreach(_ => Robots.allowedByRules(body, "tarantula", "https://x.com/a"))) // JIT warm
    val tEval = time((1 to n).foreach(_ => Robots.allowedByRules(body, "tarantula", "https://x.com/internal/public/x")))
    val tParse = time((1 to n).foreach(_ => Robots.parse(body)))
    // rule evaluation (what runs per frontier row) vs a per-row re-parse
    System.err.println(f"ROBOTSBENCH n=$n evalCached=${n / tEval}%.0f/s parseEveryRow=${n / (tParse + tEval)}%.0f/s parseCost=${tParse / (tParse + tEval) * 100}%.0f%%")
  }

  test("parse cache overflow evicts one entry at a time, never clears whole") {
    // fill well past the 4096 ceiling from several threads at once (the
    // executor-thread shape): after the boundary every insert evicts ONE
    // resident, so the cache must stay ~full — a whole-cache clear (the r4
    // thundering-herd shape LinkTypeChecker fixed) would leave it near-empty
    // whenever the last batch straddles the boundary
    val threads = 8
    val perThread = 800 // 6400 distinct bodies total > 4096
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val done = new java.util.concurrent.CountDownLatch(threads)
    (0 until threads).foreach { t =>
      pool.execute { () =>
        (0 until perThread).foreach { i =>
          Robots.parseCached(s"user-agent: *\ndisallow: /t$t/i$i\n")
        }
        done.countDown()
      }
    }
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val size = Robots.parsedCacheSize
    // check-then-evict races can overshoot by at most one per thread, and
    // each racing insert evicts at most one — the bound is ±threads
    assert(size >= 4096 - threads && size <= 4096 + threads,
      s"cache size $size after overflow: expected ~4096 (single-entry eviction)")
  }
}
