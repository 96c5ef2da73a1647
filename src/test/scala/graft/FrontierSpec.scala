package graft

import graft.kernel.{Robots, Sitemap}
import graft.sources.Frontier
import org.apache.spark.sql.functions._

/** Crawl-frontier gates (w03/w04/w05): RFC 9309 grammar + matching
  * semantics the SQL oracle cannot express (wildcards, anchors, group
  * selection edge cases), sitemap grammar leniency/loudness, and the
  * schedule invariants.
  */
class FrontierSpec extends SparkSuite {

  // ---- robots kernel ----

  test("robots: wildcard and anchor patterns match per RFC 9309") {
    val m = Robots.patternMatches _
    assert(m("/fish", "/fish"))
    assert(m("/fish", "/fishheads")) // prefix
    assert(!m("/fish", "/Fish")) // case-sensitive paths
    assert(m("/fish*.php", "/fishheads/catfish.php?id=2"))
    assert(m("/fish*.php", "/fish/file.php"))
    assert(!m("/fish*.php", "/fishheads/catfish.htm"))
    assert(m("/*.php", "/index.php"))
    assert(m("/*.php", "/folder/any.php.file")) // .php needn't be terminal
    assert(!m("/*.php$", "/folder/any.php.file")) // unless anchored
    assert(m("/*.php$", "/folder/page.php"))
    assert(m("/fish*$", "/fishheads"))
    assert(!m("/a*b*c", "/acb"))
    assert(m("/a*b*c", "/a-x-b-y-c"))
    assert(m("/a**b", "/ab")) // stacked wildcards collapse
    assert(!m("/p$", "/page")) // anchored exact
    assert(m("/p$", "/p"))
  }

  test("robots: group selection — longest agent prefix wins, * is fallback only") {
    val rf = Robots.parse(
      """User-agent: graft
        |Disallow: /a
        |
        |User-agent: graftbot
        |Disallow: /b
        |Crawl-delay: 7
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    // the most specific token wins outright
    val g = Robots.select(rf, "GraftBot/2.1")
    assert(g.rules == Seq((false, "/b")))
    assert(g.crawlDelay.contains(7.0))
    // a shorter-token crawler gets the shorter group
    assert(Robots.select(rf, "graft-x").rules == Seq((false, "/a")))
    // an unknown crawler falls back to *
    assert(Robots.select(rf, "other").rules == Seq((false, "/")))
    // no * group and no match → empty rules (allow everything)
    val rf2 = Robots.parse("User-agent: a\nDisallow: /x\n")
    assert(Robots.select(rf2, "other").rules.isEmpty)
  }

  test("robots: shared rule blocks, lenient parse, allow-wins ties, empty Disallow") {
    // adjacent User-agent lines share one block; comments and unknown
    // fields are skipped; an empty Disallow matches nothing
    val rf = Robots.parse(
      "# politeness file\r\n" +
        "User-agent: a\r\nUser-agent: b\r\n" +
        "Disallow: /x # inline comment\r\n" +
        "Unknown-Field: zzz\r\n" +
        "Disallow:\r\n" +
        "Sitemap: https://example.com/map.xml\r\n")
    assert(rf.groups.length == 1)
    assert(rf.groups.head.agents == Seq("a", "b"))
    assert(rf.groups.head.rules == Seq((false, "/x")))
    assert(rf.sitemaps == Seq("https://example.com/map.xml"))
    // specificity tie between Allow and Disallow → Allow wins
    val tie = Robots.Group(Seq("x"), Seq((false, "/dir/a"), (true, "/dir/b")), None)
    assert(Robots.allowed(tie, "/dir/a") == false)
    assert(Robots.allowed(tie, "/dir/b"))
    val exact = Robots.Group(Seq("x"), Seq((false, "/p"), (true, "/p")), None)
    assert(Robots.allowed(exact, "/p")) // same pattern both ways → allow
    // longest match beats file order
    val spec = Robots.Group(Seq("x"), Seq((true, "/p/deep"), (false, "/p")), None)
    assert(Robots.allowed(spec, "/p/deep/page"))
    assert(!Robots.allowed(spec, "/p/other"))
  }

  // ---- sitemap kernel ----

  test("sitemap: entity decode, attributes tolerated, loud on malformed") {
    val doc = Sitemap.parse(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://e.com/a?x=1&amp;y=2</loc><lastmod>2025-01-02</lastmod></url>
        |<url><loc> https://e.com/b </loc></url>
        |</urlset>""".stripMargin)
    assert(doc.kind == "urlset")
    assert(doc.entries == Seq(
      Sitemap.Entry("https://e.com/a?x=1&y=2", "2025-01-02"),
      Sitemap.Entry("https://e.com/b", "")))
    val idx = Sitemap.parse(
      "<sitemapindex><sitemap><loc>https://e.com/m1.xml</loc></sitemap></sitemapindex>")
    assert(idx.kind == "sitemapindex" && idx.entries.map(_.loc) ==
      Seq("https://e.com/m1.xml"))
    // not a sitemap / entry without loc: loud
    val e1 = intercept[IllegalArgumentException](Sitemap.parse("<html></html>"))
    assert(e1.getMessage.contains("root"))
    val e2 = intercept[IllegalArgumentException](
      Sitemap.parse("<urlset><url><lastmod>x</lastmod></url></urlset>"))
    assert(e2.getMessage.contains("loc"))
  }

  // ---- frontier operators ----

  test("robotsVerdicts honors wildcard rules end-to-end; missing-host default-allows") {
    val spark2 = spark
    import spark2.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp\nCrawl-delay: 2\n"))
      .toDF("host", "robots_txt")
    val urls = Seq(
      "https://a.com/doc.pdf",        // wildcard-anchored deny
      "https://a.com/doc.pdfx",       // $ anchor must NOT match
      "https://a.com/tmp/file",       // prefix deny
      "https://a.com/ok",             // no rule → allow
      "https://b.com/anything"        // host without robots → allow
    ).toDF("url")
    val got = Frontier.robotsVerdicts(urls, robots, "graftbot")
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got("https://a.com/doc.pdf") == ((false, Some(2.0))))
    assert(got("https://a.com/doc.pdfx") == ((true, Some(2.0))))
    assert(got("https://a.com/tmp/file") == ((false, Some(2.0))))
    assert(got("https://a.com/ok") == ((true, Some(2.0))))
    assert(got("https://b.com/anything") == ((true, None)))
  }

  test("robotsVerdictsLocal: zero-shuffle broadcast form matches the join form exactly") {
    val spark2 = spark
    import spark2.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp\nAllow: /tmp/ok\nCrawl-delay: 2\n"),
      ("b.com", "User-agent: graft\nDisallow: /x\n\nUser-agent: *\nDisallow: /\n"))
      .toDF("host", "robots_txt")
    val urls = Seq(
      "https://a.com/doc.pdf", "https://a.com/tmp/ok/file",
      "https://a.com/tmp/no", "https://b.com/x/1", "https://b.com/y",
      "https://c.com/free").toDF("url")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(3), Option(r.get(4)))).sortBy(_._1).toSeq
    val join = rows(Frontier.robotsVerdicts(urls, robots, "graftbot"))
    val local = rows(Frontier.robotsVerdictsLocal(urls, robots, "graftbot"))
    assert(local == join)
    // the broadcast form's plan has NO exchange — one map over the urls
    val plan = Frontier.robotsVerdictsLocal(urls, robots, "graftbot")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // host-count cap is loud
    val e = intercept[IllegalArgumentException](
      Frontier.robotsVerdictsLocal(urls, robots, "graftbot", maxHosts = 1))
    assert(e.getMessage.contains("maxHosts"))
    // DUPLICATE frontier URLs: one output row per input row in BOTH
    // forms (the join form regroups on a stable row id, not the url
    // value — the r11 ADVICE parity break)
    val dupUrls = Seq(
      "https://a.com/doc.pdf", "https://a.com/doc.pdf",
      "https://a.com/doc.pdf", "https://c.com/free").toDF("url")
    val dj = rows(Frontier.robotsVerdicts(dupUrls, robots, "graftbot"))
    val dl = rows(Frontier.robotsVerdictsLocal(dupUrls, robots, "graftbot"))
    assert(dj.size == 4 && dj == dl)
  }

  test("robotsSitemaps: file order, case-insensitivity, comments, BOM, group position") {
    val spark2 = spark
    import spark2.implicits._
    val robots = Seq(
      ("a.com", "﻿Sitemap: https://a.com/s0.xml\n" +
        "# sitemap: https://a.com/commented.xml\n" +
        "User-agent: *\nDisallow: /x\n" +
        "SITEMAP: https://a.com/s1.xml  \n" + // inside a group is legal
        "Sitemap:\n" + // empty drops
        "Allow: /x/ok\nsitemap:https://a.com/s2.xml\n"),
      ("b.com", "User-agent: *\nDisallow: /\n"), // none
      ("c.com", "Sitemap: https://c.com/only.xml\n"))
      .toDF("host", "robots_txt")
    val got = Frontier.robotsSitemaps(robots)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("a.com", 0, "https://a.com/s0.xml"),
      ("a.com", 1, "https://a.com/s1.xml"),
      ("a.com", 2, "https://a.com/s2.xml"),
      ("c.com", 0, "https://c.com/only.xml")), got)
  }

  test("extractLinks: absolute hrefs only, fragments trim, attribute clutter tolerated") {
    val spark2 = spark
    import spark2.implicits._
    val pages = Seq((
      "https://src.com/page",
      """<html><a href="https://a.com/x">1</a>
        |<a class="big" id="z" href="https://b.com/y?q=1">2</a>
        |<a href="/relative">3</a><a href="#frag">4</a>
        |<a href="https://c.com/p#section">5</a>
        |<a data-x="href=\"https://decoy.com/\"">6</a></html>""".stripMargin))
      .toDF("url", "html")
    val got = Frontier.extractLinks(pages)
      .select("dst_url").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("https://a.com/x", "https://b.com/y?q=1",
      "https://c.com/p"))
  }

  test("pageRank: hand-computed iteration, mass conservation, star ordering, determinism") {
    val spark2 = spark
    import spark2.implicits._
    // A→B, A→D, B→A, C→A; D dangles
    val edges = Seq(("A", "B"), ("A", "D"), ("B", "A"), ("C", "A"))
      .toDF("src", "dst")
    val one = Frontier.pageRank(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // by hand from uniform 0.25 with d = 0.85 and dangling mass 0.25:
    //   A: 0.0375 + .85·(0.5 + 0.0625), B/D: … 0.1875+…, C: base share
    assert(math.abs(one("A") - 0.515625) < 1e-12, one)
    assert(math.abs(one("B") - 0.196875) < 1e-12, one)
    assert(math.abs(one("D") - 0.196875) < 1e-12, one)
    assert(math.abs(one("C") - 0.090625) < 1e-12, one)
    assert(math.abs(one.values.sum - 1.0) < 1e-12)

    val ten = Frontier.pageRank(edges, iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ten.values.sum - 1.0) < 1e-9, "mass conserved")
    assert(ten("A") > ten("B") && ten("B") > ten("C"), ten)

    // star: every spoke points at the hub → hub dominates
    val star = (1 to 6).map(i => (s"s$i", "hub")).toDF("src", "dst")
    val ranks = Frontier.pageRank(star, iters = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("hub") > ranks.filterNot(_._1 == "hub").values.max * 3)

    // determinism: bit-identical re-run
    val again = Frontier.pageRank(edges, iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again.view.mapValues(java.lang.Double.doubleToLongBits).toMap ==
      ten.view.mapValues(java.lang.Double.doubleToLongBits).toMap)
  }

  test("pageRankQ: hand-computed dangling-path iterations, Q-exactness, ordering agrees with doubles") {
    val spark2 = spark
    import spark2.implicits._
    // A→B with B dangling, M = 10^12, n = 2: every value below worked
    // by hand (base = 3·10^12/40 = 75e9, damping 17/20).
    //   m0 = 500e9 each
    //   it1: dt = 500e9 div 2 = 250e9; contrib(B) = 500e9
    //        A = 75e9 + 17·250e9 div 20 = 287_500_000_000
    //        B = 75e9 + 17·750e9 div 20 = 712_500_000_000
    //   it2: dt = 712.5e9 div 2 = 356_250_000_000; contrib(B) = 287.5e9
    //        A = 75e9 + 17·356.25e9 div 20 = 377_812_500_000
    //        B = 75e9 + 17·643.75e9 div 20 = 622_187_500_000
    val ab = Seq(("A", "B")).toDF("src", "dst")
    val two = Frontier.pageRankQ(ab, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two == Map("A" -> 377812500000L, "B" -> 622187500000L), two)

    // determinism is structural (integer sums), but pin the re-run
    val again = Frontier.pageRankQ(ab, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == two)

    // on a non-trivial graph the Q ordering matches the double ordering
    val edges = Seq(("A", "B"), ("A", "D"), ("B", "A"), ("C", "A"))
      .toDF("src", "dst")
    val q = Frontier.pageRankQ(edges, iters = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(-_._2).map(_._1)
    val dbl = Frontier.pageRank(edges, iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq.sortBy(-_._2).map(_._1)
    assert(q == dbl, s"Q ordering $q != double ordering $dbl")

    // overflow guard is loud
    intercept[IllegalArgumentException](
      Frontier.pageRankQ(ab, iters = 1, totalMass = Long.MaxValue))
  }

  test("pageRankQ: driver hatch ≡ distributed fixed point (dangling, duplicate edges, hub)") {
    val spark2 = spark
    import spark2.implicits._
    // dangling D, a DUPLICATE edge (A→B twice — the loop never dedups,
    // so each occurrence contributes its share), and a hub
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "D"), ("B", "A"),
      ("C", "A"), ("C", "B"), ("E", "A"))
      .toDF("src", "dst")
    for (iters <- Seq(1, 3, 6)) {
      val hatch = Frontier.pageRankQ(edges, iters = iters).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val dist = Frontier.pageRankQ(edges, iters = iters, driverMax = 0L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hatch == dist, s"iters=$iters hatch $hatch != distributed $dist")
    }
  }

  test("trap detection: repeat/depth thresholds, root-url edge, query excluded, host rollup") {
    val spark2 = spark
    import spark2.implicits._
    val urls = Seq(
      "https://a.com/x/y/x/y/x/p1",        // 'x'×3 → suspect (repeat)
      "https://a.com/x/y/x/p2",            // 'x'×2 → clean at repeatAt=3
      "https://a.com/1/2/3/4/5/6/7/8/9/10/11/12", // depth 12 → suspect
      "https://b.com/only/three/segs",     // clean
      "https://b.com",                      // root: depth 0, never a trap
      "https://b.com/p?x=1&x=2&x=3&x=4"    // query repeats DON'T count
    ).toDF("url")
    val got = Frontier.trapSuspects(urls).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got("https://a.com/x/y/x/y/x/p1") == ((6, 3L, true)))
    assert(got("https://a.com/x/y/x/p2") == ((4, 2L, false)))
    assert(got("https://a.com/1/2/3/4/5/6/7/8/9/10/11/12") == ((12, 1L, true)))
    assert(got("https://b.com/only/three/segs") == ((3, 1L, false)))
    // root URL: kept (Spark explode_outer), zero depth/mult, clean —
    // the edge the w16 oracle fixture never reaches (DuckDB's inner
    // unnest would drop such a row; the operator contract is KEEP)
    assert(got("https://b.com") == ((0, 0L, false)))
    // the query string is not path: one 'p' segment, clean
    assert(got("https://b.com/p?x=1&x=2&x=3&x=4") == ((1, 1L, false)))

    val rep = Frontier.trapHostReport(urls).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rep("https://a.com".drop(8)) == ((3L, 2L, 2.0 / 3.0)), rep)
    assert(rep("b.com") == ((3L, 0L, 0.0)))
  }

  test("schedule: per-host slots are dense, offsets are delay multiples, denied urls absent") {
    val spark2 = spark
    import spark2.implicits._
    val verdicts = Seq(
      ("https://a.com/1", "a.com", true, Some(2.0)),
      ("https://a.com/2", "a.com", true, Some(2.0)),
      ("https://a.com/3", "a.com", false, Some(2.0)),
      ("https://b.com/1", "b.com", true, None)
    ).toDF("url", "host", "allowed", "crawl_delay")
    val got = Frontier.schedule(verdicts, defaultDelaySec = 0.5)
      .select("url", "slot", "fetch_offset_sec")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("https://a.com/1", 0L, 0.0),
      ("https://a.com/2", 1L, 2.0),
      ("https://b.com/1", 0L, 0.0)))
  }

  // Hand-computed (not shared-formula): the day-boundary semantics of
  // lastmod-vs-capture. A lastmod date expands to midnight (D000000),
  // so a capture at ANY time on day D beats a lastmod claim of day D —
  // same-day is NOT due. Multiple captures collapse to the latest
  // before the join (no seed fan-out).
  test("recrawlDue: never-captured due, same-day not due, only newer lastmod re-crawls") {
    val spark2 = spark
    import spark2.implicits._
    val seeds = Seq(
      ("https://a.com/new", "2025-02-05"), // never captured, claim → due
      ("https://a.com/newq", ""), // never captured, no claim → still due
      ("https://a.com/fresh", "2025-02-05"), // captured 02-05 12:00 → same day, not due
      ("https://a.com/stale", "2025-02-06"), // captured 02-05 → due
      ("https://a.com/old", "2025-02-04"), // captured 02-05 → not due
      ("https://a.com/quiet", ""), // captured, no claim → not due
      ("https://a.com/multi", "2025-02-08") // captured 02-03 AND 02-10 → latest wins, not due
    ).toDF("loc", "lastmod")
    val cdx = Seq(
      ("https://a.com/fresh", "20250205120000"),
      ("https://a.com/stale", "20250205120000"),
      ("https://a.com/old", "20250205120000"),
      ("https://a.com/quiet", "20250205120000"),
      ("https://a.com/multi", "20250203120000"),
      ("https://a.com/multi", "20250210120000")
    ).toDF("url", "ts")
    val got = Frontier.recrawlDue(seeds, cdx)
      .collect().map(r => (r.getString(0), r.getString(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("https://a.com/fresh", "20250205120000", false),
      ("https://a.com/multi", "20250210120000", false),
      ("https://a.com/new", "", true),
      ("https://a.com/newq", "", true),
      ("https://a.com/old", "20250205120000", false),
      ("https://a.com/quiet", "20250205120000", false),
      ("https://a.com/stale", "20250205120000", true)))
  }

  test("sitemapWalk: index resolves fetched children, unfetched pend, nested index loud") {
    val spark2 = spark
    import spark2.implicits._
    val sitemaps = Seq(
      ("a.com", "<?xml version=\"1.0\"?><sitemapindex>" +
        "<sitemap><loc>https://a.com/sm-0.xml</loc></sitemap>" +
        "<sitemap><loc>https://a.com/sm-unfetched.xml</loc></sitemap>" +
        "</sitemapindex>"),
      ("b.com", "<?xml version=\"1.0\"?><urlset>" +
        "<url><loc>https://b.com/direct</loc>" +
        "<lastmod>2025-03-01</lastmod></url></urlset>")
    ).toDF("host", "sitemap_xml")
    val children = Seq(
      ("https://a.com/sm-0.xml", "<?xml version=\"1.0\"?><urlset>" +
        "<url><loc>https://a.com/child1</loc></url>" +
        "<url><loc>https://a.com/child2</loc>" +
        "<lastmod>2025-03-02</lastmod></url></urlset>")
    ).toDF("sitemap_url", "sitemap_xml")
    val got = Frontier.sitemapWalk(sitemaps, children)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3))).sortBy(_._3)
    // the fetched child's entries at level 1, the direct urlset at level
    // 0; the unfetched child is pending frontier state, not an error
    assert(got.toSeq == Seq(
      ("a.com", 1, "https://a.com/child1", ""),
      ("a.com", 1, "https://a.com/child2", "2025-03-02"),
      ("b.com", 0, "https://b.com/direct", "2025-03-01")))
    // a child that is ITSELF an index violates the spec's one-level cap
    val nested = Seq(
      ("https://a.com/sm-0.xml", "<?xml version=\"1.0\"?><sitemapindex>" +
        "<sitemap><loc>https://a.com/sm-deeper.xml</loc></sitemap>" +
        "</sitemapindex>")
    ).toDF("sitemap_url", "sitemap_xml")
    val e = intercept[Exception](
      Frontier.sitemapWalk(sitemaps, nested).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("nested beyond")))
  }

  test("lastmodKey: golden table over the real-world W3C lastmod shapes") {
    val spark2 = spark
    import spark2.implicits._
    // the A13/A15 parity discipline applied to the crawl loop's newest
    // pure function: every shape a conforming (or broken) sitemap emits,
    // each with a HAND-computed UTC key
    val golden = Seq(
      ("", ""), // no freshness claim
      ("2025-02-05", "20250205000000"), // bare date → midnight UTC
      ("2025-02-05T10:30:00Z", "20250205103000"), // full datetime, UTC
      ("2025-02-05T10:30Z", "20250205103000"), // minute precision
      ("2025-02-05T10:30:00.5Z", "20250205103000"), // fraction truncates
      ("2025-02-05T10:30:00+13:00", "20250204213000"), // offset → PREV UTC day
      ("2025-02-05T10:30+13:00", "20250204213000"), // minute + offset
      ("2025-02-05T23:30:00-05:00", "20250206043000"), // offset → NEXT UTC day
      ("2025-03-01T00:30:00+01:00", "20250228233000"), // month boundary back
      ("2024-12-31T23:45:00-00:30", "20250101001500"), // year boundary forward
      ("2025-02-05T00:00:00Z", "20250205000000") // explicit midnight = bare date
    ).toDF("lm", "want")
    val got = golden
      .select(col("lm"), col("want"),
        Frontier.lastmodKey(col("lm")).as("got"))
      .collect()
    got.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"lastmodKey('${r.getString(0)}') = '${r.getString(2)}', want '${r.getString(1)}'")
    }
    // garbage fails LOUDLY — every shape the old string-compare silently
    // mis-ordered ('T' > '9') or a broken generator emits
    for (bad <- Seq("yesterday", "2025-2-5", "2025-02-05 10:30:00",
        "2025-02-05T10:30:00", "2025-02-05T10:30:00 +13:00", "05-02-2025",
        "2025-02-05T10", "20250205")) {
      val e = intercept[Exception] {
        Seq(bad).toDF("lm").select(Frontier.lastmodKey(col("lm"))).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("unparseable sitemap lastmod")),
        s"'$bad' did not raise the loud lastmod error: $e")
    }
    // an IMPOSSIBLE calendar date matches the bare-date shape but must
    // still raise (ANSI to_date), not silently compare greater than
    // every capture ts — the r12 over-crawl class
    for (bad <- Seq("2025-99-99", "2025-02-30", "2025-00-01")) {
      intercept[Exception] {
        Seq(bad).toDF("lm").select(Frontier.lastmodKey(col("lm"))).collect()
      }
    }
  }

  test("recrawlDue boundary: lastmod exactly ON the capture ts is NOT due; one second past is") {
    val spark2 = spark
    import spark2.implicits._
    // the oracle-parity blind-spot rule: the boundary case hand-planted
    // ON a capture timestamp, not derived from the shared formula
    val seeds = Seq(
      ("https://b.com/on", "2025-02-05T12:00:00Z"), // == capture → not due
      ("https://b.com/past", "2025-02-05T12:00:01Z"), // 1 s newer → due
      ("https://b.com/tzon", "2025-02-06T01:00:00+13:00"), // == capture via offset → not due
      ("https://b.com/tzpast", "2025-02-06T01:00:01+13:00") // 1 s newer via offset → due
    ).toDF("loc", "lastmod")
    val cdx = Seq(
      ("https://b.com/on", "20250205120000"),
      ("https://b.com/past", "20250205120000"),
      ("https://b.com/tzon", "20250205120000"),
      ("https://b.com/tzpast", "20250205120000")
    ).toDF("url", "ts")
    val got = Frontier.recrawlDue(seeds, cdx)
      .collect().map(r => (r.getString(0), r.getBoolean(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("https://b.com/on", false),
      ("https://b.com/past", true),
      ("https://b.com/tzon", false),
      ("https://b.com/tzpast", true)))
  }
}
