package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernel.{Robots, Sitemap}

/** Crawl-frontier operators — the politeness layer between URL
  * discovery and the fetchers ([[Fetch]]): robots.txt verdicts
  * (RFC 9309 via [[graft.kernel.Robots]]), sitemap seed extraction
  * ([[graft.kernel.Sitemap]]), and per-host fetch scheduling. With
  * these, the engine covers the full crawl loop: frontier → fetch →
  * WARC ([[WarcSource]]) → CDX → extraction → curation.
  */
object Frontier {

  /** Lowercased host of a URL (t28's regex dialect — shared with the
    * oracle). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))

  /** Path of a URL ("/" when absent); query/fragment excluded — robots
    * rules match the path (plus-query matching uses patterns with `?`,
    * which ride the path here when present in the URL). */
  def pathOf(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** The effective robots rule table for one crawler agent: per host,
    * parse robots.txt, run RFC 9309 group selection, and emit one row
    * per selected rule — (host, is_allow, pattern, specificity,
    * crawl_delay) — plus a ruleless marker row (specificity -1) so
    * hosts whose robots allow everything still carry their crawl delay
    * through the join. The parse runs ONCE per host inside the task
    * (the robots table is hosts-sized, tiny next to the URL corpus). */
  def effectiveRules(robots: DataFrame, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host"), col("robots_txt"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (host, txt) =>
          val g = Robots.select(Robots.parse(txt), agent)
          val delay = g.crawlDelay.getOrElse(-1.0)
          if (g.rules.isEmpty) Seq((host, true, "", -1, delay))
          else g.rules.map { case (allow, pat) =>
            (host, allow, pat, pat.length, delay)
          }
        }
      }
      .toDF("host", "is_allow", "pattern", "specificity", "crawl_delay")
  }

  /** RFC 9309 verdict per URL: join the URL table to the per-host rule
    * table, test each rule with the codegen'd robots matcher, keep the
    * most specific match (Allow wins ties — max of the (specificity,
    * is_allow) struct), default allow. Output: (url, host, path,
    * allowed, crawl_delay). The join is keyed on host — Spark
    * broadcasts the rule table when it is small and hash-joins
    * otherwise; URLs shuffle at most once, rules never explode. */
  def robotsVerdicts(urls: DataFrame, robots: DataFrame,
      agent: String): DataFrame = {
    val fns = graft.functions.GraftFunctions
    val rules = effectiveRules(robots, agent)
    // one output row PER INPUT ROW, duplicates included — the regroup
    // after the rule fan-out keys on a stable row id, not the url value,
    // so a frontier with repeated URLs round-trips row-for-row (parity
    // with robotsVerdictsLocal, which is trivially per-row)
    val parsed = urls.select(col("url"),
      hostOf(col("url")).as("host"), pathOf(col("url")).as("path"))
      .withColumn("_rid", monotonically_increasing_id())
    parsed
      .join(rules, Seq("host"), "left")
      .withColumn("hit",
        col("pattern").isNotNull && col("specificity") >= 0 &&
          fns.robots_match(col("path"), col("pattern")))
      .groupBy(col("_rid"), col("url"), col("host"), col("path"))
      .agg(
        max(when(col("hit"),
          struct(col("specificity"), col("is_allow")))).as("best"),
        max(col("crawl_delay")).as("crawl_delay"))
      .select(col("url"), col("host"), col("path"),
        coalesce(col("best.is_allow"), lit(true)).as("allowed"),
        when(col("crawl_delay") >= 0, col("crawl_delay")).as("crawl_delay"))
  }

  /** [[robotsVerdicts]] with the rule table riding the PLAN instead of a
    * join: parse + group-select per host ON THE DRIVER (bounded by
    * `maxHosts` — loud, not OOM), broadcast the host → rules map, and
    * decide every URL row-locally with the kernel's RFC 9309 walk. ZERO
    * shuffles and zero joins — the corpus never exchanges. This is the
    * common-case shape (robots tables are millions of hosts at most —
    * far under executor memory); the join form above is the fallback
    * when the host table itself is at data scale. Output identical
    * (spec-gated parity). */
  def robotsVerdictsLocal(urls: DataFrame, robots: DataFrame, agent: String,
      maxHosts: Int = 1 << 22): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val collected = robots.select(col("host"), col("robots_txt"))
      .as[(String, String)].limit(maxHosts + 1).collect()
    require(collected.length <= maxHosts,
      s"robots table exceeds maxHosts=$maxHosts; use robotsVerdicts (join form)")
    val groups: Map[String, Robots.Group] = collected.map { case (h, txt) =>
      h -> Robots.select(Robots.parse(txt), agent)
    }.toMap
    val bc = spark.sparkContext.broadcast(groups)
    urls.select(col("url"),
        hostOf(col("url")).as("host"), pathOf(col("url")).as("path"))
      .as[(String, String, String)]
      .mapPartitions { it =>
        val gs = bc.value
        it.map { case (url, host, path) =>
          gs.get(host) match {
            case Some(g) =>
              (url, host, path, Robots.allowed(g, path), g.crawlDelay)
            case None => (url, host, path, true, None: Option[Double])
          }
        }
      }
      .toDF("url", "host", "path", "allowed", "crawl_delay")
  }

  /** Per-host politeness schedule over the allowed frontier: URLs of a
    * host fetch one `delay` apart (its robots crawl-delay, else
    * `defaultDelaySec`), hosts run in parallel. One window partitioned
    * by host — the frontier's natural key, so the exchange is the same
    * hash distribution every later per-host stage reuses. Output adds
    * (slot, fetch_offset_sec). */
  def schedule(verdicts: DataFrame, defaultDelaySec: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col("url"))
    verdicts
      .filter(col("allowed"))
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_offset_sec",
        col("slot") * coalesce(col("crawl_delay"), lit(defaultDelaySec)))
  }

  /** Extract outbound links from crawled pages — the edge source for
    * crawl prioritization: absolute http(s) `href` values from anchor
    * tags (attribute order tolerated, quotes required; relative-URL
    * resolution is a caller concern and deliberately out of scope).
    * One row-local regex projection over (url, html): zero shuffles.
    * Output (src_url, src_host, dst_url, dst_host). */
  def extractLinks(pages: DataFrame): DataFrame =
    pages.select(col("url").as("src_url"),
        hostOf(col("url")).as("src_host"),
        explode(expr(
          """regexp_extract_all(html, '<a\\s[^>]*href="(https?://[^"#]+)', 1)"""))
          .as("dst_url"))
      .withColumn("dst_host", hostOf(col("dst_url")))

  /** Host-level link graph: (src_host, dst_host, n_links) with
    * self-links kept (callers drop them for ranking) — one aggregation
    * over the link rows, the standard web-graph rollup. */
  def hostGraph(links: DataFrame): DataFrame =
    links.groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** PageRank over an edge table (src, dst) — crawl-frontier
    * prioritization (which hosts deserve fetch budget): the standard
    * damped power iteration with dangling-mass redistribution. Each
    * iteration is one join + one aggregation (contributions along
    * edges) plus a scalar action for the dangling mass; ranks are
    * eagerly checkpointed per iteration — the iterative-lineage trap
    * (each plan otherwise CONTAINS all previous iterations and
    * planning, not compute, dominates past ~5 rounds). Deterministic:
    * per-node contribution sums ride one aggregation; doubles differ
    * only in ulps across partitionings of the same frame, and the spec
    * pins hand-computed values on exact-arithmetic graphs. */
  def pageRank(edges: DataFrame, iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      // dangling mass rides the plan as a 1-row frame crossed in — NOT a
      // collected scalar, which would cost a second action per iteration
      // on top of the checkpoint (measured: per-iteration fixed overhead
      // dominates this operator at small graph sizes)
      val dangling = ranks.join(outdeg, col("node") === col("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contribs = e
        .join(ranks.join(outdeg, col("node") === col("src"))
          .select(col("node").as("c_src"), (col("rank") / col("deg")).as("share")),
          col("src") === col("c_src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("c"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dm") / n))
            .as("rank"))
        .localCheckpoint(true)
      it += 1
    }
    e.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** Flatten sitemap XML documents into frontier seed rows:
    * (host, kind, loc, lastmod). Index documents emit their child
    * sitemap locations with kind `sitemapindex` — the caller fetches
    * and feeds them back (the standard two-level walk). */
  def sitemapSeeds(sitemaps: DataFrame): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col("host"), col("sitemap_xml"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (host, xml) =>
          val doc = Sitemap.parse(xml)
          doc.entries.map(e => (host, doc.kind, e.loc, e.lastmod))
        }
      }
      .toDF("host", "kind", "loc", "lastmod")
  }

  /** Freshness-driven re-crawl selection — what a continuous crawl
    * does with sitemap `lastmod` against its own capture index: a URL
    * is DUE when it was never captured, or when its advertised lastmod
    * post-dates the latest stored capture. `seeds`: (loc, lastmod —
    * `YYYY-MM-DD` or empty) from [[sitemapSeeds]]; `cdx`: (url, ts —
    * 14-digit) from [[WarcSource.cdxRows]]. The index side aggregates
    * to max-ts per url BEFORE the join, so capture multiplicity never
    * fans the seed list; one keyed join, no other shuffle. An empty
    * lastmod means the sitemap makes no freshness claim — only
    * never-captured URLs are due. */
  def recrawlDue(seeds: DataFrame, cdx: DataFrame): DataFrame = {
    val latest = cdx.groupBy(col("url"))
      .agg(max(col("ts")).as("last_capture_ts"))
    seeds.select(col("loc").as("url"), col("lastmod"))
      .join(latest, Seq("url"), "left")
      .select(col("url"), col("lastmod"),
        coalesce(col("last_capture_ts"), lit("")).as("last_capture_ts"),
        (col("last_capture_ts").isNull ||
          (col("lastmod") =!= "" &&
            concat(regexp_replace(col("lastmod"), "-", ""), lit("000000")) >
              col("last_capture_ts"))).as("due"))
  }

  /** Sitemap DIRECTIVES out of robots.txt — the missing link between
    * the robots fetch and [[sitemapSeeds]]: RFC 9309 lets a host
    * advertise its sitemaps as `Sitemap:` lines (outside any group,
    * case-insensitive, comments stripped), and a real crawl loop seeds
    * its sitemap fetches from exactly these. One row per directive in
    * file order, through the REAL [[graft.kernel.Robots]] grammar —
    * a row-local flatMap, a map stage at any scale. */
  def robotsSitemaps(robots: DataFrame): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host"), col("robots_txt"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (host, txt) =>
          Robots.parse(txt).sitemaps.zipWithIndex.map {
            case (u, i) => (host, i, u)
          }
        }
      }
      .toDF("host", "sitemap_idx", "sitemap_url")
  }

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic per-host robots fixture shared by w03/w05 and their
    * oracles: even hosts carry a crawler-specific group (plus a
    * deny-all `*` group that MUST lose group selection), odd hosts only
    * a `*` group. */
  private def robotsFixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    (0 until 19).map { k =>
      val delay = s"Crawl-delay: ${1 + k % 5}\n"
      val txt =
        if (k % 2 == 0)
          "User-agent: graft\n" +
            "Disallow: /bot\nDisallow: /private\nAllow: /private/ok1\n" +
            delay +
            "\nUser-agent: *\nDisallow: /\n"
        else
          "User-agent: *\n" +
            "Disallow: /private\nAllow: /private/ok1\n" + delay
      (s"h$k.example.com", txt)
    }.toDF("host", "robots_txt")
  }

  private def urlFixture(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    docs.select(concat(lit("https://h"), col("doc_id") % 19,
      lit(".example.com"),
      element_at(array(
        concat(lit("/public/doc"), col("doc_id")),
        concat(lit("/private/doc"), col("doc_id")),
        concat(lit("/private/ok"), col("doc_id") % 3, lit("/x"), col("doc_id")),
        concat(lit("/bot/page"), col("doc_id")),
        concat(lit("/?d="), col("doc_id"))), (col("doc_id") % 5 + 1).cast("int"))).as("url"))
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // robots.txt verdicts, oracle-gated end to end: the REAL grammar →
    // group selection → longest-match/allow-wins decision runs on
    // planted robots files whose EFFECTIVE outcome per URL class is
    // SQL-computable (the w02 discipline). The plant exercises group
    // selection (even hosts: the crawler group must beat a deny-all `*`
    // group), specificity override (Allow /private/ok1 beats Disallow
    // /private only for ok1 paths), per-group crawl delays, and the
    // no-match default. Wildcard/$ patterns are spec-gated in
    // FrontierSpec (not SQL-expressible).
    ("w03_robots_verdicts", (s: SparkSession, d: String) => {
      robotsVerdicts(urlFixture(s, d), robotsFixture(s, d), "graftbot")
        .orderBy(col("url"))
    },
    Some("""WITH u AS (
        SELECT doc_id, doc_id % 19 AS k, doc_id % 5 AS pc,
          'https://h' || (doc_id % 19) || '.example.com' ||
            CASE doc_id % 5
              WHEN 0 THEN '/public/doc' || doc_id
              WHEN 1 THEN '/private/doc' || doc_id
              WHEN 2 THEN '/private/ok' || (doc_id % 3) || '/x' || doc_id
              WHEN 3 THEN '/bot/page' || doc_id
              ELSE '/?d=' || doc_id END AS url,
          CASE doc_id % 5
            WHEN 0 THEN '/public/doc' || doc_id
            WHEN 1 THEN '/private/doc' || doc_id
            WHEN 2 THEN '/private/ok' || (doc_id % 3) || '/x' || doc_id
            WHEN 3 THEN '/bot/page' || doc_id
            ELSE '/?d=' || doc_id END AS path
        FROM documents)
      SELECT url, 'h' || k || '.example.com' AS host, path,
        CASE CAST(pc AS INTEGER)
          WHEN 1 THEN false
          WHEN 2 THEN doc_id % 3 = 1
          WHEN 3 THEN k % 2 = 1
          ELSE true END AS allowed,
        CAST(1 + k % 5 AS DOUBLE) AS crawl_delay
      FROM u ORDER BY url""")),

    // Sitemap seed extraction, oracle-gated: leaf urlsets and a
    // sitemapindex per host, with entity-escaped locs the parser must
    // decode and lastmod optionality — DuckDB recomputes every row
    // from the same templates.
    ("w04_sitemap_seeds", (s: SparkSession, d: String) => {
      import s.implicits._
      val xml = (0 until 7).map { k =>
        val host = s"h$k.example.com"
        if (k % 3 == 2)
          (host, "<?xml version=\"1.0\"?>\n" +
            "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
            (0 until 3).map(i =>
              s"<sitemap><loc>https://$host/maps/m$i.xml</loc>" +
                s"<lastmod>2025-0${i + 1}-01</lastmod></sitemap>").mkString +
            "</sitemapindex>")
        else
          (host, "<?xml version=\"1.0\"?>\n" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
            (0 until 4).map(i =>
              s"<url><loc>https://$host/p$i?a=1&amp;b=$i</loc>" +
                (if (i % 2 == 0) s"<lastmod>2025-02-0${i + 1}</lastmod>" else "") +
                "</url>").mkString +
            "</urlset>")
      }.toDF("host", "sitemap_xml")
      sitemapSeeds(xml).orderBy(col("host"), col("loc"))
    },
    Some("""WITH hosts AS (
        SELECT 'h' || k || '.example.com' AS host, k
        FROM (SELECT unnest(range(0, 7)) AS k)),
      leaf AS (
        SELECT host, 'urlset' AS kind,
          'https://' || host || '/p' || i || '?a=1&b=' || i AS loc,
          CASE WHEN i % 2 = 0 THEN '2025-02-0' || (i + 1) ELSE '' END AS lastmod
        FROM hosts, (SELECT unnest(range(0, 4)) AS i) WHERE k % 3 <> 2),
      idx AS (
        SELECT host, 'sitemapindex' AS kind,
          'https://' || host || '/maps/m' || i || '.xml' AS loc,
          '2025-0' || (i + 1) || '-01' AS lastmod
        FROM hosts, (SELECT unnest(range(0, 3)) AS i) WHERE k % 3 = 2)
      SELECT * FROM (SELECT * FROM leaf UNION ALL SELECT * FROM idx)
      ORDER BY host, loc""")),

    // Link extraction + host-graph rollup, oracle-gated: pages carry
    // planted anchors (attribute clutter, a relative link that must NOT
    // extract, a fragment that must trim) and DuckDB recomputes the
    // full (src_host, dst_host, n_links) rollup from the plant
    // arithmetic.
    ("w06_link_graph", (s: SparkSession, d: String) => {
      val docs = graft.Tables.documents(s, d)
      val pages = docs.select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("url"),
        concat(
          lit("<html><body><a href=\"https://h"), (col("doc_id") + 1) % 19,
          lit(".example.com/x"), col("doc_id"),
          lit("\">a</a> <a class=\"z\" href=\"https://h"),
          (col("doc_id") * 3 + 1) % 19,
          lit(".example.com/y\">b</a> <a href=\"/relative/skip\">c</a>"),
          lit(" <a href=\"https://skip.example.com/frag#sec\">d</a>"),
          lit("</body></html>")).as("html"))
      hostGraph(extractLinks(pages))
        .orderBy(col("src_host"), col("dst_host"))
    },
    Some("""WITH e AS (
        SELECT 'h' || (doc_id % 19) || '.example.com' AS src_host,
          'h' || ((doc_id + 1) % 19) || '.example.com' AS dst_host
        FROM documents
        UNION ALL
        SELECT 'h' || (doc_id % 19) || '.example.com',
          'h' || ((doc_id * 3 + 1) % 19) || '.example.com'
        FROM documents
        UNION ALL
        SELECT 'h' || (doc_id % 19) || '.example.com', 'skip.example.com'
        FROM documents)
      SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
      FROM e GROUP BY src_host, dst_host ORDER BY src_host, dst_host""")),

    // Host PageRank over the crawled link graph — the crawl-budget
    // prioritization signal. Rows-only (damped power iteration in
    // doubles is not SQL-expressible at parity); hand-computed
    // iteration values, dangling-mass conservation, star-graph
    // ordering, and bit-identical determinism are spec-gated in
    // FrontierSpec.
    ("w07_host_rank", (s: SparkSession, d: String) => {
      val docs = graft.Tables.documents(s, d)
      val pages = docs.select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("url"),
        concat(
          lit("<html><body><a href=\"https://h"), (col("doc_id") + 1) % 19,
          lit(".example.com/x\">a</a> <a href=\"https://h"),
          (col("doc_id") * 3 + 1) % 19,
          lit(".example.com/y\">b</a></body></html>")).as("html"))
      val edges = hostGraph(extractLinks(pages))
        .filter(col("src_host") =!= col("dst_host"))
        .select(col("src_host").as("src"), col("dst_host").as("dst"))
      // 6 rounds: rank ORDER on a 19-host graph stabilizes in 3-4; each
      // Spark iteration costs fixed scheduling overhead, not compute
      pageRank(edges, iters = 6)
        .orderBy(col("node"))
    }, None),

    // Per-host politeness schedule over the allowed frontier — slots
    // and fetch offsets from each host's crawl delay; oracle recomputes
    // the window exactly (slot arithmetic is integer, offsets are
    // small-int multiples — exact doubles).
    ("w05_fetch_schedule", (s: SparkSession, d: String) => {
      schedule(
        robotsVerdicts(urlFixture(s, d), robotsFixture(s, d), "graftbot"))
        .select(col("url"), col("host"), col("slot"),
          col("fetch_offset_sec"))
        .orderBy(col("url"))
    },
    Some("""WITH u AS (
        SELECT doc_id, doc_id % 19 AS k, doc_id % 5 AS pc,
          'https://h' || (doc_id % 19) || '.example.com' ||
            CASE doc_id % 5
              WHEN 0 THEN '/public/doc' || doc_id
              WHEN 1 THEN '/private/doc' || doc_id
              WHEN 2 THEN '/private/ok' || (doc_id % 3) || '/x' || doc_id
              WHEN 3 THEN '/bot/page' || doc_id
              ELSE '/?d=' || doc_id END AS url
        FROM documents),
      verdicts AS (
        SELECT url, 'h' || k || '.example.com' AS host,
          CAST(1 + k % 5 AS DOUBLE) AS delay,
          CASE CAST(pc AS INTEGER)
            WHEN 1 THEN false
            WHEN 2 THEN doc_id % 3 = 1
            WHEN 3 THEN k % 2 = 1
            ELSE true END AS allowed
        FROM u),
      allowed_urls AS (SELECT * FROM verdicts WHERE allowed)
      SELECT url, host,
        CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
          AS BIGINT) AS slot,
        CAST((row_number() OVER (PARTITION BY host ORDER BY url) - 1)
          AS DOUBLE) * delay AS fetch_offset_sec
      FROM allowed_urls ORDER BY url""")),

    // Sitemap directives out of robots.txt, oracle-gated end to end
    // through the REAL RFC 9309 grammar: each host's file plants
    // doc_id%3 directives in MIXED case and position (before the group,
    // inside a group, after it — all legal), plus a commented-out
    // directive and an empty `Sitemap:` that must both drop. DuckDB
    // regenerates the expected (host, idx, url) rows from the plant
    // rule, so a grammar bug (case, comment stripping, group
    // interaction, ordering) breaks the hash.
    ("w10_robots_sitemaps", (s: SparkSession, d: String) => {
      import s.implicits._
      val robots = graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val host = s"h$id.example.com"
          val n = (id % 3).toInt
          val lines = (0 until n).map { i =>
            val field = if (i % 2 == 0) "Sitemap" else "sItEmAp"
            s"$field: https://$host/sm-$i.xml"
          }
          val txt =
            (if (n > 0) lines.take(1).mkString("", "\n", "\n") else "") +
              "# Sitemap: https://ignored.example.com/no.xml\n" +
              "User-agent: *\nDisallow: /tmp\n" +
              "Sitemap:\n" + // empty value drops
              (if (n > 1) lines.drop(1).mkString("", "\n", "\n") else "")
          (host, txt, id)
        }
        .toDF("host", "robots_txt", "doc_id")
      robotsSitemaps(robots)
        .orderBy(col("host"), col("sitemap_idx"))
    },
    Some("""WITH n AS (
        SELECT doc_id, 'h' || doc_id || '.example.com' AS host,
          CAST(doc_id % 3 AS INTEGER) AS cnt
        FROM documents),
      rows_ AS (
        SELECT host, CAST(unnest(range(0, cnt)) AS INTEGER) AS sitemap_idx
        FROM n)
      SELECT host, sitemap_idx,
        'https://' || host || '/sm-' || sitemap_idx || '.xml' AS sitemap_url
      FROM rows_ ORDER BY host, sitemap_idx""")),

    // The WHOLE frontier politeness pipeline in one composed
    // oracle-gated query: crawled pages → link extraction → URL dedup →
    // RFC 9309 robots verdicts (real grammar: longest-match Allow /x8
    // carving an exception out of Disallow /x, per-host crawl delays,
    // rule-free hosts defaulting to allow) → per-host fetch schedule.
    // DuckDB recomputes the planted-effective-outcome of every stage,
    // so a bug in the regex, the dedup, group selection, specificity,
    // delay plumbing, or slot assignment breaks the hash.
    ("c03_frontier_pipeline", (s: SparkSession, d: String) => {
      import s.implicits._
      val docs = graft.Tables.documents(s, d)
      val pages = docs.select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("url"),
        concat(
          lit("<html><body><a href=\"https://h"), (col("doc_id") + 1) % 19,
          lit(".example.com/x"), col("doc_id"),
          lit("\">a</a> <a href=\"https://h"), (col("doc_id") * 3 + 1) % 19,
          lit(".example.com/y\">b</a></body></html>")).as("html"))
      val frontier = extractLinks(pages)
        .select(col("dst_url").as("url")).distinct()
      val robots = s.range(19).select(
        concat(lit("h"), col("id"), lit(".example.com")).as("host"),
        when(col("id") % 2 === 0,
          concat(lit("User-agent: *\nDisallow: /x\nAllow: /x8\nCrawl-delay: "),
            (lit(1) + col("id") % 4).cast("string"), lit("\n")))
          .otherwise(lit("User-agent: *\n")).as("robots_txt"))
      schedule(robotsVerdicts(frontier, robots, "graftbot"))
        .select(col("url"), col("host"), col("slot"), col("fetch_offset_sec"))
        .orderBy(col("url"))
    },
    Some("""WITH x AS (
        SELECT 'https://h' || ((doc_id + 1) % 19) || '.example.com/x' ||
            doc_id AS url,
          'h' || ((doc_id + 1) % 19) || '.example.com' AS host,
          CAST((doc_id + 1) % 19 AS INTEGER) AS k,
          CAST(doc_id AS VARCHAR) LIKE '8%' AS x8
        FROM documents),
      y AS (
        SELECT DISTINCT
          'https://h' || ((doc_id * 3 + 1) % 19) || '.example.com/y' AS url,
          'h' || ((doc_id * 3 + 1) % 19) || '.example.com' AS host,
          CAST((doc_id * 3 + 1) % 19 AS INTEGER) AS k
        FROM documents),
      verd AS (
        SELECT url, host,
          CASE WHEN k % 2 = 1 THEN true ELSE x8 END AS allowed,
          CASE WHEN k % 2 = 0 THEN CAST(1 + k % 4 AS DOUBLE)
            ELSE CAST(1.0 AS DOUBLE) END AS delay
        FROM x
        UNION ALL
        SELECT url, host, true,
          CASE WHEN k % 2 = 0 THEN CAST(1 + k % 4 AS DOUBLE)
            ELSE CAST(1.0 AS DOUBLE) END
        FROM y),
      a AS (SELECT * FROM verd WHERE allowed)
      SELECT url, host,
        CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
          AS BIGINT) AS slot,
        CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
          AS DOUBLE) * delay AS fetch_offset_sec
      FROM a ORDER BY url""")),

    // Freshness-driven re-crawl selection, oracle-gated: per-doc seed
    // URLs carry a planted lastmod day (every 6th doc makes NO
    // freshness claim), the capture index covers every 3rd doc with a
    // planted capture day, and `due` must reproduce the exact
    // calendar comparison — never-captured URLs due, stale captures
    // due, fresh captures and claim-free captured URLs not due.
    ("w14_recrawl_due", (s: SparkSession, d: String) => {
      val docs = graft.Tables.documents(s, d)
      val seeds = docs.select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("loc"),
        when(col("doc_id") % 6 === 0, lit(""))
          .otherwise(concat(lit("2025-02-"),
            lpad((col("doc_id") % 27 + 1).cast("string"), 2, "0")))
          .as("lastmod"))
      val cdx = docs.filter(col("doc_id") % 3 === 0).select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("url"),
        concat(lit("202502"),
          lpad((col("doc_id") % 13 + 1).cast("string"), 2, "0"),
          lit("120000")).as("ts"))
      recrawlDue(seeds, cdx).orderBy(col("url"))
    },
    Some("""WITH seeds AS (
        SELECT doc_id,
          'https://h' || (doc_id % 19) || '.example.com/p' || doc_id AS url,
          CASE WHEN doc_id % 6 = 0 THEN ''
            ELSE '2025-02-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
          END AS lastmod
        FROM documents),
      cdx AS (
        SELECT doc_id,
          '202502' || lpad(CAST(doc_id % 13 + 1 AS VARCHAR), 2, '0') ||
            '120000' AS ts
        FROM documents WHERE doc_id % 3 = 0)
      SELECT s.url, s.lastmod,
        COALESCE(c.ts, '') AS last_capture_ts,
        (c.ts IS NULL OR (s.lastmod <> '' AND
          replace(s.lastmod, '-', '') || '000000' > c.ts)) AS due
      FROM seeds s LEFT JOIN cdx c ON s.doc_id = c.doc_id
      ORDER BY s.url"""))
  )
}
