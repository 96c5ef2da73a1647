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

  /** [[pageRank]] in exact integer fixed-point — the oracle-checkable
    * form (the t19/t25/r03 discipline applied to power iteration).
    * Rank is an integer MASS out of `totalMass`; damping 17/20 and the
    * teleport base 3·M/(20·n) are exact integer rationals; every
    * per-iteration operation is an integer floor-division or an
    * order-free BIGINT sum, so the per-node masses after any fixed
    * iteration count are engine-exact and a SQL engine can replay the
    * iterations verbatim (w07's oracle unrolls them as chained CTEs).
    *
    *   share(u)  = m(u) div deg(u)            (deg > 0)
    *   dt        = Σ_{deg(u)=0} (m(u) div n)  (sum of floors — order-free)
    *   m'(v)     = 3·M div (20·n) + 17·(Σ_{u→v} share(u) + dt) div 20
    *
    * Floor truncation leaks a few units of mass per iteration (bounded
    * by n + 20 per step) — the price of exactness; ORDERING matches the
    * double version away from sub-ppm ties. Same per-iteration
    * checkpoint discipline as [[pageRank]] (iterative-lineage trap). */
  def pageRankQ(edges: DataFrame, iters: Int = 6,
      totalMass: Long = 1000000000000L,
      driverMax: Long = 100000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(totalMass > 0 && totalMass <= (Long.MaxValue / 20),
      s"totalMass $totalMass out of the overflow-safe range")
    // Small-graph hatch (the Clusters.connectedComponents r19 pattern):
    // a HOST-level graph is host-cardinality, and the distributed loop
    // below pays one localCheckpoint job per iteration plus the
    // count/isEmpty probes — pure fixed scheduling cost when the graph
    // fits on the driver. Probe with ONE bounded collect: the limit
    // returns the full edge multiset iff it fits, and the in-memory
    // rounds run the IDENTICAL integer arithmetic (floor divisions on
    // non-negative longs, order-free Long sums), so the per-node masses
    // are bit-identical to the distributed fixed point. Over-limit
    // graphs fall through to the unchanged distributed loop; pass
    // driverMax = 0 to force it.
    val spark0 = edges.sparkSession
    val eProj = edges.select(col("src"), col("dst"))
    val probeLimit = math.min(driverMax + 1, Int.MaxValue.toLong).toInt
    val probed =
      if (driverMax <= 0) Array.empty[org.apache.spark.sql.Row]
      else eProj.limit(probeLimit).collect()
    if (driverMax > 0 && probed.length <= driverMax) {
      // duplicate edges kept deliberately: the distributed loop never
      // dedups `edges`, so a repeated (src,dst) row contributes its
      // share once per occurrence there and must do the same here
      val es: Array[(Any, Any)] = probed.map(r => (r.get(0), r.get(1)))
      val nodes: Vector[Any] =
        (es.iterator.map(_._1) ++ es.iterator.map(_._2)).toVector.distinct
      val n = nodes.size.toLong
      require(n > 0, "pageRankQ: empty graph")
      val base = (3L * totalMass) / (20L * n)
      val outdeg = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (u, _) =>
        outdeg(u) = outdeg.getOrElse(u, 0L) + 1L }
      var mass: scala.collection.Map[Any, Long] =
        nodes.iterator.map(nd => nd -> totalMass / n).toMap
      var it = 0
      while (it < iters) {
        // dt = Σ_{deg(u)=0} (m(u) div n) — sum of floors, order-free
        var dt = 0L
        nodes.foreach { u =>
          if (!outdeg.contains(u)) dt += mass(u) / n }
        val contrib = scala.collection.mutable.HashMap.empty[Any, Long]
        es.foreach { case (u, v) =>
          contrib(v) = contrib.getOrElse(v, 0L) + mass(u) / outdeg(u) }
        mass = nodes.iterator.map { nd =>
          nd -> (base + (17L * (contrib.getOrElse(nd, 0L) + dt)) / 20L)
        }.toMap
        it += 1
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          eProj.schema.fields(0).dataType),
        org.apache.spark.sql.types.StructField("mass",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(nodes.map(nd =>
          org.apache.spark.sql.Row(nd, mass(nd))): _*)
      return spark0.createDataFrame(rows, schema)
    }
    val e = eProj
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRankQ: empty graph")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = (3L * totalMass) / (20L * n)
    // one upfront structural check: a graph with NO dangling nodes (a
    // host-level web graph usually has none — every crawled host links
    // out) runs every iteration without the dangling aggregation and
    // its crossed-in exchange; dt is identically 0 there, so the
    // skipped plan computes the same masses
    val hasDangling = !nodes
      .join(outdeg, col("node") === col("src"), "left_anti").isEmpty
    var mass = nodes.withColumn("mass", lit(totalMass / n))
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val withDeg = mass.join(outdeg, col("node") === col("src"), "left")
      val contribs = e
        .join(withDeg.filter(col("deg").isNotNull)
          .select(col("node").as("c_src"), expr("mass div deg").as("share")),
          col("src") === col("c_src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("c"))
      val joined = nodes.join(contribs, col("node") === col("dst"), "left")
      mass = (if (hasDangling) {
          val dangling = withDeg.filter(col("deg").isNull)
            .agg(coalesce(sum(expr(s"mass div ${n}L")), lit(0L)).as("dt"))
          joined.crossJoin(dangling)
            .select(col("node"),
              (lit(base) +
                expr("(17L * (coalesce(c, 0L) + dt)) div 20L")).as("mass"))
        } else
          joined.select(col("node"),
            (lit(base) +
              expr("(17L * coalesce(c, 0L)) div 20L")).as("mass")))
        .localCheckpoint(true)
      it += 1
    }
    e.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    mass
  }

  /** Crawler-trap detection — the frontier hygiene screen every
    * production crawler runs (Heritrix's TooManyPathSegments /
    * PathologicalPath rules, made exact): a URL is a trap SUSPECT when
    * its path repeats one segment `repeatAt`+ times (the /a/b/a/b/a/b
    * mirror-loop signature) or nests deeper than `depthAt` segments
    * (calendar/facet explosion). Returns one row per URL —
    * (url, host, depth, max_mult, suspect) — all-integer verdicts, so
    * the screen is engine-exact; [[trapHostReport]] rolls it up to the
    * per-host budget signal. Row-local split + one (url, segment)
    * aggregation: no corpus-shaped join anywhere. */
  def trapSuspects(urls: DataFrame, repeatAt: Int = 3,
      depthAt: Int = 12): DataFrame = {
    require(repeatAt >= 2 && depthAt >= 1, s"repeatAt $repeatAt depthAt $depthAt")
    val segs = urls.select(col("url"), hostOf(col("url")).as("host"),
        expr("filter(split(" +
          // pathOf, inlined for the expr: query/fragment excluded
          "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#?]*)', 1)" +
          ", '/'), s -> s != '')").as("segs"))
    segs
      .select(col("url"), col("host"), size(col("segs")).as("depth"),
        explode_outer(col("segs")).as("seg"))
      .groupBy(col("url"), col("host"), col("depth"), col("seg"))
      .agg(count(col("seg")).as("mult"))
      .groupBy(col("url"), col("host"), col("depth"))
      .agg(max(col("mult")).as("max_mult"))
      .select(col("url"), col("host"), col("depth"), col("max_mult"),
        (col("max_mult") >= repeatAt || col("depth") >= depthAt)
          .as("suspect"))
  }

  /** Per-host trap rollup: URL counts, suspect counts, and the exact
    * suspect share — the signal a crawl budgeter throttles on. */
  def trapHostReport(urls: DataFrame, repeatAt: Int = 3,
      depthAt: Int = 12): DataFrame =
    trapSuspects(urls, repeatAt, depthAt)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("suspect"), 1L).otherwise(0L)).as("n_suspect"))
      .withColumn("suspect_share",
        col("n_suspect").cast("double") / col("n_urls").cast("double"))

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

  /** Two-level sitemap walk — the sitemaps.org INDEX protocol: parse
    * the fetched top-level documents; `urlset` entries emit directly
    * (level 0), `sitemapindex` entries resolve through `children`
    * (sitemap_url → sitemap_xml — the fetch table a crawler
    * materializes for the child URLs) and parse again (level 1). The
    * spec caps nesting at ONE index level, so the walk is a single
    * keyed join, not a loop; a child that is itself an index raises
    * loudly. A child listed in an index but absent from `children` is
    * simply not-yet-fetched frontier state and contributes nothing —
    * feeding the index's child URLs into the fetcher is the caller's
    * loop, exactly like [[robotsSitemaps]] → sitemap fetch.
    *
    * Scale: both parses are row-local flatMaps; the only exchange is
    * the child join keyed on sitemap_url (host-bounded — broadcastable
    * whenever the index side is the usual few-thousand-hosts frontier
    * table). */
  def sitemapWalk(sitemaps: DataFrame, children: DataFrame): DataFrame = {
    // parsed ONCE, eagerly (localCheckpoint, auto-GC'd): both the leaf
    // projection and the child join read this frame, and the seed rows
    // are far smaller than re-running Sitemap.parse over every XML
    // document twice (the multi-referenced-stage rule)
    val first = sitemapSeeds(sitemaps).localCheckpoint(true)
    val leaf1 = first.filter(col("kind") === "urlset")
      .select(col("host"), lit(0).as("level"), col("loc"), col("lastmod"))
    val childXml = first.filter(col("kind") === "sitemapindex")
      .select(col("host"), col("loc").as("sitemap_url"))
      .join(children, Seq("sitemap_url"))
    val second = sitemapSeeds(childXml.select(col("host"), col("sitemap_xml")))
    val leaf2 = second.select(col("host"),
      when(col("kind") === "urlset", lit(1))
        .otherwise(raise_error(concat(
          lit("sitemap index nested beyond the spec's one level: "),
          col("loc"))).cast("int")).as("level"),
      col("loc"), col("lastmod"))
    leaf1.unionAll(leaf2)
  }

  /** Normalize a sitemap `lastmod` to the 14-digit UTC capture-index
    * key (`yyyyMMddHHmmss`) — the comparison currency of
    * [[recrawlDue]]. sitemaps.org allows the full W3C datetime grammar,
    * not just bare dates, and the offset math matters: a
    * `2025-02-05T10:30:00+13:00` lastmod is 2025-02-04 in UTC.
    * Accepted forms (everything a conforming sitemap can emit):
    *   - empty        → empty (no freshness claim)
    *   - `YYYY-MM-DD` → date + `000000` (midnight UTC — the W3C rule
    *     that a bare date means "unknown time of that day"; comparing
    *     at 000000 makes a same-day capture at any time count as fresh
    *     only if the lastmod is strictly newer, i.e. never)
    *   - `YYYY-MM-DDThh:mm[:ss[.frac]](Z|±hh:mm)` → UTC instant
    * Anything else raises LOUDLY ([[raise_error]]) — the r12 verdict
    * found `'T' > '9'` string comparison silently marking every
    * timestamped lastmod permanently due, and a silent wrong answer is
    * exactly what this engine's loud-on-malformed discipline exists to
    * prevent. Rendering goes through `to_utc_timestamp(·,
    * current_timezone())` so the key is UTC regardless of the session
    * timezone. */
  def lastmodKey(lm: Column): Column =
    when(lm === "", lit(""))
      .when(lm.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
        // through to_date, not string surgery: '2025-99-99' must raise
        // (ANSI cast) like its timestamped twin would, not silently
        // compare greater than every capture ts — the exact over-crawl
        // class this function exists to prevent
        concat(date_format(to_date(lm), "yyyyMMdd"), lit("000000")))
      .when(lm.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?" +
          "(Z|[+-]\\d{2}:\\d{2})$"),
        date_format(
          to_utc_timestamp(to_timestamp(
            // W3C allows minute precision; pad :00 so both engines cast
            // the same string (DuckDB rejects minute-only timestamps).
            // Fractional seconds truncate — sub-second freshness is
            // below the capture key's resolution.
            regexp_replace(lm,
              "^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2})(Z|[+-]\\d{2}:\\d{2})$",
              "$1:00$2")), current_timezone()),
          "yyyyMMddHHmmss"))
      .otherwise(raise_error(
        concat(lit("unparseable sitemap lastmod: "), lm)).cast("string"))

  /** Freshness-driven re-crawl selection — what a continuous crawl
    * does with sitemap `lastmod` against its own capture index: a URL
    * is DUE when it was never captured, or when its advertised lastmod
    * post-dates the latest stored capture. `seeds`: (loc, lastmod —
    * any W3C datetime form accepted by [[lastmodKey]], or empty) from
    * [[sitemapSeeds]]; `cdx`: (url, ts — 14-digit) from
    * [[WarcSource.cdxRows]]. The index side aggregates to max-ts per
    * url BEFORE the join, so capture multiplicity never fans the seed
    * list; one keyed join, no other shuffle. An empty lastmod means
    * the sitemap makes no freshness claim — only never-captured URLs
    * are due; an unparseable lastmod fails loudly. */
  def recrawlDue(seeds: DataFrame, cdx: DataFrame): DataFrame = {
    val latest = cdx.groupBy(col("url"))
      .agg(max(col("ts")).as("last_capture_ts"))
    seeds.select(col("loc").as("url"), col("lastmod"))
      .join(latest, Seq("url"), "left")
      .select(col("url"), col("lastmod"),
        coalesce(col("last_capture_ts"), lit("")).as("last_capture_ts"),
        (col("last_capture_ts").isNull ||
          (col("lastmod") =!= "" &&
            lastmodKey(col("lastmod")) > col("last_capture_ts"))).as("due"))
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

  /** w07's oracle: [[pageRankQ]]'s six iterations unrolled as chained
    * CTEs (DuckDB recursive CTEs allow only one self-reference per
    * recursive term; the iteration needs the previous masses twice —
    * contributions AND dangling — so fixed-count unrolling is the
    * portable form). `//` is DuckDB BIGINT floor division ≡ Spark `div`
    * on positive masses. Edges derive from the doc_id congruences
    * independently of the Spark side's HTML extraction. */
  private lazy val w07OracleSql: String =
    s"""WITH $w07OracleCtes
      SELECT node, CAST(mass AS BIGINT) AS mass FROM it6 ORDER BY node"""

  /** The CTE body alone (edges → nodes → six unrolled iterations) so
    * composed oracles (c07) can reuse the mass computation. */
  private lazy val w07OracleCtes: String = {
    val M = 1000000000000L
    val iterCtes = (1 to 6).map { k =>
      s"""  it$k AS (
        SELECT nd.node,
          (3 * $M) // (20 * nn.n) +
          (17 * (COALESCE(c.c, 0) + dt.dt)) // 20 AS mass
        FROM nodes nd
        CROSS JOIN nn
        CROSS JOIN (
          SELECT COALESCE(SUM(m.mass // nn2.n), 0) AS dt
          FROM it${k - 1} m CROSS JOIN nn nn2
          LEFT JOIN deg dg ON m.node = dg.src
          WHERE dg.src IS NULL) dt
        LEFT JOIN (
          SELECT e.dst, SUM(m.mass // dg.deg) AS c
          FROM it${k - 1} m
          JOIN deg dg ON m.node = dg.src
          JOIN e ON e.src = m.node
          GROUP BY e.dst) c ON c.dst = nd.node)"""
    }.mkString(",\n")
    s"""e AS (
        SELECT DISTINCT src, dst FROM (
          SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) || '.example.com' AS src,
                 'h' || CAST((doc_id + 1) % 19 AS VARCHAR) || '.example.com' AS dst
          FROM documents
          UNION ALL
          SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) || '.example.com' AS src,
                 'h' || CAST((doc_id * 3 + 1) % 19 AS VARCHAR) || '.example.com' AS dst
          FROM documents) z
        WHERE src <> dst),
      nodes AS (
        SELECT DISTINCT node FROM (
          SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e) u),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
      it0 AS (SELECT node, $M // nn.n AS mass FROM nodes CROSS JOIN nn),
$iterCtes"""
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
    // prioritization signal, in Q fixed-point ([[pageRankQ]]): integer
    // masses are engine-exact, so the DuckDB oracle REPLAYS all six
    // iterations verbatim (unrolled chained CTEs — the same arithmetic,
    // independently derived edges from the doc_id congruences, which
    // also cross-checks the HTML link-extraction path). The double
    // pageRank keeps its hand-computed FrontierSpec gates; the fixture
    // graph has no dangling hosts (every host links out), so the
    // dangling-mass path is gated by a constructed-graph spec.
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
      pageRankQ(edges, iters = 6)
        .orderBy(col("node"))
    }, Some(w07OracleSql)),

    // The composed crawl-budget allocator — authority × politeness in
    // one pipeline: PageRank masses over the crawled link graph decide
    // each host's fetch budget (budget = 1 + ⌊mass·19/M⌋, exact
    // integers), the RFC 9309 politeness schedule orders each host's
    // allowed URLs into delay slots, and the allocation keeps only the
    // first `budget` slots per host — how a production crawler turns
    // "which hosts matter" into "which URLs to fetch this cycle".
    // DuckDB replays BOTH legs (the six unrolled PageRank iterations +
    // the planted-effective robots/schedule outcome) and the budget
    // cut, so a mass, verdict, slot, or threshold bug breaks the hash.
    // The budget frame is host-cardinality — broadcast into the
    // schedule, no corpus-shaped exchange.
    ("c07_crawl_budget", (s: SparkSession, d: String) => {
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
      val budget = pageRankQ(edges, iters = 6)
        .select(col("node").as("host"),
          (lit(1L) + expr("(mass * 19) div 1000000000000")).as("budget"))
      val sched = schedule(
        robotsVerdicts(urlFixture(s, d), robotsFixture(s, d), "graftbot"))
      sched.join(broadcast(budget), Seq("host"))
        .filter(col("slot") < col("budget"))
        .select(col("url"), col("host"), col("slot"),
          col("fetch_offset_sec"), col("budget"))
        .orderBy(col("url"))
    },
    Some(s"""WITH $w07OracleCtes,
      u AS (
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
      allowed_urls AS (SELECT * FROM verdicts WHERE allowed),
      sched AS (
        SELECT url, host,
          CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
            AS BIGINT) AS slot,
          CAST((row_number() OVER (PARTITION BY host ORDER BY url) - 1)
            AS DOUBLE) * delay AS fetch_offset_sec
        FROM allowed_urls),
      budget AS (
        SELECT node AS host,
          1 + (CAST(mass AS BIGINT) * 19) // 1000000000000 AS budget
        FROM it6)
      SELECT s.url, s.host, s.slot, s.fetch_offset_sec, b.budget
      FROM sched s JOIN budget b ON s.host = b.host
      WHERE s.slot < b.budget
      ORDER BY s.url""")),

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

    // Freshness-driven re-crawl selection, oracle-gated over the FULL
    // W3C lastmod grammar (the r12 verdict's silent over-crawl bug:
    // timestamped lastmods string-compared as 'T' > '9' → permanently
    // due): per-doc seed URLs cycle through bare dates, full UTC
    // datetimes, minute-only +13:00-offset datetimes (a different UTC
    // day!), and a datetime landing EXACTLY on its capture timestamp
    // (the boundary case — equal is NOT due); every 6th doc makes no
    // freshness claim. The capture index covers every 3rd doc. `due`
    // must reproduce the exact UTC-normalized comparison in both
    // engines.
    ("w14_recrawl_due", (s: SparkSession, d: String) => {
      val docs = graft.Tables.documents(s, d)
      val day = lpad((col("doc_id") % 27 + 1).cast("string"), 2, "0")
      val capDay = lpad((col("doc_id") % 13 + 1).cast("string"), 2, "0")
      val seeds = docs.select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("loc"),
        when(col("doc_id") % 6 === 0, lit(""))
          .when(col("doc_id") % 4 === 0, concat(lit("2025-02-"), day))
          .when(col("doc_id") % 4 === 1,
            concat(lit("2025-02-"), day, lit("T10:30:00Z")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("2025-02-"), day, lit("T10:30+13:00")))
          .otherwise(concat(lit("2025-02-"), capDay, lit("T12:00:00Z")))
          .as("lastmod"))
      val cdx = docs.filter(col("doc_id") % 3 === 0).select(
        concat(lit("https://h"), col("doc_id") % 19,
          lit(".example.com/p"), col("doc_id")).as("url"),
        concat(lit("202502"), capDay, lit("120000")).as("ts"))
      recrawlDue(seeds, cdx).orderBy(col("url"))
    },
    Some("""WITH seeds AS (
        SELECT doc_id,
          'https://h' || (doc_id % 19) || '.example.com/p' || doc_id AS url,
          CASE WHEN doc_id % 6 = 0 THEN ''
            WHEN doc_id % 4 = 0 THEN
              '2025-02-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
            WHEN doc_id % 4 = 1 THEN
              '2025-02-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                || 'T10:30:00Z'
            WHEN doc_id % 4 = 2 THEN
              '2025-02-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                || 'T10:30+13:00'
            ELSE '2025-02-' || lpad(CAST(doc_id % 13 + 1 AS VARCHAR), 2, '0')
                || 'T12:00:00Z'
          END AS lastmod
        FROM documents),
      cdx AS (
        SELECT doc_id,
          '202502' || lpad(CAST(doc_id % 13 + 1 AS VARCHAR), 2, '0') ||
            '120000' AS ts
        FROM documents WHERE doc_id % 3 = 0),
      keyed AS (
        SELECT s.*, CASE WHEN s.lastmod = '' THEN ''
          WHEN s.lastmod LIKE '____-__-__' THEN
            replace(s.lastmod, '-', '') || '000000'
          ELSE strftime(CAST(regexp_replace(s.lastmod,
            '^([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2})(Z|[+-][0-9]{2}:[0-9]{2})$',
            '\1:00\2') AS TIMESTAMPTZ) AT TIME ZONE 'UTC', '%Y%m%d%H%M%S')
        END AS lm_key FROM seeds s)
      SELECT s.url, s.lastmod,
        COALESCE(c.ts, '') AS last_capture_ts,
        (c.ts IS NULL OR (s.lastmod <> '' AND s.lm_key > c.ts)) AS due
      FROM keyed s LEFT JOIN cdx c ON s.doc_id = c.doc_id
      ORDER BY s.url""")),

    // Two-level sitemap-index walk, oracle-gated: even hosts publish an
    // INDEX of two child sitemaps resolved through the fetch table
    // (level 1), odd hosts a direct urlset (level 0, with every 4th
    // entry claim-free) — the real sitemaps.org shape where large sites
    // shard their URL space behind one index. DuckDB regenerates every
    // (host, level, loc, lastmod) row from the plant rule, so a parse
    // bug, a lost join row, or a level mixup breaks the hash.
    // Crawler-trap screen over a planted URL mix: ids ≡ 0 mod 13 carry
    // the /a/b/a/b/a/b mirror-loop signature (segment multiplicity 3),
    // ids ≡ 0 mod 17 (and not 13) a 13-deep facet path, everyone else
    // a clean 3-segment URL. DuckDB rebuilds the urls from the same
    // congruences and recomputes split → multiplicity → verdict, so a
    // path-regex, segment-count, or threshold bug breaks the hash.
    ("w16_trap_detection", (s: SparkSession, d: String) => {
      val docs = graft.Tables.documents(s, d)
      val urls = docs.select(
        concat(lit("https://h"), col("doc_id") % 7, lit(".example.com"),
          when(col("doc_id") % 13 === 0,
            concat(lit("/a/b/a/b/a/b/p"), col("doc_id")))
          .when(col("doc_id") % 17 === 0,
            concat(lit("/d1/d2/d3/d4/d5/d6/d7/d8/d9/d10/d11/d12/p"),
              col("doc_id")))
          .otherwise(concat(lit("/cat"), col("doc_id") % 5,
            lit("/item/p"), col("doc_id")))).as("url"))
      trapSuspects(urls)
        .orderBy(col("url"))
    },
    Some("""WITH u AS (
        SELECT 'https://h' || (doc_id % 7) || '.example.com' ||
          CASE WHEN doc_id % 13 = 0 THEN '/a/b/a/b/a/b/p' || doc_id
            WHEN doc_id % 17 = 0
              THEN '/d1/d2/d3/d4/d5/d6/d7/d8/d9/d10/d11/d12/p' || doc_id
            ELSE '/cat' || (doc_id % 5) || '/item/p' || doc_id
          END AS url
        FROM documents),
      segs AS (
        SELECT url,
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS host,
          list_filter(string_split(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#?]*)', 1), '/'),
            s -> s <> '') AS segs
        FROM u),
      e AS (
        SELECT url, host, len(segs) AS depth, unnest(segs) AS seg
        FROM segs),
      mult AS (
        SELECT url, host, depth, seg, count(*) AS mult
        FROM e GROUP BY url, host, depth, seg),
      per AS (
        SELECT url, host, CAST(depth AS INTEGER) AS depth,
          CAST(max(mult) AS BIGINT) AS max_mult
        FROM mult GROUP BY url, host, depth)
      SELECT url, host, depth, max_mult,
        (max_mult >= 3 OR depth >= 12) AS suspect
      FROM per ORDER BY url""")),

    ("w15_sitemap_walk", (s: SparkSession, d: String) => {
      def dd(c: Column): Column = lpad(c.cast("string"), 2, "0")
      val hosts = s.range(19).select(col("id").as("k"),
        concat(lit("h"), col("id"), lit(".example.com")).as("host"))
      def oddEntry(i: Int): Column = {
        val lm = when((col("k") + lit(i)) % 4 === 0, lit(""))
          .otherwise(concat(lit("2025-03-"), dd((col("k") + lit(i)) % 28 + 1)))
        concat(lit("<url><loc>https://"), col("host"), lit(s"/p$i</loc>"),
          when(lm === "", lit(""))
            .otherwise(concat(lit("<lastmod>"), lm, lit("</lastmod>"))),
          lit("</url>"))
      }
      val topXml = when(col("k") % 2 === 0,
          concat(lit("<?xml version=\"1.0\"?><sitemapindex>"),
            lit("<sitemap><loc>https://"), col("host"),
            lit("/sm-0.xml</loc></sitemap>"),
            lit("<sitemap><loc>https://"), col("host"),
            lit("/sm-1.xml</loc></sitemap>"),
            lit("</sitemapindex>")))
        .otherwise(concat(lit("<?xml version=\"1.0\"?><urlset>"),
          oddEntry(0), oddEntry(1), oddEntry(2), lit("</urlset>")))
      val sitemaps = hosts.select(col("host"), topXml.as("sitemap_xml"))
      def childEntry(j: Column, i: Int): Column =
        concat(lit("<url><loc>https://"), col("host"), lit("/i"), j,
          lit(s"p$i</loc><lastmod>2025-03-"),
          dd((col("k") + j + lit(i)) % 28 + 1),
          lit("</lastmod></url>"))
      val children = hosts.filter(col("k") % 2 === 0)
        .crossJoin(s.range(2).select(col("id").as("j")))
        .select(
          concat(lit("https://"), col("host"), lit("/sm-"), col("j"),
            lit(".xml")).as("sitemap_url"),
          concat(lit("<?xml version=\"1.0\"?><urlset>"),
            childEntry(col("j"), 0), childEntry(col("j"), 1),
            lit("</urlset>")).as("sitemap_xml"))
      sitemapWalk(sitemaps, children).orderBy(col("loc"))
    },
    Some("""WITH ks AS (SELECT CAST(unnest(range(0, 19)) AS BIGINT) AS k),
      odd AS (
        SELECT 'h' || k || '.example.com' AS host, CAST(0 AS INTEGER) AS level,
          'https://h' || k || '.example.com/p' || i AS loc,
          CASE WHEN (k + i) % 4 = 0 THEN ''
            ELSE '2025-03-' || lpad(CAST((k + i) % 28 + 1 AS VARCHAR), 2, '0')
          END AS lastmod
        FROM ks, (SELECT CAST(unnest(range(0, 3)) AS BIGINT) AS i) i_
        WHERE k % 2 = 1),
      ev AS (
        SELECT 'h' || k || '.example.com' AS host, CAST(1 AS INTEGER) AS level,
          'https://h' || k || '.example.com/i' || j || 'p' || i AS loc,
          '2025-03-' || lpad(CAST((k + j + i) % 28 + 1 AS VARCHAR), 2, '0')
            AS lastmod
        FROM ks, (SELECT CAST(unnest(range(0, 2)) AS BIGINT) AS j) j_,
          (SELECT CAST(unnest(range(0, 2)) AS BIGINT) AS i) i_
        WHERE k % 2 = 0)
      SELECT host, level, loc, lastmod FROM odd
      UNION ALL SELECT host, level, loc, lastmod FROM ev
      ORDER BY loc""")),

    // The composed CONTINUOUS-RE-CRAWL scheduler in one oracle-gated
    // query (r12 verdict item 7) — the chain a real freshness loop
    // runs: robots `Sitemap:` directives (real RFC 9309 grammar, mixed
    // case/position, commented-out directive dropped) → sitemap
    // fetch+parse (real [[graft.kernel.Sitemap]] over planted XML
    // cycling every W3C lastmod form, incl. minute-only +13:00 offsets
    // and a value landing EXACTLY on its capture ts) → freshness
    // selection against the capture index ([[recrawlDue]],
    // UTC-normalized) → admission screen of the due batch against the
    // SAME index ([[WarcSource.cdxDedup]]: re-fetches url_dup, mirrored
    // bodies content_dup, the rest novel). A bug in any stage breaks
    // the hash — THIS composition would have caught the r12 lastmod
    // string-compare bug at pipeline level.
    ("c04_recrawl_pipeline", (s: SparkSession, d: String) => {
      val robots = s.range(19).select(
        concat(lit("h"), col("id"), lit(".example.com")).as("host"),
        concat(
          lit("Sitemap: https://h"), col("id"), lit(".example.com/sm-0.xml\n"),
          lit("# Sitemap: https://ignored.example.com/no.xml\n"),
          lit("User-agent: *\nDisallow: /tmp\n"),
          when(col("id") % 2 === 0,
            concat(lit("sItEmAp: https://h"), col("id"),
              lit(".example.com/sm-1.xml\n"))).otherwise(lit("")))
          .as("robots_txt"))
      val directives = robotsSitemaps(robots)
      val k = regexp_extract(col("host"), "^h(\\d+)", 1).cast("long")
      val j = regexp_extract(col("sitemap_url"), "sm-(\\d+)\\.xml$", 1)
        .cast("long")
      def dd(c: Column): Column = lpad(c.cast("string"), 2, "0")
      def lmOf(i: Int): Column = {
        val f = (k + lit(i) + j * 2) % 5
        val dlm = dd((k + lit(i) * 7 + j) % 27 + 1)
        val dcap = dd((k + lit(i) * 5 + j * 3) % 13 + 1)
        when(f === 0, lit(""))
          .when(f === 1, concat(lit("2025-02-"), dlm))
          .when(f === 2, concat(lit("2025-02-"), dlm, lit("T10:30:00Z")))
          .when(f === 3, concat(lit("2025-02-"), dlm, lit("T10:30+13:00")))
          .otherwise(concat(lit("2025-02-"), dcap, lit("T12:00:00Z")))
      }
      def entry(i: Int): Column = {
        val loc = concat(lit("https://h"), k, lit(".example.com/s"), j,
          lit("p"), lit(i))
        concat(lit("<url><loc>"), loc, lit("</loc>"),
          when(lmOf(i) === "", lit(""))
            .otherwise(concat(lit("<lastmod>"), lmOf(i), lit("</lastmod>"))),
          lit("</url>"))
      }
      val sitemaps = directives.select(col("host"),
        concat(
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          entry(0), entry(1), entry(2), lit("</urlset>")).as("sitemap_xml"))
      val seeds = sitemapSeeds(sitemaps)
      val caps = s.range(19).select(col("id").as("k"))
        .crossJoin(s.range(2).select(col("id").as("j")))
        .crossJoin(s.range(3).select(col("id").as("i")))
        .filter(col("j") === 0 || col("k") % 2 === 0)
        .filter((col("k") + col("i") + col("j")) % 3 === 0)
        .select(
          concat(lit("https://h"), col("k"), lit(".example.com/s"),
            col("j"), lit("p"), col("i")).as("url"),
          concat(lit("202502"),
            dd((col("k") + col("i") * 5 + col("j") * 3) % 13 + 1),
            lit("120000")).as("ts"),
          concat(lit("d"),
            (col("k") * 31 + col("j") * 7 + col("i")) % 97).as("digest"))
      val due = recrawlDue(seeds, caps.select(col("url"), col("ts")))
      val bk = regexp_extract(col("url"), "^https://h(\\d+)", 1).cast("long")
      val bj = regexp_extract(col("url"), "/s(\\d+)p", 1).cast("long")
      val bi = regexp_extract(col("url"), "p(\\d+)$", 1).cast("long")
      // the re-fetched body carries the SAME planted digest (content
      // unchanged): a due re-fetch screens url_dup; a never-captured
      // URL is novel unless its body mirrors a stored digest
      val batch = due.filter(col("due")).select(
        col("url").as("urlkey"), col("url"),
        concat(lit("d"), (bk * 31 + bj * 7 + bi) % 97).as("digest"))
      val verd = WarcSource.cdxDedup(batch,
        caps.select(col("url").as("urlkey"), col("digest")))
      due.join(verd.select(col("urlkey").as("url"), col("verdict")),
          Seq("url"), "left")
        .select(col("url"), col("lastmod"), col("last_capture_ts"),
          col("due"), coalesce(col("verdict"), lit("")).as("verdict"))
        .orderBy(col("url"))
    },
    Some("""WITH ks AS (SELECT CAST(unnest(range(0, 19)) AS BIGINT) AS k),
      js AS (
        SELECT k, CAST(unnest(range(0,
          CASE WHEN k % 2 = 0 THEN 2 ELSE 1 END)) AS BIGINT) AS j
        FROM ks),
      seeds AS (
        SELECT k, j, i,
          'https://h' || k || '.example.com/s' || j || 'p' || i AS url,
          CASE (k + i + j * 2) % 5
            WHEN 0 THEN ''
            WHEN 1 THEN '2025-02-' ||
              lpad(CAST((k + i * 7 + j) % 27 + 1 AS VARCHAR), 2, '0')
            WHEN 2 THEN '2025-02-' ||
              lpad(CAST((k + i * 7 + j) % 27 + 1 AS VARCHAR), 2, '0')
              || 'T10:30:00Z'
            WHEN 3 THEN '2025-02-' ||
              lpad(CAST((k + i * 7 + j) % 27 + 1 AS VARCHAR), 2, '0')
              || 'T10:30+13:00'
            ELSE '2025-02-' ||
              lpad(CAST((k + i * 5 + j * 3) % 13 + 1 AS VARCHAR), 2, '0')
              || 'T12:00:00Z'
          END AS lastmod
        FROM js, (SELECT CAST(unnest(range(0, 3)) AS BIGINT) AS i) is_),
      caps AS (
        SELECT 'https://h' || k || '.example.com/s' || j || 'p' || i AS url,
          '202502' ||
            lpad(CAST((k + i * 5 + j * 3) % 13 + 1 AS VARCHAR), 2, '0') ||
            '120000' AS ts,
          'd' || CAST((k * 31 + j * 7 + i) % 97 AS VARCHAR) AS digest
        FROM js, (SELECT CAST(unnest(range(0, 3)) AS BIGINT) AS i) is_
        WHERE (k + i + j) % 3 = 0),
      keyed AS (
        SELECT s.*, CASE WHEN s.lastmod = '' THEN ''
          WHEN s.lastmod LIKE '____-__-__' THEN
            replace(s.lastmod, '-', '') || '000000'
          ELSE strftime(CAST(regexp_replace(s.lastmod,
            '^([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2})(Z|[+-][0-9]{2}:[0-9]{2})$',
            '\1:00\2') AS TIMESTAMPTZ) AT TIME ZONE 'UTC', '%Y%m%d%H%M%S')
        END AS lm_key FROM seeds s),
      due_t AS (
        SELECT s.url, s.lastmod, COALESCE(c.ts, '') AS last_capture_ts,
          (c.ts IS NULL OR (s.lastmod <> '' AND s.lm_key > c.ts)) AS due,
          s.k, s.j, s.i
        FROM keyed s LEFT JOIN caps c ON s.url = c.url),
      batch AS (
        SELECT url,
          'd' || CAST((k * 31 + j * 7 + i) % 97 AS VARCHAR) AS digest
        FROM due_t WHERE due),
      verd AS (
        SELECT b.url,
          CASE WHEN b.url IN (SELECT url FROM caps) THEN 'url_dup'
            WHEN b.digest IN (SELECT digest FROM caps) THEN 'content_dup'
            ELSE 'novel' END AS verdict
        FROM batch b)
      SELECT d.url, d.lastmod, d.last_capture_ts, d.due,
        COALESCE(v.verdict, '') AS verdict
      FROM due_t d LEFT JOIN verd v ON d.url = v.url
      ORDER BY d.url"""))
  )
}
