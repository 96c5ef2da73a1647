package graft.kernel

/** Sitemap protocol (sitemaps.org XML) — the crawl frontier's seed
  * source next to robots.txt's `Sitemap:` lines. The grammar is flat
  * (a `<urlset>` of `<url>` entries or a `<sitemapindex>` of
  * `<sitemap>` entries, each with `<loc>` and optional `<lastmod>`),
  * so this is a direct scan, not an XML library: find the root, walk
  * the entry blocks, extract the two fields, decode the five XML
  * entities `<loc>` values must escape. Malformed documents fail
  * loudly with a reason — a frontier built on silently-dropped seeds
  * is a coverage hole nobody notices. */
object Sitemap {

  final case class Entry(loc: String, lastmod: String) // lastmod "" if absent

  /** kind: "urlset" (leaf sitemap) or "sitemapindex" (index of
    * sitemaps). */
  final case class Doc(kind: String, entries: Seq[Entry])

  def parse(xml: String): Doc = {
    val (kind, entryTag) =
      if (hasRoot(xml, "urlset")) ("urlset", "url")
      else if (hasRoot(xml, "sitemapindex")) ("sitemapindex", "sitemap")
      else throw new IllegalArgumentException(
        "sitemap: neither <urlset> nor <sitemapindex> root")
    val entries = Seq.newBuilder[Entry]
    var from = 0
    while ({
      val open = indexOfTag(xml, entryTag, from)
      if (open < 0) false
      else {
        val close = xml.indexOf(s"</$entryTag>", open)
        require(close > 0, s"sitemap: unterminated <$entryTag> at $open")
        val block = xml.substring(open, close)
        val loc = tagText(block, "loc").getOrElse(
          throw new IllegalArgumentException(
            s"sitemap: <$entryTag> without <loc> at $open"))
        entries += Entry(decodeEntities(loc.trim),
          tagText(block, "lastmod").map(_.trim).getOrElse(""))
        from = close + entryTag.length + 3
        true
      }
    }) ()
    Doc(kind, entries.result())
  }

  private def hasRoot(xml: String, tag: String): Boolean =
    indexOfTag(xml, tag, 0) >= 0

  /** Index just past `<tag`+delimiter (attributes tolerated), or -1. */
  private[kernel] def indexOfTag(xml: String, tag: String, from: Int): Int = {
    var i = from
    while (true) {
      val at = xml.indexOf(s"<$tag", i)
      if (at < 0) return -1
      val after = at + tag.length + 1
      if (after < xml.length &&
          (xml.charAt(after) == '>' || Character.isWhitespace(xml.charAt(after)))) {
        val gt = xml.indexOf('>', after)
        if (gt < 0) return -1
        return gt + 1
      }
      i = at + 1 // matched a longer tag name (e.g. <urlset vs <url)
    }
    -1
  }

  private[kernel] def tagText(block: String, tag: String): Option[String] = {
    val open = indexOfTag(block, tag, 0)
    if (open < 0) None
    else {
      val close = block.indexOf(s"</$tag>", open)
      require(close >= 0, s"sitemap: unterminated <$tag>")
      Some(block.substring(open, close))
    }
  }

  private[kernel] def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&") // &amp; LAST (t27's lesson)
}
