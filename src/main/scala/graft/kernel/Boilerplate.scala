package graft.kernel

/** Main-content extraction — Boilerpipe-style shallow text features
  * (Kohlschütter, Fankhauser & Nejdl, "Boilerplate Detection using
  * Shallow Text Features", WSDM 2010): segment the page into text
  * blocks at block-level tags, measure each block's word count and
  * link density (words inside `<a>` / words), and classify with the
  * published NumWordsRules decision list over (previous, current,
  * next). This is the step between tag-stripping (`Curate.htmlToText`
  * — keeps nav menus and footers) and a trained extractor: the classic
  * deterministic boilerplate cut real curation pipelines ran for a
  * decade.
  *
  * All features and thresholds are INTEGER arithmetic (link-density
  * comparisons as exact rationals: `density > 1/3` ⇔ `3·aw > w`,
  * `density ≤ 5/9` ⇔ `9·aw ≤ 5·w` — 5/9 standing in for the
  * published 0.555556 cutoff), so classification is engine-exact and
  * oracle-checkable. Pure per-document function → a zero-shuffle map
  * stage at any scale.
  */
object Boilerplate {

  /** One text block: normalized text, word count, words inside
    * anchors. */
  final case class Block(text: String, words: Int, anchorWords: Int)

  private val BlockTags = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr",
    "td", "th", "table", "ul", "ol", "article", "section", "header",
    "footer", "nav", "aside", "blockquote", "pre", "form", "body",
    "html", "main", "figure", "figcaption")

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&") // LAST (t27's lesson)

  /** Segment cleaned HTML into nonempty text blocks in document
    * order. */
  def blocks(html: String): Vector[Block] = {
    val cleaned = html
      .replaceAll("(?is)<script[^>]*>.*?</script>", " ")
      .replaceAll("(?is)<style[^>]*>.*?</style>", " ")
      .replaceAll("(?s)<!--.*?-->", " ")
    val out = Vector.newBuilder[Block]
    val sb = new StringBuilder
    var words = 0
    var anchorWords = 0
    var inAnchor = false
    def text(run: String): Unit = {
      val toks = decodeEntities(run).split("\\s+").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        toks.foreach { t =>
          if (sb.nonEmpty) sb.append(' ')
          sb.append(t)
        }
        words += toks.length
        if (inAnchor) anchorWords += toks.length
      }
    }
    def flush(): Unit = {
      if (words > 0) out += Block(sb.toString, words, anchorWords)
      sb.clear(); words = 0; anchorWords = 0
    }
    var i = 0
    val n = cleaned.length
    while (i < n) {
      val lt = cleaned.indexOf('<', i)
      if (lt < 0) { text(cleaned.substring(i)); i = n }
      else {
        if (lt > i) text(cleaned.substring(i, lt))
        val gt = cleaned.indexOf('>', lt)
        if (gt < 0) i = n // dangling '<' at EOF: drop the fragment
        else {
          val inner = cleaned.substring(lt + 1, gt)
          val closing = inner.startsWith("/")
          val name = inner.dropWhile(_ == '/')
            .takeWhile(c => Character.isLetterOrDigit(c)).toLowerCase
          if (BlockTags.contains(name)) flush()
          else if (name == "a") inAnchor = !closing
          i = gt + 1
        }
      }
    }
    flush()
    out.result()
  }

  /** The NumWordsRules decision list (WSDM 2010 §4, the classifier
    * Boilerpipe ships as DefaultExtractor's core): link-dense blocks
    * are boilerplate; otherwise the verdict depends on the word counts
    * of the current/previous/next blocks, with a stricter branch when
    * the PREVIOUS block was link-dense (a block after a nav bar needs
    * more evidence). Missing neighbors count 0 words, density 0. */
  def contentFlags(bs: Vector[Block]): Vector[Boolean] =
    bs.indices.map { i =>
      val c = bs(i)
      val prevW = if (i > 0) bs(i - 1).words else 0
      val prevA = if (i > 0) bs(i - 1).anchorWords else 0
      val nextW = if (i + 1 < bs.size) bs(i + 1).words else 0
      if (c.anchorWords * 3 > c.words) false
      else if (prevA * 9 <= prevW * 5)
        c.words > 16 || nextW > 15 || prevW > 4
      else
        c.words > 40 || nextW > 17
    }.toVector

  /** (main text — content blocks joined by '\n', total blocks, content
    * blocks). */
  def mainContent(html: String): (String, Int, Int) = {
    val bs = blocks(html)
    val flags = contentFlags(bs)
    val text = bs.indices.collect { case i if flags(i) => bs(i).text }
      .mkString("\n")
    (text, bs.size, flags.count(identity))
  }
}
