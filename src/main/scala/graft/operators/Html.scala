package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.api.Stage

/** HTML → text extraction — the step between [[graft.sources.WarcShards]]
  * and the text-curation operator families (t-, d-, x-): tag stripping,
  * block-level boilerplate removal (the jusText/Boilerpipe link-density
  * heuristic: navigation, footers and link farms are short blocks whose
  * characters live inside anchors; article prose is long and link-poor —
  * cf. Kohlschütter et al. 2010, "Boilerplate detection using shallow
  * text features"), title and out-link extraction (out-links feed the
  * web-graph operators: [[Graph.bfsHops]] crawl-scope gates,
  * [[Graph.pageRank]]).
  *
  * This is a single-pass scanner over untrusted markup, not a DOM: no
  * recursion (crafted nesting cannot blow the stack), every loop advances
  * a cursor monotonically (crafted input cannot hang it), unterminated
  * constructs (comments, scripts, quotes) consume to end-of-input rather
  * than erroring — a crawl corpus WILL contain every malformation, and
  * per the [[graft.sources.WarcShards.responses]] contract malformed
  * input is data, never an exception. Imperative string work is the
  * documented UDF exception (the zlib/Datasketches precedent) — there is
  * no expressible `functions._` form; the scanner allocates only the
  * output buffers.
  *
  * Determinism: pure functions of the input string — layout- and
  * engine-independent, safe under Spark task retries anywhere in a plan.
  */
object Html {

  /** Block-level elements: entering OR leaving one ends the current text
    * block (the segmentation [[mainText]] scores on; [[stripTags]] joins
    * all blocks). The set follows the HTML living standard's
    * flow-content sectioning/grouping elements plus `br`/`hr`/`tr`.
    */
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "tr", "td", "th", "table", "thead", "tbody", "tfoot", "caption",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "section", "article", "aside", "header", "footer", "nav", "form",
    "fieldset", "figure", "figcaption", "main", "address", "center",
    "body", "html", "head", "title", "option", "select", "textarea")

  /** Raw-text elements whose content is never document text. */
  private val SkipContent: Set[String] = Set("script", "style", "noscript", "template")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "deg" -> "°", "middot" -> "·",
    "bull" -> "•", "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "shy" -> "")

  /** One segmented text block: normalized text + how many of its
    * characters came from inside `<a>` (whitespace excluded from both
    * counts so padding can't dilute link density).
    */
  final case class Block(text: String, chars: Int, linkChars: Int) {
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
  }

  /** Scan result: blocks in document order, title, out-links. */
  final case class Parsed(blocks: Vector[Block], title: Option[String], links: Vector[String])

  /** ALL text with tags stripped, entity-decoded, whitespace-normalized,
    * blocks joined by single newlines — the "every visible character"
    * form (token counting, exact dedup keys).
    */
  def stripTags(html: String): String =
    parse(html).blocks.map(_.text).mkString("\n")

  /** Boilerplate-removed text: keep blocks with ≥ `minChars` non-space
    * characters AND link density ≤ `maxLinkDensity` (defaults follow the
    * jusText length-/link-density gates). Navigation bars ("Home |
    * About | Contact") die on density, footers and button labels on
    * length; prose paragraphs pass both.
    */
  def mainText(html: String, minChars: Int = 25, maxLinkDensity: Double = 0.33): String = {
    require(minChars >= 0, "minChars must be >= 0")
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0, "maxLinkDensity must be in [0, 1]")
    parse(html).blocks
      .filter(b => b.chars >= minChars && b.linkDensity <= maxLinkDensity)
      .map(_.text).mkString("\n")
  }

  /** `<title>` content (entity-decoded, whitespace-normalized); None when
    * absent or blank.
    */
  def title(html: String): Option[String] = parse(html).title

  /** `href` values of `<a>` tags, document order, duplicates kept (the
    * caller's distinct() is a one-liner; the multiplicity is signal for
    * link-density work). Values are returned RAW — resolution against a
    * base URL is the caller's, javascript:/#fragment filtering included.
    */
  def links(html: String): Vector[String] = parse(html).links

  // ---- Spark column wrappers ----

  private val stripTagsUdf = udf((s: String) => Option(s).map(stripTags))
  private val titleUdf = udf((s: String) => Option(s).flatMap(title))
  private val linksUdf = udf((s: String) => Option(s).map(links).getOrElse(Vector.empty))

  /** [[stripTags]] as a column (null in → null out). */
  def htmlText(c: Column): Column = stripTagsUdf(c)

  /** [[mainText]] as a column (null in → null out). */
  def htmlMainText(c: Column, minChars: Int = 25, maxLinkDensity: Double = 0.33): Column = {
    val f = udf((s: String) => Option(s).map(mainText(_, minChars, maxLinkDensity)))
    f(c)
  }

  /** [[title]] as a column (null/absent → null). */
  def htmlTitle(c: Column): Column = titleUdf(c)

  /** [[links]] as an array column (null in → empty array). */
  def htmlLinks(c: Column): Column = linksUdf(c)

  // ---- pipeline stage ----

  final case class Page(url: String, html: String)
  final case class PageText(url: String, title: String, text: String, n_links: Long)

  /** The WARC→curation front as a pipeline stage: boilerplate-removed
    * text + title + out-link count per page.
    */
  final class ExtractStage(minChars: Int = 25, maxLinkDensity: Double = 0.33,
      override val batchSize: Int = 64) extends Stage[Page, PageText] {
    override def process(batch: Seq[Page]): Seq[PageText] =
      batch.map { p =>
        val parsed = parse(p.html)
        val kept = parsed.blocks
          .filter(b => b.chars >= minChars && b.linkDensity <= maxLinkDensity)
        PageText(p.url, parsed.title.getOrElse(""),
          kept.map(_.text).mkString("\n"), parsed.links.length.toLong)
      }
  }

  // ---- scanner ----

  /** Single forward pass; see the object doc for the robustness rules. */
  def parse(html: String): Parsed = {
    val n = html.length
    val blocks = Vector.newBuilder[Block]
    val links = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var curChars = 0
    var curLink = 0
    val titleBuf = new java.lang.StringBuilder
    var anchorDepth = 0
    var inTitle = false
    var pendingSpace = false
    var i = 0

    def flushBlock(): Unit = {
      if (cur.length > 0) {
        blocks += Block(cur.toString, curChars, curLink)
        cur.setLength(0); curChars = 0; curLink = 0
      }
      pendingSpace = false
    }
    def emit(s: String): Unit = {
      var k = 0
      while (k < s.length) {
        val ch = s.charAt(k)
        if (Character.isWhitespace(ch)) {
          if (inTitle) { if (titleBuf.length > 0) pendingSpace = true }
          else if (cur.length > 0) pendingSpace = true
        } else if (inTitle) {
          if (pendingSpace) { titleBuf.append(' '); pendingSpace = false }
          titleBuf.append(ch)
        } else {
          if (pendingSpace) { cur.append(' '); pendingSpace = false }
          cur.append(ch)
          curChars += 1
          if (anchorDepth > 0) curLink += 1
        }
        k += 1
      }
    }
    // decode one entity starting at `from` (the '&'); returns chars consumed
    def entity(from: Int): Int = {
      var j = from + 1
      val stop = math.min(n, from + 12)
      while (j < stop && html.charAt(j) != ';' && html.charAt(j) != '&' &&
        !Character.isWhitespace(html.charAt(j))) j += 1
      if (j >= n || html.charAt(j) != ';') { emit("&"); return 1 }
      val name = html.substring(from + 1, j)
      val decoded: Option[String] =
        if (name.startsWith("#x") || name.startsWith("#X"))
          try Some(new String(Character.toChars(Integer.parseInt(name.substring(2), 16))))
          catch { case _: RuntimeException => None }
        else if (name.startsWith("#"))
          try Some(new String(Character.toChars(Integer.parseInt(name.substring(1)))))
          catch { case _: RuntimeException => None }
        else Entities.get(name)
      decoded match {
        case Some(s) => emit(s); j - from + 1
        case None => emit("&"); 1
      }
    }
    // scan a tag's attributes from `from` (after the name) to the closing
    // '>' respecting quotes; returns (end index after '>', href value)
    def attrs(from: Int, wantHref: Boolean): (Int, String) = {
      var j = from
      var href: String = null
      while (j < n && html.charAt(j) != '>') {
        val c = html.charAt(j)
        if (c == '"' || c == '\'') {
          val q = c
          val vs = j + 1
          j += 1
          while (j < n && html.charAt(j) != q) j += 1
          if (wantHref && href == null && isHrefBefore(vs - 1)) {
            href = html.substring(vs, math.min(j, n))
          }
          if (j < n) j += 1 // closing quote
        } else j += 1
      }
      (if (j < n) j + 1 else n, href)
    }
    // was the token immediately before position `qpos` (a quote) `href=`?
    def isHrefBefore(qpos: Int): Boolean = {
      var j = qpos - 1
      while (j >= 0 && Character.isWhitespace(html.charAt(j))) j -= 1
      if (j < 0 || html.charAt(j) != '=') return false
      j -= 1
      while (j >= 0 && Character.isWhitespace(html.charAt(j))) j -= 1
      val e = j + 1
      var s = e
      while (s > 0 && Character.isLetter(html.charAt(s - 1))) s -= 1
      html.substring(s, e).equalsIgnoreCase("href")
    }
    def skipUntil(close: String, from: Int): Int = {
      val idx = indexOfIgnoreCase(html, close, from)
      if (idx < 0) n
      else {
        // consume through that tag's '>'
        var j = idx + close.length
        while (j < n && html.charAt(j) != '>') j += 1
        if (j < n) j + 1 else n
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '&') {
        i += entity(i)
      } else if (c != '<') {
        emit(String.valueOf(c))
        i += 1
      } else if (i + 3 < n && html.charAt(i + 1) == '!' &&
          html.charAt(i + 2) == '-' && html.charAt(i + 3) == '-') {
        val close = html.indexOf("-->", i + 4)
        i = if (close < 0) n else close + 3
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        // doctype / processing instruction: to the next '>'
        val close = html.indexOf('>', i + 1)
        i = if (close < 0) n else close + 1
      } else if (i + 1 < n &&
          (Character.isLetter(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
        val closing = html.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
        val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        if (name.isEmpty) { emit("<"); i += 1 }
        else {
          val (after, href) = attrs(j, wantHref = !closing && name == "a")
          if (!closing && SkipContent.contains(name)) {
            i = skipUntil("</" + name, after)
          } else {
            if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else {
                if (href != null) links += href
                anchorDepth += 1
              }
            }
            if (name == "title") {
              if (closing) inTitle = false
              else { inTitle = true; pendingSpace = false }
            }
            if (BlockTags.contains(name)) flushBlock()
            i = after
          }
        }
      } else {
        // bare '<' that opens no tag: literal text
        emit("<")
        i += 1
      }
    }
    flushBlock()
    val t = titleBuf.toString.trim
    Parsed(blocks.result(), if (t.isEmpty) None else Some(t), links.result())
  }

  private def indexOfIgnoreCase(s: String, sub: String, from: Int): Int = {
    val max = s.length - sub.length
    var i = math.max(0, from)
    while (i <= max) {
      if (s.regionMatches(true, i, sub, 0, sub.length)) return i
      i += 1
    }
    -1
  }
}
