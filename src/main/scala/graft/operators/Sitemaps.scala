package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap XML parsing (sitemaps.org protocol) — the frontier-seeding
  * step after [[Robots.sitemaps]] surfaces `Sitemap:` URLs: fetched
  * sitemap bodies parse into candidate URLs (+ lastmod/changefreq/
  * priority hints a recrawl scheduler wants), and index files parse
  * into child sitemap locations. Together with [[Robots.admit]] and
  * [[Robots.crawlDelays]] this closes the crawl-front loop:
  * robots → sitemaps → seeds → admission → politeness schedule.
  *
  * Everything is a pure `Column` composition (regexp over the protocol's
  * constrained grammar — a sitemap is machine-generated XML with a fixed
  * element set, not arbitrary markup, so a scanner-grade parser is not
  * needed): zero UDFs, fully codegen'd, narrow (no shuffle — explode
  * fan-out is bounded by the spec's 50k URLs per sitemap file). The five
  * predefined XML entities are decoded (the protocol REQUIRES entity-
  * escaped URLs); numeric character references are out of scope and
  * survive as-is. Malformed entries (no `<loc>`) drop. Inputs are
  * DECODED XML strings — the protocol also ships `.xml.gz` sitemaps,
  * and decompression belongs to the fetch layer (the WARC path already
  * yields decoded bodies; for raw files run bytes through a gzip
  * column upstream).
  */
object Sitemaps {

  /** True when the document is a sitemap INDEX (children are sitemaps,
    * not page URLs).
    */
  def isIndex(xml: Column): Column =
    xml.rlike("(?s)<\\s*sitemapindex[\\s>]")

  /** Child sitemap locations of an index document, entity-decoded —
    * an array Column (empty for non-index documents).
    */
  def sitemapLocs(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml, lit("(?s)<sitemap[\\s>].*?</sitemap>"), lit(0)),
        b => xmlUnescape(regexp_extract(b, "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))),
      l => l =!= "")

  /** One row per `<url>` entry across all sitemap documents in `df`:
    * keeps every input column except `xmlCol`, adds `loc` (required —
    * entries without one drop), `lastmod`, `changefreq` (nullable
    * strings) and `priority` (nullable double; junk → null).
    */
  def urls(df: DataFrame, xmlCol: String = "xml"): DataFrame = {
    def field(name: String): Column =
      nullif(regexp_extract(col("__entry"),
        s"(?s)<$name>\\s*(.*?)\\s*</$name>", 1), lit(""))
    df
      .withColumn("__entry", explode(
        regexp_extract_all(col(xmlCol), lit("(?s)<url[\\s>].*?</url>"), lit(0))))
      .withColumn("loc", xmlUnescape(field("loc")))
      .where(col("loc").isNotNull)
      .withColumn("lastmod", field("lastmod"))
      .withColumn("changefreq", field("changefreq"))
      .withColumn("priority", field("priority").try_cast("double"))
      .drop(xmlCol, "__entry")
  }

  /** Decode the five predefined XML entities; `&amp;` LAST so escaped
    * ampersands of other entities don't double-decode.
    */
  private def xmlUnescape(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }
  }
}
