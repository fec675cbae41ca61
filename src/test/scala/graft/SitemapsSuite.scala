package graft

import org.apache.spark.sql.functions._

import graft.operators.{Robots, Sitemaps, Url}

/** Sitemap XML parsing (sitemaps.org) and the composed frontier chain:
  * robots `Sitemap:` line → fetched sitemap body → seed URLs →
  * robots admission.
  */
class SitemapsSuite extends SparkSpec {
  import spark.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://a.test/page?x=1&amp;y=2</loc>
      |    <lastmod>2026-01-05</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc> https://a.test/bare </loc></url>
      |  <url><lastmod>2026-01-01</lastmod></url>
      |  <url><loc>https://a.test/junk</loc><priority>soon</priority></url>
      |</urlset>
      |""".stripMargin

  private val index =
    """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sitemap><loc>https://a.test/sitemap-1.xml</loc></sitemap>
      |  <sitemap><loc>https://a.test/s?a=1&amp;b=2</loc><lastmod>2026-02-01</lastmod></sitemap>
      |  <sitemap></sitemap>
      |</sitemapindex>""".stripMargin

  test("urls: entity decode, optional fields, loc-less entries drop, junk priority") {
    val got = Sitemaps.urls(Seq(("a.test", urlset)).toDF("host", "xml"))
      .select("host", "loc", "lastmod", "changefreq", "priority")
      .collect().map(r => (r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)), Option(r.get(4))))
      .toSet
    assert(got == Set(
      ("https://a.test/page?x=1&y=2", Some("2026-01-05"), Some("daily"), Some(0.8)),
      ("https://a.test/bare", None, None, None),
      ("https://a.test/junk", None, None, None)))
  }

  test("index detection and child sitemap locations") {
    val df = Seq(("i", index), ("u", urlset)).toDF("id", "xml")
      .withColumn("is_index", Sitemaps.isIndex(col("xml")))
      .withColumn("children", Sitemaps.sitemapLocs(col("xml")))
    val m = df.select("id", "is_index", "children")
      .as[(String, Boolean, Seq[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(m("i")._1 && m("i")._2 == Seq(
      "https://a.test/sitemap-1.xml", "https://a.test/s?a=1&b=2"))
    assert(!m("u")._1 && m("u")._2.isEmpty)
  }

  test("zero UDFs: the parse stays inside codegen") {
    val plan = Sitemaps.urls(Seq(("a.test", urlset)).toDF("host", "xml"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), "sitemap parse must be zero-UDF")
  }

  test("gunzip column: .xml.gz sitemap decodes, multi-member ok, bomb guard throws") {
    import graft.operators.TextAnalysis
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close(); bo.toByteArray
    }
    // a gzipped sitemap decodes and parses end-to-end
    val df = Seq(("a.test", gz(urlset))).toDF("host", "gz")
      .withColumn("xml", TextAnalysis.gunzipText(col("gz"))).drop("gz")
    assert(Sitemaps.urls(df).count() == 3)
    // concatenated members decode fully
    val two = Seq(Tuple1(gz("hello ") ++ gz("world"))).toDF("gz")
      .select(TextAnalysis.gunzipText(col("gz")).as("t")).as[String].head()
    assert(two == "hello world")
    // bomb guard: 1 MB of zeros against a 1000-byte cap fails loud
    val bomb = gz(new String(new Array[Char](1 << 20)))
    val e = intercept[Exception](
      Seq(Tuple1(bomb)).toDF("gz")
        .select(TextAnalysis.gunzip(col("gz"), maxBytes = 1000)).collect())
    assert(e.getMessage.contains("bomb") || e.getCause != null)
    // malformed UTF-8 inside the gzipped payload decodes to U+FFFD data
    // (a binary->string cast would pass the invalid bytes through)
    val badBytes = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write("ok".getBytes("UTF-8")); g.write(Array(0xC3.toByte)) // dangling lead byte
      g.close(); bo.toByteArray
    }
    val dec = Seq(Tuple1(badBytes)).toDF("gz")
      .select(TextAnalysis.gunzipText(col("gz")).as("t")).as[String].head()
    assert(dec == "ok�", dec.map(_.toInt).mkString(","))
  }

  test("frontier chain: robots Sitemap line -> fetched body -> admitted seeds") {
    val robotsBody =
      "User-agent: *\nDisallow: /private/\nSitemap: https://a.test/sitemap.xml\n"
    // the sitemap advertises one public and one disallowed page
    val sm =
      """<urlset><url><loc>https://a.test/ok.html</loc></url>
        |<url><loc>https://a.test/private/no.html</loc></url></urlset>""".stripMargin
    val bodies = Seq("a.test" -> robotsBody).toDF("host", "body")
    val fetched = Robots.sitemaps(bodies) // (host, sitemap url)
      .withColumn("xml", lit(sm))        // stand-in for the fetch stage
    val seeds = Sitemaps.urls(fetched, "xml").select(col("loc").as("url"))
    val admitted = Robots.admit(seeds, Robots.rules(bodies), "graftbot")
      .as[(String, Boolean)].collect().toMap
    assert(admitted == Map(
      "https://a.test/ok.html" -> true,
      "https://a.test/private/no.html" -> false))
  }
}
