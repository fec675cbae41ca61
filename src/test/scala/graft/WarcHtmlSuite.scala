package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.operators.Html
import graft.sources.WarcShards

/** WARC shard IO + HTML extraction — the Common Crawl ingestion front.
  * The WARC grammar is anchored against hand-written literal bytes (the
  * ISO 28500 record shape) and the gzip layer against the system gzip
  * both ways (zcat reads our shards; gzip-built members parse here).
  */
class WarcHtmlSuite extends SparkSpec {
  import spark.implicits._

  private def httpPayload(body: String, ctype: String = "text/html"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\nContent-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" + body)
      .getBytes("UTF-8")

  /** A literal WARC record, built character-by-character from the spec
    * shape — independent of the writer under test.
    */
  private def literalRecord(typ: String, uri: String, payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $typ\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
    h ++= "WARC-Date: 2026-08-14T00:00:00Z\r\n"
    if (uri != null) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "Content-Type: application/http;msgtype=response\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("warc: literal spec-shaped bytes parse; responses split the HTTP envelope") {
    val tmp = Files.createTempDirectory("graft-warc").toString
    val p1 = httpPayload("<html><body><p>hello world</p></body></html>")
    val p2 = httpPayload("plain body", ctype = "text/plain")
    val bytes = literalRecord("response", "http://a.example/x", p1) ++
      literalRecord("response", "http://b.example/y", p2) ++
      literalRecord("warcinfo", null, "format: WARC\r\n".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$tmp/hand.warc"), bytes)

    val recs = WarcShards.records(spark, tmp, "hand.warc")
    assert(recs.count() == 3)
    assert(recs.filter($"warc_type" === "response").count() == 2)

    val resp = WarcShards.responses(spark, tmp, "hand.warc")
      .select("url", "http_status", "http_content_type", "body")
      .as[(String, Option[Int], String, Array[Byte])].collect().sortBy(_._1)
    assert(resp.length == 2)
    assert(resp(0)._1 == "http://a.example/x" && resp(0)._2.contains(200))
    assert(resp(0)._3 == "text/html")
    assert(new String(resp(0)._4, "UTF-8") == "<html><body><p>hello world</p></body></html>")
    assert(new String(resp(1)._4, "UTF-8") == "plain body")
  }

  test("warc: writer round-trips; zcat reads our shards; gzip-built members parse") {
    val tmp = Files.createTempDirectory("graft-warcgz").toString
    val rows = Seq(
      ("http://a.example/1", "2026-01-01T00:00:00Z", "text/html", "<p>one</p>".getBytes("UTF-8")),
      ("http://a.example/2", "2026-01-02T00:00:00Z", "text/html", "<p>two</p>".getBytes("UTF-8")),
      ("http://b.example/3", "2026-01-03T00:00:00Z", "text/plain", "three".getBytes("UTF-8")))
    WarcShards.write(rows.toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/shards", shards = Some(2))

    // round-trip through the reader: every body back byte-identical
    val back = WarcShards.responses(spark, s"$tmp/shards")
      .select("url", "http_status", "body")
      .as[(String, Option[Int], Array[Byte])].collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == rows.map(_._1).sorted)
    assert(back.forall(_._2.contains(200)))
    assert(back.map(r => new String(r._3, "UTF-8")).toSeq == Seq("one", "two", "three").map {
      s => if (s == "three") "three" else s"<p>$s</p>"
    })
    // a warcinfo record leads each shard
    val infos = WarcShards.records(spark, s"$tmp/shards")
      .filter($"warc_type" === "warcinfo").count()
    val shardFiles = new java.io.File(s"$tmp/shards").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
    assert(infos == shardFiles.length.toLong)

    // interop 1: the system zcat decompresses our multi-member shard and
    // the plain concatenation parses as WARC
    val shard0 = shardFiles.head.getAbsolutePath
    val plain = s"$tmp/zcat.warc"
    assert((scala.sys.process.Process(Seq("bash", "-c",
      s"zcat '$shard0' > '$plain'")).! == 0))
    val viaZcat = WarcShards.records(spark, tmp, "zcat.warc")
    assert(viaZcat.count() == WarcShards.records(spark, tmp + "/shards",
      shardFiles.head.getName).count())

    // interop 2: a shard assembled with the SYSTEM gzip (one member per
    // record, the resumable layout) parses with our reader
    val r1 = s"$tmp/r1.warc"; val r2 = s"$tmp/r2.warc"
    Files.write(java.nio.file.Paths.get(r1),
      literalRecord("response", "http://c.example/z", httpPayload("sys gzip")))
    Files.write(java.nio.file.Paths.get(r2),
      literalRecord("response", "http://c.example/w", httpPayload("second member")))
    assert(scala.sys.process.Process(Seq("bash", "-c",
      s"gzip -c '$r1' > '$tmp/sys.warc.gz' && gzip -c '$r2' >> '$tmp/sys.warc.gz'")).! == 0)
    val sys = WarcShards.responses(spark, tmp, "sys.warc.gz")
      .select("url").as[String].collect().sorted
    assert(sys.toSeq == Seq("http://c.example/w", "http://c.example/z"))
  }

  test("warc: untrusted lengths and malformed structure fail loud; non-HTTP payload is data") {
    val tmp = Files.createTempDirectory("graft-warcbad").toString
    // Content-Length past EOF
    val long = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999999\r\n\r\nshort")
      .getBytes("UTF-8")
    Files.write(java.nio.file.Paths.get(s"$tmp/long.warc"), long)
    val e1 = intercept[org.apache.spark.SparkException](
      WarcShards.records(spark, tmp, "long.warc").count())
    assert(e1.getMessage.contains("runs past end") || e1.getCause != null)

    // non-numeric Content-Length
    val nan = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: abc\r\n\r\n")
      .getBytes("UTF-8")
    Files.write(java.nio.file.Paths.get(s"$tmp/nan.warc"), nan)
    intercept[org.apache.spark.SparkException](
      WarcShards.records(spark, tmp, "nan.warc").count())

    // not WARC at all
    Files.write(java.nio.file.Paths.get(s"$tmp/junk.warc"), "hello".getBytes("UTF-8"))
    intercept[org.apache.spark.SparkException](
      WarcShards.records(spark, tmp, "junk.warc").count())

    // a response whose payload is NOT an HTTP message: body = whole
    // payload, status null (tolerated, never dropped)
    val odd = literalRecord("response", "http://odd.example/", "no http here".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$tmp/odd.warc"), odd)
    val r = WarcShards.responses(spark, tmp, "odd.warc")
      .select("url", "http_status", "body").as[(String, Option[Int], Array[Byte])].head()
    assert(r._2.isEmpty && new String(r._3, "UTF-8") == "no http here")

    // existing path refuses without Overwrite
    WarcShards.write(Seq(("http://x/", "d", "t", Array[Byte](1)))
      .toDF("url", "warc_date", "content_type", "body"), s"$tmp/out")
    intercept[IllegalStateException](
      WarcShards.write(Seq(("http://x/", "d", "t", Array[Byte](1)))
        .toDF("url", "warc_date", "content_type", "body"), s"$tmp/out"))
    WarcShards.write(Seq(("http://y/", "d", "t", Array[Byte](2)))
      .toDF("url", "warc_date", "content_type", "body"), s"$tmp/out", SaveMode.Overwrite)
    assert(WarcShards.responses(spark, s"$tmp/out").select("url").as[String].head() == "http://y/")
  }

  test("html: tags strip, entities decode, blocks split, scripts/comments vanish") {
    val html =
      """<!DOCTYPE html><html><head><title> The&nbsp;Title </title>
        |<style>p { color: red }</style>
        |<script>if (a < b) { alert("<p>not text</p>"); }</script></head>
        |<body><!-- boilerplate comment -->
        |<h1>Heading</h1>
        |<p>First &amp; second &lt;para&gt; with &#65;&#x42; letters.</p>
        |<p>Line<br>break</p>
        |</body></html>""".stripMargin
    assert(Html.title(html).contains("The Title"))
    val text = Html.stripTags(html)
    assert(text.contains("Heading"))
    assert(text.contains("First & second <para> with AB letters."))
    assert(text.contains("Line\nbreak"))
    assert(!text.contains("alert"))
    assert(!text.contains("color"))
    assert(!text.contains("boilerplate comment"))
    // bare '<' is literal text, unterminated constructs never hang
    assert(Html.stripTags("a < b and c") == "a < b and c")
    assert(Html.stripTags("x<!-- never closed") == "x")
    assert(Html.stripTags("x<script>while(1){}") == "x")
    assert(Html.stripTags("") == "")
  }

  test("html: link density separates nav boilerplate from prose; links extract") {
    val prose = "This is a long paragraph of article prose that easily clears the " +
      "minimum character bar and contains no links at all, as body text tends to."
    val html =
      s"""<body>
         |<div><a href="/home">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></div>
         |<p>$prose</p>
         |<p>Short note.</p>
         |<div><a href="https://ads.example/click?id=1">One weird trick advertisers hate</a></div>
         |</body>""".stripMargin
    val main = Html.mainText(html)
    assert(main.contains(prose))
    assert(!main.contains("Home"))         // nav: high link density
    assert(!main.contains("Short note"))   // under min length
    assert(!main.contains("weird trick"))  // all-link block
    assert(Html.links(html) == Vector("/home", "/about", "/contact",
      "https://ads.example/click?id=1"))
    // attribute values with '>' inside quotes don't end the tag
    assert(Html.stripTags("""<a href="/q?a>b">x</a> y""") == "x y")
    assert(Html.links("""<a href="/q?a>b">x</a>""") == Vector("/q?a>b"))
  }

  test("warc: streaming ingestion cures shards as they land, batch-identical parse") {
    val tmp = Files.createTempDirectory("graft-warcstream").toString
    val watch = s"$tmp/incoming"
    Files.createDirectories(java.nio.file.Paths.get(watch))
    def land(name: String, rows: Seq[(String, String)]): Unit = {
      // write elsewhere, rename in — the atomic-arrival contract
      val staging = s"$tmp/stage-$name"
      WarcShards.write(
        rows.map { case (u, h) => (u, "2026-03-03T00:00:00Z", "text/html", h.getBytes("UTF-8")) }
          .toDF("url", "warc_date", "content_type", "body"),
        staging, shards = Some(1))
      val shard = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".warc.gz")).get
      Files.move(shard.toPath, java.nio.file.Paths.get(s"$watch/$name.warc.gz"))
      ()
    }
    land("s1", Seq(
      ("http://st.example/1", "<html><body><p>Streaming article one, long enough to pass boilerplate gates easily.</p></body></html>"),
      ("http://st.example/2", "<html><body><p>Streaming article two, long enough to pass boilerplate gates easily.</p></body></html>")))

    val q = WarcShards.streamResponses(spark, watch)
      .select($"url", Html.htmlMainText($"body".cast("string")).as("text"))
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", s"$tmp/ckpt").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got1 = spark.table("warc_stream").select("url").as[String].collect().sorted
      assert(got1.toSeq == Seq("http://st.example/1", "http://st.example/2"))

      land("s2", Seq(
        ("http://st.example/3", "<html><body><p>Streaming article three, long enough to pass boilerplate gates easily.</p></body></html>")))
      q.processAllAvailable()
      val got2 = spark.table("warc_stream")
        .select("url", "text").as[(String, String)].collect().sortBy(_._1)
      assert(got2.map(_._1).toSeq == Seq("http://st.example/1", "http://st.example/2",
        "http://st.example/3"))
      assert(got2.forall(_._2.startsWith("Streaming article")))
      // re-delivering processAllAvailable adds nothing: per-shard exactly-once
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() == 3)
    } finally q.stop()
  }

  test("url: host, registered domain, canonicalization, tracking-param strip") {
    import graft.operators.Url
    def one(expr: org.apache.spark.sql.Column, url: String): Option[String] =
      Seq(url).toDF("u").select(expr.as("r")).as[Option[String]].head()

    assert(one(Url.host($"u"), "https://News.BBC.co.uk/x").contains("news.bbc.co.uk"))
    assert(one(Url.registeredDomain($"u"), "https://News.BBC.co.uk/x").contains("bbc.co.uk"))
    assert(one(Url.registeredDomain($"u"), "http://a.b.example.org/p").contains("example.org"))
    assert(one(Url.registeredDomain($"u"), "http://example.com/").contains("example.com"))
    assert(one(Url.registeredDomain($"u"), "http://localhost/").contains("localhost"))
    assert(one(Url.registeredDomain($"u"), "https://shop.com.au.evil.net/").contains("evil.net"))

    assert(one(Url.canonicalize($"u"), "HTTP://Example.COM:80/path?utm_source=x&id=3#frag")
      .contains("http://example.com/path?id=3"))
    assert(one(Url.canonicalize($"u"), "https://example.com:8443/?gclid=1")
      .contains("https://example.com:8443/"))
    assert(one(Url.canonicalize($"u"), "https://example.com")
      .contains("https://example.com/"))
    // param ORDER preserved — canonicalization must not merge different pages
    assert(one(Url.canonicalize($"u"), "http://e.com/s?b=2&a=1&utm_medium=m")
      .contains("http://e.com/s?b=2&a=1"))
    assert(one(Url.canonicalize($"u"), "https://example.com:443/x").contains("https://example.com/x"))

    assert(one(Url.stripTrackingParams($"u"), "HTTP://Ex.com/p?utm_x=1&a=2#f")
      .contains("HTTP://Ex.com/p?a=2#f"))
    assert(one(Url.stripTrackingParams($"u"), "http://ex.com/p").contains("http://ex.com/p"))
    assert(one(Url.stripTrackingParams($"u"), "http://ex.com/p?utm_a=1")
      .contains("http://ex.com/p"))

    // unparsable / hostless input → null, never a throw
    assert(one(Url.canonicalize($"u"), "::::not a url").isEmpty)
    assert(one(Url.host($"u"), "mailto:a@b.c").isEmpty ||
      one(Url.canonicalize($"u"), "mailto:a@b.c").isEmpty)

    // codegen check: the whole chain is expression-only (no UDF in the plan)
    val plan = Seq("http://e.com/?utm_a=1&x=2").toDF("u")
      .select(Url.canonicalize($"u"), Url.registeredDomain($"u"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("url: PSL-backed registered domain — private suffixes, longest match, defaults") {
    import graft.operators.Url
    // a miniature publicsuffix.org table in the VERBATIM file shape:
    // TLDs, a ccTLD second level, the multi-label PRIVATE suffixes the
    // heuristic merges wrong, and the wildcard/exception family
    val psl = Seq("com", "org", "io", "uk", "co.uk", "ac.uk",
      "github.io", "blogspot.com", "ck", "*.ck", "!www.ck", "*.nom.br",
      "// comment lines are ignored", "")
    def one(url: String): Option[String] =
      Seq(url).toDF("u").select(Url.registeredDomain($"u", psl).as("r"))
        .as[Option[String]].head()

    assert(one("https://News.BBC.co.uk/x").contains("bbc.co.uk"))
    assert(one("https://user.github.io/repo").contains("user.github.io"))
    assert(one("https://deep.pages.user.github.io/").contains("user.github.io"))
    assert(one("https://someone.blogspot.com/post").contains("someone.blogspot.com"))
    assert(one("http://a.b.example.org/p").contains("example.org"))
    assert(one("http://example.com/").contains("example.com"))
    // vs the heuristic's false merge — the exact failure ADVICE flagged
    assert(Seq("https://user.github.io/").toDF("u")
      .select(Url.registeredDomain($"u").as("r")).as[String].head() == "github.io")
    // a host that IS a public suffix registers nothing
    assert(one("https://github.io/").isEmpty)
    assert(one("https://co.uk/").isEmpty)
    // unknown TLD → PSL default rule (last two labels); dotless → null
    assert(one("http://foo.bar.unknowntld/").contains("bar.unknowntld"))
    assert(one("http://localhost/").isEmpty)
    assert(one("::::junk").isEmpty)

    // wildcard rule: every <label>.ck is a public suffix…
    assert(one("https://foo.ck/").isEmpty)          // IS a suffix under *.ck
    assert(one("https://bar.foo.ck/p").contains("bar.foo.ck"))
    assert(one("https://deep.bar.foo.ck/").contains("bar.foo.ck"))
    assert(one("https://ck/").isEmpty)              // bare TLD rule 'ck'
    // …except the exception rule, which carves www.ck back out
    assert(one("https://www.ck/").contains("www.ck"))
    assert(one("https://shop.www.ck/x").contains("www.ck"))
    // deeper wildcard parent: *.nom.br (wildcard tier at 3 labels)
    assert(one("https://someone.nom.br/").isEmpty)
    assert(one("https://site.someone.nom.br/").contains("site.someone.nom.br"))

    // still zero-UDF: InSet literals, not a join or a udf
    val plan = Seq("https://user.github.io/").toDF("u")
      .select(Url.registeredDomain($"u", psl))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("Join"), plan.take(400))

    // rules OUTSIDE the published PSL shapes still fail loud (inner
    // wildcards / bare '*.' / empty tables never mis-group silently)
    intercept[IllegalArgumentException](
      Seq("x").toDF("u").select(Url.registeredDomain($"u", Seq("com", "a.*.ck"))))
    intercept[IllegalArgumentException](
      Seq("x").toDF("u").select(Url.registeredDomain($"u", Seq("com", "!w*.ck"))))
    intercept[IllegalArgumentException](
      Seq("x").toDF("u").select(Url.registeredDomain($"u", Seq("// only", ""))))
  }

  test("html: column wrappers + warc->html->curation end-to-end") {
    val pages = Seq(
      ("http://s.example/a", "<html><head><title>A</title></head><body>" +
        "<p>Alpha article body text, long enough to keep for curation purposes here.</p>" +
        "<div><a href='/x'>x</a><a href='/y'>y</a></div></body></html>"),
      ("http://s.example/b", "<html><body><p>Beta article body text, also long " +
        "enough to keep for curation purposes here.</p></body></html>"))
    val tmp = Files.createTempDirectory("graft-warce2e").toString
    WarcShards.write(
      pages.map { case (u, h) => (u, "2026-02-02T00:00:00Z", "text/html", h.getBytes("UTF-8")) }
        .toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/crawl", shards = Some(1))

    val out = WarcShards.responses(spark, s"$tmp/crawl")
      .filter($"http_content_type".startsWith("text/html"))
      .select($"url", Html.htmlTitle($"body".cast("string")).as("title"),
        Html.htmlMainText($"body".cast("string")).as("text"),
        Html.htmlLinks($"body".cast("string")).as("links"))
      .orderBy("url")
      .as[(String, Option[String], String, Seq[String])].collect()
    assert(out.length == 2)
    assert(out(0)._2.contains("A") && out(0)._3.startsWith("Alpha article"))
    assert(out(0)._4 == Seq("/x", "/y"))
    assert(out(1)._2.isEmpty && out(1)._3.startsWith("Beta article"))

    // the pipeline stage form agrees with the column form
    val staged = new Html.ExtractStage().process(
      pages.map { case (u, h) => Html.Page(u, h) })
    assert(staged.map(_.text) == out.map(_._3).toSeq)
    assert(staged.map(_.n_links) == Seq(2L, 0L))
  }

  test("charset-aware decode: 1252/GBK/BOM pages survive responses → mainText") {
    val tmp = Files.createTempDirectory("graft-charset").toString
    val cafe = "Résumé? No — café naïve."
      .replace("é", "é") // plain precomposed é
    val zh = "你好世界" // 你好世界
    val p1252 = s"<html><body><p>$cafe and more words to pass the boilerplate gate here.</p></body></html>"
    val pGbk = s"<html><head><meta charset=gbk></head><body><p>$zh $zh $zh $zh and filler words to pass the length gate.</p></body></html>"
    val pBom = s"<html><body><p>utf16 page $cafe with enough words to pass the length gate.</p></body></html>"
    val pPlain = "<html><body><p>plain ascii page with enough words to pass the length gate.</p></body></html>"
    val bom16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++ pBom.getBytes("UTF-16LE")
    val rows = Seq(
      // charset in the HTTP header only — the header must win
      ("http://c.example/1252", "2026-01-01T00:00:00Z",
        "text/html; charset=windows-1252", p1252.getBytes("windows-1252")),
      // charset declared in-band only — the meta sniff must find it
      ("http://c.example/gbk", "2026-01-01T00:00:00Z",
        "text/html", pGbk.getBytes("GBK")),
      // UTF-16LE BOM, no declaration anywhere else — the BOM must win
      ("http://c.example/bom", "2026-01-01T00:00:00Z",
        "text/html", bom16),
      // nothing declared: UTF-8 fallback
      ("http://c.example/plain", "2026-01-01T00:00:00Z",
        "text/html", pPlain.getBytes("UTF-8")))
    WarcShards.write(rows.toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/shards", shards = Some(1))
    val got = WarcShards.decodedResponses(spark, s"$tmp/shards")
      .select("url", "text", "charset", "charset_source")
      .as[(String, String, String, String)].collect()
      .map(r => r._1.split('/').last -> r).toMap
    assert(got("1252")._3.equalsIgnoreCase("windows-1252") &&
      got("1252")._4 == "http-header")
    assert(got("gbk")._3.equalsIgnoreCase("GBK") && got("gbk")._4 == "meta")
    assert(got("bom")._3.equalsIgnoreCase("UTF-16LE") && got("bom")._4 == "bom")
    assert(got("plain")._3 == "UTF-8" && got("plain")._4 == "fallback")
    // no mojibake: the non-ASCII text reaches mainText intact
    assert(Html.mainText(got("1252")._2).contains(cafe), got("1252")._2)
    assert(Html.mainText(got("gbk")._2).contains(zh), got("gbk")._2)
    assert(Html.mainText(got("bom")._2).contains(cafe), got("bom")._2)
    assert(!got("bom")._2.contains("\uFEFF"), "BOM must be stripped from text")
    // and the wrong-decode really WOULD have mojibaked (guards the test)
    assert(!new String(p1252.getBytes("windows-1252"), "UTF-8").contains("café"))
  }
}
