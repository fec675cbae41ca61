package graft

import graft.operators.Robots

/** robots.txt parsing + URL admission (RFC 9309) — the crawl-front
  * compliance gate. Grammar cases come straight from the RFC: group
  * assembly from consecutive User-agent lines, longest-match with
  * Allow winning ties, `*`/`$` patterns, empty-pattern rules matching
  * nothing, comments, CRLF, case rules (keys/agents insensitive, paths
  * sensitive).
  */
class RobotsSuite extends SparkSpec {
  import spark.implicits._

  private val body =
    """# graft test robots
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: /*.pdf$
      |
      |User-agent: *
      |Disallow: /
      |Allow: /public
      |Crawl-delay: 3
      |Sitemap: https://a.test/sitemap.xml
      |""".stripMargin

  private def rulesFor(hostBodies: (String, String)*) =
    Robots.rules(hostBodies.toSeq.toDF("host", "body"))

  test("rules: groups, shared agents, empty patterns, preamble, CRLF") {
    val all = rulesFor("a.test" -> body).collect()
      .map(x => (x.getString(0), x.getString(1), x.getBoolean(2), x.getString(3), x.getBoolean(4)))
    // every group carries exactly one zero-length allow marker per agent
    // (group existence for agent selection); real rules have path != ""
    assert(all.filter(_._4 == "").map(t => (t._2, t._3)).sorted.toSeq ==
      Seq(("*", true), ("graftbot", true), ("otherbot", true)))
    val r = all.filter(_._4 != "")
    // both agents of group 1 inherit all three rules; * group gets its two
    assert(r.count(_._2 == "graftbot") == 3)
    assert(r.count(_._2 == "otherbot") == 3)
    assert(r.filter(_._2 == "*").map(t => (t._4, t._3)).toSet ==
      Set(("/", false), ("/public", true)))
    // wildcard flag only on the pattern rule
    assert(r.filter(_._5).map(_._4).toSet == Set("/*.pdf$"))

    // rules BEFORE any User-agent line are ignored; empty Disallow
    // matches nothing and is dropped (only the group marker remains);
    // CRLF and UA-case are fine
    val r2 = rulesFor("b.test" ->
      "Disallow: /orphan\r\nUSER-AGENT: GraftBot\r\nDisallow:\r\nAllow: /x\r\n")
      .collect().map(x => (x.getString(1), x.getString(3)))
    assert(r2.filter(_._2 != "").toSeq == Seq(("graftbot", "/x")))
    assert(r2.toSet == Set(("graftbot", "/x"), ("graftbot", "")))
  }

  test("rules: the Disallow-nothing idiom keeps its group winning selection") {
    // RFC 9309 §2.2.1: 'User-agent: graftbot / Disallow:' is an
    // allow-everything group; falling through to the * group (which
    // blocks all) would be the wrong group entirely
    val rules = rulesFor("a.test" ->
      "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n")
    val got = Robots.admit(
      Seq("https://a.test/x", "https://a.test/").toDF("url"), rules, "graftbot")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(got.values.forall(identity), s"empty graftbot group must admit all: $got")
    // an agent NOT naming the empty group still gets the * rules
    val star = Robots.admit(
      Seq("https://a.test/x").toDF("url"), rules, "strangerbot")
      .select("robots_allowed").as[Boolean].collect()
    assert(star.toSeq == Seq(false))
    // a group with rules is unaffected by its own marker: real rule wins
    val rules2 = rulesFor("b.test" ->
      "User-agent: graftbot\nDisallow:\nDisallow: /priv/\n")
    val got2 = Robots.admit(
      Seq("https://b.test/priv/x", "https://b.test/pub").toDF("url"),
      rules2, "graftbot")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(!got2("https://b.test/priv/x") && got2("https://b.test/pub"))
  }

  test("admit/rules: percent-encoding normalization (RFC 9309 §2.2.2)") {
    // unreserved escapes decode on both sides; reserved stay encoded
    // but hex case-folds; precedence counts normalized octets
    val rules = rulesFor("a.test" ->
      ("User-agent: *\nDisallow: /a%2Db/\nDisallow: /c%2fd\n" +
        "Allow: /%7Euser\nDisallow: /%7E*\n"))
    val got = Robots.admit(Seq(
      "https://a.test/a-b/x",     // rule /a%2Db/ == /a-b/ -> disallow
      "https://a.test/a%2Db/x",   // URL escape decodes too -> disallow
      "https://a.test/c%2Fd",     // reserved: %2f ~ %2F (hex case) -> disallow
      "https://a.test/c/d",       // reserved NOT decoded -> no match -> allow
      "https://a.test/~user/p",   // allow len 6 beats /%7E* len 3 wildcard
      "https://a.test/%7euser/p", // same, URL-side escape + lowercase hex
      "https://a.test/~other"     // only the wildcard disallow matches
    ).toDF("url"), rules, "graftbot")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(!got("https://a.test/a-b/x"))
    assert(!got("https://a.test/a%2Db/x"))
    assert(!got("https://a.test/c%2Fd"))
    assert(got("https://a.test/c/d"))
    assert(got("https://a.test/~user/p"))
    assert(got("https://a.test/%7euser/p"))
    assert(!got("https://a.test/~other"))

    // the normalizer itself: malformed escapes pass through, hex
    // uppercases, unreserved decodes — and escape-free strings short-circuit
    import org.apache.spark.sql.functions.col
    val norm = Seq("/a%41b%2fc%G1%", "/plain", "%7e").toDF("s")
      .select(Robots.normalizePercent(col("s"))).as[String].collect().toSeq
    assert(norm == Seq("/aAb%2Fc%G1%", "/plain", "~"))
  }

  test("sitemaps are surfaced host-keyed") {
    val s = Robots.sitemaps(Seq("a.test" -> body).toDF("host", "body"))
      .as[(String, String)].collect().toSet
    assert(s == Set("a.test" -> "https://a.test/sitemap.xml"))
  }

  test("admit: longest match wins, Allow wins ties, wildcard/$, missing robots admits") {
    val rules = rulesFor("a.test" -> body, "tie.test" ->
      "User-agent: *\nDisallow: /page\nAllow: /page\n")
    val urls = Seq(
      "https://a.test/private/secret.html",   // graftbot: /private/ disallow
      "https://a.test/private/ok/fine.html",  // longer Allow overrides
      "https://a.test/docs/file.pdf",         // /*.pdf$ wildcard disallow
      "https://a.test/docs/file.pdf.html",    // $ anchor: NOT matched -> allowed
      "https://a.test/public/x",              // no graftbot rule matches -> allowed
      "https://a.test/PRIVATE/x",             // paths case-sensitive -> allowed
      "https://tie.test/page",                // equal length: Allow wins
      "https://norobots.test/anything"        // host absent -> allowed
    ).toDF("url")
    val got = Robots.admit(urls, rules, "GraftBot")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(!got("https://a.test/private/secret.html"))
    assert(got("https://a.test/private/ok/fine.html"))
    assert(!got("https://a.test/docs/file.pdf"))
    assert(got("https://a.test/docs/file.pdf.html"))
    assert(got("https://a.test/public/x"))
    assert(got("https://a.test/PRIVATE/x"))
    assert(got("https://tie.test/page"))
    assert(got("https://norobots.test/anything"))
    // unknown agent falls to the * group: root disallow, /public carve-out
    val star = Robots.admit(urls, rules, "strangerbot")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(!star("https://a.test/private/secret.html"))
    assert(star("https://a.test/public/x"))
    assert(star("https://norobots.test/anything"))
  }

  test("admit plan: one host join, no per-URL aggregation, zero UDFs") {
    val rules = rulesFor("a.test" -> body)
    val urls = Seq("https://a.test/x").toDF("url")
    val plan = Robots.admit(urls, rules, "graftbot")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("scalaudf"), "admission must stay zero-UDF")
    // the URL side must not be re-aggregated: every Aggregate in the
    // plan groups robots metadata (host/grp), never the url relation
    val aggLines = plan.linesIterator.filter(_.trim.startsWith("Aggregate")).toSeq
    assert(aggLines.forall(l => l.contains("host") || l.contains("grp")), aggLines.mkString("\n"))
  }

  test("crawl chain: WARC robots bodies gate extracted page URLs") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-robots-warc").toString + "/shards"
    val pages = Seq(
      ("http://site.test/robots.txt", "User-agent: *\nDisallow: /private/\n"),
      ("http://site.test/index.html", "<p>hello</p>"),
      ("http://site.test/private/x.html", "<p>secret</p>"))
    val rows = pages.map { case (u, b) =>
      (u, "2026-01-01T00:00:00Z", "text/plain",
        (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nContent-Length: ${b.length}\r\n\r\n$b").getBytes("UTF-8"))
    }
    graft.sources.WarcShards.write(
      rows.toDF("url", "warc_date", "content_type", "body"), dir)
    val resp = graft.sources.WarcShards.decodedResponses(spark, dir)
    val robots = resp.where(col("url").endsWith("/robots.txt"))
      .select(graft.operators.Url.host(col("url")).as("host"), col("text").as("body"))
    val admitted = Robots.admit(
      resp.where(!col("url").endsWith("/robots.txt")).select("url"),
      Robots.rules(robots), "graftbot")
      .as[(String, Boolean)].collect().toMap
    assert(admitted == Map(
      "http://site.test/index.html" -> true,
      "http://site.test/private/x.html" -> false))
  }

  test("crawlDelays: group preference, min-collapse, fractional, junk values") {
    val bodies = Seq(
      // exact group (5) preferred over * (1); two * directives -> min
      "a.test" -> ("User-agent: *\nCrawl-delay: 2\nCrawl-delay: 1\n\n" +
        "User-agent: graftbot\nCrawl-delay: 5\n"),
      // fractional + comment; agent case-insensitive
      "b.test" -> "User-Agent: GRAFTBOT\nCrawl-Delay: 0.5 # be gentle\n",
      // junk / negative values don't parse; preamble directive ignored
      "c.test" -> "Crawl-delay: 9\nUser-agent: *\nCrawl-delay: soon\nCrawl-delay: -1\n",
      // no directive at all
      "d.test" -> "User-agent: *\nDisallow: /x\n",
      // exact group EXISTS but carries no delay: it still wins group
      // selection (RFC 9309 §2.2.1), so the * group's 7 must NOT leak
      "e.test" -> ("User-agent: graftbot\nDisallow: /y\n\n" +
        "User-agent: *\nCrawl-delay: 7\n")).toDF("host", "body")
    val got = Robots.crawlDelays(bodies, "graftbot")
      .as[(String, Double)].collect().toMap
    assert(got == Map("a.test" -> 5.0, "b.test" -> 0.5))
    // e.test's * delay is still there for agents without their own group
    val star = Robots.crawlDelays(bodies, "strangerbot")
      .as[(String, Double)].collect().toMap
    assert(star("e.test") == 7.0)
  }

  test("E18: streaming wave scheduler — cross-batch counters, batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingFrontier
    implicit val sqlCtx = spark.sqlContext
    val delays = Map("a.test" -> 2000L, "b.test" -> 500L)
    val src = MemoryStream[(Long, String)]
    val q = StreamingFrontier.scheduleWaves(src.toDS(), delays, defaultDelayMs = 100L)
      .writeStream.format("memory").queryName("waves").outputMode("append").start()
    try {
      src.addData((3L, "a.test"), (1L, "a.test"), (2L, "b.test"))
      q.processAllAvailable()
      src.addData((4L, "a.test"), (5L, "c.test")) // counter continues; default delay
      q.processAllAvailable()
      val live = spark.table("waves")
        .as[StreamingFrontier.Scheduled].collect().sortBy(_.id)
      assert(live.map(s => (s.id, s.wave, s.etaMs)).toSeq == Seq(
        (1L, 1L, 0L), (2L, 1L, 0L), (3L, 2L, 2000L), // in-batch id order
        (4L, 3L, 4000L),                              // wave 3 across batches
        (5L, 1L, 0L)))                                // unknown host, default

      // fed in id order, the batch row_number wave assignment is identical
      val batch = Seq((1L, "a.test"), (2L, "b.test"), (3L, "a.test"),
        (4L, "a.test"), (5L, "c.test")).toDF("id", "host")
        .withColumn("wave", row_number().over(Window.partitionBy("host").orderBy("id")))
        .as[(Long, String, Int)].collect().map(t => t._1 -> t._3.toLong).toMap
      assert(live.map(s => s.id -> s.wave).toMap == batch)
    } finally q.stop()
  }

  test("E16: admit gates a streaming URL source (stream-static, batch parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rules = rulesFor("a.test" -> body, "tie.test" ->
      "User-agent: *\nDisallow: /page\nAllow: /page\n")
    val urls = Seq(
      "https://a.test/private/secret.html",
      "https://a.test/private/ok/fine.html",
      "https://a.test/docs/file.pdf",
      "https://tie.test/page",
      "https://norobots.test/anything")
    val src = MemoryStream[String]
    val q = Robots.admit(src.toDS().toDF("url"), rules, "graftbot")
      .select("url", "robots_allowed")
      .writeStream.format("memory").queryName("robots_stream")
      .outputMode("append").start()
    try {
      src.addData(urls.take(2): _*)
      q.processAllAvailable()
      src.addData(urls.drop(2): _*) // rules stay static across batches
      q.processAllAvailable()
      val live = spark.table("robots_stream")
        .as[(String, Boolean)].collect().toMap
      val batch = Robots.admit(urls.toDF("url"), rules, "graftbot")
        .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
      assert(live == batch, s"stream/batch verdicts diverge: $live vs $batch")
      assert(!live("https://a.test/private/secret.html"))
      assert(live("https://norobots.test/anything"))
    } finally q.stop()
  }
}
