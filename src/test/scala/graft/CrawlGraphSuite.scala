package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Html, Url}
import graft.sources.WarcShards

/** The crawl-graph composition the round-7 verdict asked to verify: a
  * synthetic crawl with a KNOWN link structure runs the whole front —
  * WARC shards → charset-aware decode → Html out-links →
  * Url.canonicalize → Graph.pageRank / bfsHops — and every stage's
  * output is checked exactly (edges as a set, ranks against an
  * independent in-test power iteration, hops against hand-derivable BFS
  * levels). Link hrefs carry the real-crawl noise canonicalize exists
  * for (scheme/host case, default ports, tracking params, fragments), so
  * the edge set only comes out right if canonicalization actually merges
  * the spellings.
  */
class CrawlGraphSuite extends SparkSpec {
  import spark.implicits._

  test("crawl → links → canonicalize → pageRank/bfsHops, all exact") {
    val tmp = Files.createTempDirectory("graft-crawlgraph").toString
    val n = 8
    val urls = (0 until n).map(i => s"http://site${i % 3}.test/p$i")
    // known digraph: p0 is the hub (most in-links); p3→p4→p0 a chain;
    // p5⇄p6 a 2-cycle hanging off p0
    val adj: Map[Int, Seq[Int]] = Map(
      0 -> Seq(1, 2), 1 -> Seq(0, 3), 2 -> Seq(0, 3), 3 -> Seq(4),
      4 -> Seq(0), 5 -> Seq(0, 6), 6 -> Seq(5), 7 -> Seq(0))
    // href spellings vary per (i, j) but all canonicalize to urls(j)
    def messy(i: Int, j: Int): String = (i + j) % 4 match {
      case 0 => urls(j)
      case 1 => urls(j).replace("http://", "HTTP://") + "?utm_source=feed"
      case 2 => urls(j).replace(".test/", ".TEST:80/") + "#frag"
      case 3 => urls(j) + "?utm_campaign=x&gclid=1#top"
    }
    val pages = (0 until n).map { i =>
      val links = adj(i).map(j => s"""<a href="${messy(i, j)}">l$j</a>""").mkString(" ")
      val body = s"<html><body><p>Page $i body text, long enough to pass " +
        s"the curation gates with café.</p><div>$links</div></body></html>"
      // one page per charset source: the decode stage is part of the chain
      if (i == 7)
        (urls(i), "2026-01-01T00:00:00Z", "text/html; charset=windows-1252",
          body.getBytes("windows-1252"))
      else (urls(i), "2026-01-01T00:00:00Z", "text/html", body.getBytes("UTF-8"))
    }
    WarcShards.write(pages.toDF("url", "warc_date", "content_type", "body"),
      s"$tmp/crawl", shards = Some(2))

    // decode → out-links → canonical edges
    val resp = WarcShards.decodedResponses(spark, s"$tmp/crawl")
    val edges = resp
      .select(col("url"), explode(Html.htmlLinks(col("text"))).as("raw"))
      .select(Url.canonicalize(col("url")).as("src"),
        Url.canonicalize(col("raw")).as("dst"))
      .filter(col("dst").isNotNull)
      .distinct()
    val gotEdges = edges.as[(String, String)].collect().toSet
    val wantEdges = adj.toSeq.flatMap { case (i, outs) =>
      outs.map(j => (urls(i), urls(j)))
    }.toSet
    assert(gotEdges == wantEdges,
      s"canonical edge set differs: extra=${gotEdges -- wantEdges} missing=${wantEdges -- gotEdges}")

    // pageRank vs an independent power iteration with the same fixed-
    // round simplified formulation (base + d·Σ pr/deg over in-edges)
    val iters = 12
    val d = 0.85
    val pr = Graph.pageRank(edges, "src", "dst", iters = iters, damping = d)
      .as[(String, Double)].collect().toMap
    val nodes = wantEdges.flatMap(e => Seq(e._1, e._2))
    val outdeg = wantEdges.groupBy(_._1).view.mapValues(_.size).toMap
    var ref = nodes.map(_ -> 1.0 / nodes.size).toMap
    val base = (1.0 - d) / nodes.size
    for (_ <- 1 to iters) {
      val inflow = wantEdges.toSeq
        .map { case (s, t) => t -> ref(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ref = nodes.map(v => v -> (base + d * inflow.getOrElse(v, 0.0))).toMap
    }
    assert(pr.keySet == nodes)
    nodes.foreach { v =>
      assert(math.abs(pr(v) - ref(v)) < 1e-9, s"$v: ${pr(v)} vs ${ref(v)}")
    }
    // and the hub is the top-ranked page
    assert(pr.maxBy(_._2)._1 == urls(0), pr.toSeq.sortBy(-_._2).take(3).toString)

    // bfsHops (undirected) from the 2-cycle: exact levels
    // p5 —(0)— ; p6,p0 at 1; p1,p2,p4,p7 at 2; p3 at 3
    val hops = Graph.bfsHops(edges, "src", "dst",
        Seq(urls(5)).toDF("node"), "node", rounds = 4)
      .as[(String, Long)].collect().toMap
    val wantHops = Map(urls(5) -> 0L, urls(6) -> 1L, urls(0) -> 1L,
      urls(1) -> 2L, urls(2) -> 2L, urls(4) -> 2L, urls(7) -> 2L, urls(3) -> 3L)
    assert(hops == wantHops, s"got $hops")

    // per-registered-domain rollup closes the loop to the curation side
    val psl = Seq("test")
    val byDomain = resp
      .select(Url.registeredDomain(col("url"), psl).as("dom"))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDomain == Map("site0.test" -> 3L, "site1.test" -> 3L, "site2.test" -> 2L))
  }
}
