package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, TextAnalysis}

/** Property-based invariants (scalacheck generators sampled under
  * deterministic seeds — the plus-bridge artifact is not in the offline
  * cache, so the property loop is explicit) for contracts the oracle
  * queries rely on but cannot express directly.
  */
class PropertySuite extends SparkSpec {

  private val word =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val mergeList = Gen.listOf(Gen.zip(
    Gen.alphaLowerChar.map(_.toString), Gen.alphaLowerChar.map(_.toString)))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("bpeSegment properties: concat-back, non-empty pieces, determinism (200 cases)") {
    (0 until 200).foreach { i =>
      val w = sample(word, i)
      val merges = sample(mergeList, 1000 + i)
      val seg = TextAnalysis.bpeSegment(w, merges)
      assert(seg.mkString == w, s"case $i: segments must concatenate to the word")
      assert(seg.nonEmpty && seg.forall(_.nonEmpty), s"case $i: no empty pieces")
      assert(seg.length <= w.length, s"case $i: merging never splits")
      assert(seg == TextAnalysis.bpeSegment(w, merges), s"case $i: deterministic")
    }
  }

  test("spanScrub invariant: dup_tokens + |scrubbed| == n_tokens, dup_frac in [0,1]") {
    import spark.implicits._
    // deterministic pseudo-random corpus with planted repeats: enough
    // structure to exercise overlap merging without a flaky generator
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val planted = Seq.fill(6)(vocab(rnd.nextInt(6))).mkString(" ")
    val docs = (0 until 40).map { i =>
      val noise = Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(6))).mkString(" ")
      (i.toLong, if (i % 3 == 0) s"$noise $planted" else noise)
    }
    val got = Dedup.spanScrub(docs.toDF("id", "text"), "id", "text", n = 4, minCount = 2)
      .as[(Long, Long, Long, Double, String)].collect()
    assert(got.length == 40)
    got.foreach { case (id, n, dup, frac, scrubbed) =>
      val kept = if (scrubbed.isEmpty) 0 else scrubbed.split(" ", -1).length
      assert(dup + kept == n, s"doc $id: $dup covered + $kept kept != $n")
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("latestByKey equals the window plan on random change logs with ties") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val rnd = new scala.util.Random(11)
    // small key/ts domains force heavy collisions: the (ts, seq) tie-break
    // must resolve identically in both plans
    val rows = (0 until 400).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(5).toLong, i.toLong, s"v$i"))
    val df = rows.toDF("k", "ts", "seq", "v")
    val viaAgg = graft.operators.Relational.latestByKey(df, "k",
        Seq(col("ts"), col("seq")),
        Seq(col("ts").as("ts"), col("seq").as("seq"), col("v").as("v")))
      .as[(Long, Long, Long, String)].collect().toSet
    val w = Window.partitionBy("k").orderBy(col("ts").desc, col("seq").desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("k", "ts", "seq", "v")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("cooccurrence matches a driver-side reference count on random baskets") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val items = Vector("w", "x", "y", "z", "q")
    val rows = (0 until 300).map(_ => (rnd.nextInt(25).toLong, items(rnd.nextInt(5))))
    val expected = rows.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted)
      .flatMap(b => for (i <- b.indices; j <- i + 1 until b.length) yield (b(i), b(j)))
      .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }.toSet
    val got = graft.operators.Relational.cooccurrence(rows.toDF("e", "i"), "e", "i")
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("TopK heap properties: any stream, any split = sorted top-k; merge associative (200 cases)") {
    import graft.functions.TopKAggregate.Heap
    val pair = Gen.zip(Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(0L, 50L))
    val stream = Gen.listOf(pair)
    (0 until 200).foreach { i =>
      val xs = sample(stream, i)
      val k = 1 + i % 7
      val expected = xs.sortBy(x => (x._1, x._2)).reverse.take(k)
      // single heap over the whole stream
      val h = new Heap(k)
      xs.foreach { case (s, id) => h.offer(s, id) }
      assert(h.sortedDesc.map(c => (c.score, c.id)) == expected, s"case $i direct")
      // arbitrary split + merge (the partial/final agg path) agrees
      val cut = if (xs.isEmpty) 0 else i % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val hl = new Heap(k); l.foreach { case (s, id) => hl.offer(s, id) }
      val hr = new Heap(k); r.foreach { case (s, id) => hr.offer(s, id) }
      hl.mergeIn(hr)
      assert(hl.sortedDesc.map(c => (c.score, c.id)) == expected, s"case $i merged")
    }
  }

  test("mixer trio invariants on random corpora: budget fill, epoch counts, anneal endpoints") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Sampling
    (0 until 8).foreach { c =>
      val rnd = new scala.util.Random(31 + c)
      val groups = (0 until 2 + rnd.nextInt(4)).map(g => s"g$g")
      val rows = (1L to (50L + rnd.nextInt(150))).map { i =>
        (i, groups(rnd.nextInt(groups.length)), 1L + rnd.nextInt(20))
      }
      val df = rows.toDF("id", "grp", "w")
      val salt = s"pp$c:"

      // takeToBudget: per group — poor groups whole, rich groups fill the
      // budget with the crossing row kept, kept set = hash-order prefix
      val budgets = groups.map(g => g -> (10L + rnd.nextInt(400)).toLong).toMap
      val kept = Sampling.takeToBudget(df, "grp", "w", "id", budgets, salt)
        .select("id").as[Long].collect().toSet
      val hashed = df
        .withColumn("h", Sampling.scrambledHash(col("id"), salt))
        .as[(Long, String, Long, Long)].collect()
      groups.foreach { g =>
        val ordered = hashed.filter(_._2 == g).sortBy(r => (r._4, r._1))
        var cum = 0L
        val expect = ordered.takeWhile { r =>
          val keep = cum < budgets(g); cum += r._3; keep
        }.map(_._1).toSet
        assert(kept.intersect(ordered.map(_._1).toSet) == expect,
          s"case $c group $g: kept set must be the hash-order prefix")
        val total = ordered.map(_._3).sum
        val keptW = ordered.filter(r => expect(r._1)).map(_._3).sum
        if (total <= budgets(g)) assert(keptW == total, s"case $c $g: poor group whole")
        else assert(keptW >= budgets(g), s"case $c $g: rich group fills its budget")
      }

      // epochMix: per group — count == |g|·full + |fractional draw|, epochs dense
      val permille = groups.map(g => g -> (rnd.nextInt(4000)).toLong).toMap
      val em = Sampling.epochMix(df, "grp", "id", permille, salt)
        .select("id", "grp", "epoch").as[(Long, String, Long)].collect()
      groups.foreach { g =>
        val ids = rows.filter(_._2 == g).map(_._1)
        val full = permille(g) / 1000
        val fracExp = df.filter($"grp" === g)
          .filter(Sampling.scrambledHash(concat(lit("ep"), lit(full), lit(":"),
            $"id".cast("string")), salt) % 1000L < permille(g) % 1000)
          .count()
        val got = em.filter(_._2 == g)
        assert(got.length == ids.length * full + fracExp,
          s"case $c $g: epoch count must be full copies + the fractional draw")
        assert(got.forall(r => r._3 >= 0 && r._3 <= full), s"case $c $g: epoch range")
        (0L until full).foreach(k =>
          assert(got.count(_._3 == k) == ids.length, s"case $c $g: epoch $k full"))
      }

      // annealMix: phase-0/last counts equal the start/end permille rule
      val start = groups.map(g => g -> rnd.nextInt(1001).toLong).toMap
      val end = groups.map(g => g -> rnd.nextInt(1001).toLong).toMap
      val phases = 2 + rnd.nextInt(4)
      val am = Sampling.annealMix(df, "grp", "id", start, end, phases, salt)
        .select("grp", "phase").as[(String, Long)].collect()
      groups.foreach { g =>
        def drawn(k: Long, pm: Long) = df.filter($"grp" === g)
          .filter(Sampling.scrambledHash(concat(lit("ph"), lit(k), lit(":"),
            $"id".cast("string")), salt) % 1000L < pm).count()
        assert(am.count(r => r._1 == g && r._2 == 0L) == drawn(0L, start(g)),
          s"case $c $g: phase 0 must draw at startPermille")
        assert(am.count(r => r._1 == g && r._2 == phases - 1L) ==
          drawn(phases - 1L, end(g)),
          s"case $c $g: last phase must draw at endPermille")
      }
    }
  }

  test("Robots.admit matches an independent matcher on random rule tables") {
    import spark.implicits._
    import graft.operators.Robots
    // reference semantics, implemented with direct char matching (no
    // regex): RFC 9309 §2.2.2 percent-normalization first (unreserved
    // escapes decode, surviving hex uppercases), then '*' any run,
    // trailing '$' end anchor, other chars literal (incl. mid-pattern
    // '$' and regex specials); longest NORMALIZED pattern wins, Allow
    // wins ties; exact-agent group else '*'; no match/no rules ->
    // allowed. Zero-length patterns match everything at len 0 (the
    // group-marker contract of Robots.rules).
    def refNorm(s: String): String = {
      def hex(c: Char) = Character.digit(c, 16) >= 0
      val sb = new StringBuilder; var i = 0
      while (i < s.length) {
        if (s(i) == '%' && i + 2 < s.length && hex(s(i + 1)) && hex(s(i + 2))) {
          val h = s.substring(i + 1, i + 3)
          val code = Integer.parseInt(h, 16)
          val unres = (code >= '0' && code <= '9') ||
            (code >= 'A' && code <= 'Z') || (code >= 'a' && code <= 'z') ||
            "-._~".indexOf(code.toChar) >= 0
          if (unres) sb.append(code.toChar)
          else sb.append('%').append(h.toUpperCase)
          i += 3
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }
    def matches(pat: String, path: String): Boolean = {
      val (body, anchored) =
        if (pat.endsWith("$")) (pat.dropRight(1), true) else (pat, false)
      def m(p: Int, t: Int): Boolean =
        if (p == body.length) !anchored || t == path.length
        else if (body(p) == '*') (t to path.length).exists(i => m(p + 1, i))
        else t < path.length && path(t) == body(p) && m(p + 1, t + 1)
      m(0, 0)
    }
    def refAllowed(rawPath: String, hostRules: Seq[(String, Boolean, String)],
        agent: String): Boolean = {
      val path = refNorm(rawPath)
      val mine = hostRules.filter(_._1 == agent)
      val grp = if (mine.nonEmpty) mine else hostRules.filter(_._1 == "*")
      val hits = grp.map(r => (r._1, r._2, refNorm(r._3)))
        .filter(r => matches(r._3, path))
      if (hits.isEmpty) true
      else hits.maxBy(r => (r._3.length, r._2))._2 // longest, allow wins tie
    }
    val rnd = new scala.util.Random(4242)
    // q%2Fr / q%2fr: reserved escapes that must match each other (hex
    // case-fold) but never the decoded 'q/r'
    val segs = Vector("a", "bb", "c.d", "img", "doc", "x", "q%2Fr", "q%2fr")
    // re-spell random unreserved chars as escapes, but never the chars
    // of an EXISTING escape: a malformed '%2%46' makes try_parse_url
    // reject the whole URL (null host/path — admit's unparsable-URL
    // path, not the matcher under test)
    def encodeMix(s: String): String = {
      val sb = new StringBuilder; var i = 0
      while (i < s.length) {
        val ch = s(i)
        if (ch == '%') { sb.append(s.substring(i, math.min(i + 3, s.length))); i += 3 }
        else {
          if (rnd.nextInt(5) == 0 && (ch.isLetterOrDigit || ch == '.')) {
            val h = f"${ch.toInt}%02X"
            sb.append('%').append(if (rnd.nextBoolean()) h else h.toLowerCase)
          } else sb.append(ch)
          i += 1
        }
      }
      sb.toString
    }
    def randPath(): String = encodeMix(
      (1 to 1 + rnd.nextInt(3)).map(_ => segs(rnd.nextInt(segs.size)))
        .mkString("/", "/", if (rnd.nextBoolean()) ".html" else ""))
    def randPattern(): String = {
      if (rnd.nextInt(8) == 0) return "" // zero-length group marker
      var p = randPath().take(1 + rnd.nextInt(8))
      if (p.endsWith("%") || p.takeRight(2).startsWith("%")) p = p + "x" // no cut mid-escape
      if (rnd.nextInt(3) == 0) { // inject a wildcard at a random cut
        val i = 1 + rnd.nextInt(p.length)
        p = p.substring(0, i) + "*" + p.substring(i)
      }
      if (rnd.nextInt(4) == 0) p += "$"
      p
    }
    val hosts = (0 until 12).map(h => s"h$h.test")
    val table: Map[String, Seq[(String, Boolean, String)]] = hosts.map { h =>
      val n = rnd.nextInt(6)
      h -> (0 until n).map { _ =>
        val agent = if (rnd.nextInt(3) == 0) "graftbot" else "*"
        (agent, rnd.nextBoolean(), randPattern())
      }
    }.toMap
    val urls = (0 until 400).map { _ =>
      val h = hosts(rnd.nextInt(hosts.size))
      (h, randPath())
    }
    val ruleRows = table.toSeq.flatMap { case (h, rs) =>
      rs.map { case (a, allow, p) =>
        (h, a, allow, p, p.contains("*") || p.contains("$"))
      }
    }.toDF("host", "agent", "allow", "path", "has_wildcard")
    val got = Robots.admit(
      urls.map { case (h, p) => s"https://$h$p" }.toDF("url"),
      ruleRows, "graftbot")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    urls.foreach { case (h, p) =>
      val want = refAllowed(p, table(h), "graftbot")
      assert(got(s"https://$h$p") == want,
        s"host=$h path=$p rules=${table(h)} want=$want")
    }
  }

  test("bm25Scores matches an independent in-memory scorer on random corpora") {
    import spark.implicits._
    // independent reference: plain-Scala Okapi over token lists — no
    // shared code with the operator beyond the published formula
    def refBm25(docs: Seq[(Long, String)], q: Seq[String], k1: Double,
        b: Double): Map[Long, Double] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val n = docs.size.toDouble
      val avgdl = toks.map(_._2.size).sum.toDouble / n
      val dfq = q.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
      toks.flatMap { case (id, ts) =>
        val dl = ts.size.toDouble
        val s = q.flatMap { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0 || dfq(t) == 0) None
          else Some(math.log((n - dfq(t) + 0.5) / (dfq(t) + 0.5) + 1.0) *
            (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        }
        if (s.isEmpty) None else Some(id -> s.sum)
      }.toMap
    }
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    (0 until 6).foreach { case_i =>
      val rnd = new scala.util.Random(31 + case_i)
      val docs = (1L to 60L).map(i =>
        i -> Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val q = rnd.shuffle(vocab).take(1 + rnd.nextInt(3))
      val got = TextAnalysis.bm25Scores(docs.toDF("id", "text"), "id", "text",
          q, k1 = 1.2, b = 0.75)
        .select("id", "score").as[(Long, Double)].collect().toMap
      val want = refBm25(docs, q, 1.2, 0.75)
      assert(got.keySet == want.keySet, s"case $case_i: matched-doc sets differ")
      got.foreach { case (id, s) =>
        assert(math.abs(s - want(id)) < 1e-9,
          s"case $case_i doc $id: $s vs ${want(id)} (q=$q)")
      }
    }
  }
}
