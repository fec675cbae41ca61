package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.plans.{GraftAsofJoin, GraftExtensions, GraftStrategy}

class AsofNativeSuite extends SparkSpec {

  private def leftDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("l_id", "l_key", "l_ts")
  }
  private def rightDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("r_id", "r_key", "r_ts")
  }

  test("A1: backward as-of picks the latest right row at or before each left ts") {
    val l = leftDf(Seq((1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "c", 10L)))
    val r = rightDf(Seq(
      (10L, "a", 90L), (11L, "a", 100L), (12L, "a", 210L), // 100 ties left ts -> inclusive
      (13L, "b", 49L), (14L, "b", 51L)))
    val out = GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", tieBreak = Seq("r_id"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // l1@100 -> r11 (ts 100 inclusive beats 90); l2@205 -> r11 (210 is after);
    // l3@50 -> r13; l4 has no right key -> dropped (inner)
    assert(out == Set((1L, 11L), (2L, 11L), (3L, 13L)))
  }

  test("A2: ts ties on the right break by tieBreak ascending, last wins") {
    val l = leftDf(Seq((1L, "k", 100L)))
    val r = rightDf(Seq((7L, "k", 100L), (9L, "k", 100L), (8L, "k", 100L)))
    val out = GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", tieBreak = Seq("r_id"))
      .select("r_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(9L)) // max r_id among the ts ties
  }

  test("A3: outer keeps unmatched lefts with null right columns; nulls never match") {
    import spark.implicits._
    val l = Seq((1L, Option("a"), Option(100L)), (2L, Option("z"), Option(100L)),
        (3L, None: Option[String], Option(100L)), (4L, Option("a"), None: Option[Long]))
      .toDF("l_id", "l_key", "l_ts")
    val r = Seq((10L, Option("a"), Option(90L)), (11L, Option("a"), None: Option[Long]),
        (12L, None: Option[String], Option(1L)))
      .toDF("r_id", "r_key", "r_ts")
    val out = GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", tieBreak = Seq("r_id"), outer = true)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    // only l1 matches (r10; r11's null ts and r12's null key never match);
    // l2 (no key), l3 (null key), l4 (null ts) survive with null right
    assert(out == Set((1L, 10L), (2L, -1L), (3L, -1L), (4L, -1L)))
    // inner drops the same three
    val inner = GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts", tieBreak = Seq("r_id")).select("l_id").collect().map(_.getLong(0)).toSeq
    assert(inner == Seq(1L))
  }

  test("A4: randomized parity with the union+window asofJoin under heavy key/ts collisions") {
    val rnd = new scala.util.Random(42)
    // tiny key/ts domains force every edge: shared keys, ts ties, empty sides
    val l = leftDf((1L to 400L).map(i => (i, "k" + rnd.nextInt(12), rnd.nextInt(40).toLong)))
    val r = rightDf((1L to 400L).map(i => (i, "k" + rnd.nextInt(14), rnd.nextInt(40).toLong)))
    def native(b: Boolean) = GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", tieBreak = Seq("r_id"), broadcast = Some(b))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val viaWindow = graft.operators.Relational.asofJoin(
        l, r, leftKey = "l_key", rightKey = "r_key", leftTs = "l_ts", rightTs = "r_ts",
        leftId = "l_id", rightId = "r_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(native(false) == viaWindow)
    assert(native(true) == viaWindow)
    assert(viaWindow.nonEmpty)
  }

  test("A5: plan shape — AsofMergeJoinExec with co-partitioning exchanges, no Window") {
    val l = leftDf((1L to 100L).map(i => (i, "k" + i % 5, i)))
    val r = rightDf((1L to 100L).map(i => (i, "k" + i % 7, i / 2)))
    val df = GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts", tieBreak = Seq("r_id"), broadcast = Some(false))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // both sides hash-exchanged on their keys and sorted — the SMJ shape
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size >= 2, plan)
    assert(plan.toLowerCase.contains("sort"), plan)
  }

  test("A7: broadcast variant — identical rows to merge, narrow left (no shuffle)") {
    val rnd = new scala.util.Random(7)
    val l = leftDf((1L to 300L).map(i => (i, "k" + rnd.nextInt(10), rnd.nextInt(30).toLong)))
    val r = rightDf((1L to 120L).map(i => (i, "k" + rnd.nextInt(12), rnd.nextInt(30).toLong)))
    def run(broadcast: Option[Boolean], outer: Boolean) =
      GraftAsofJoin.asofJoinMerge(l, r, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", tieBreak = Seq("r_id"), outer = outer, broadcast = broadcast)
    for (outer <- Seq(false, true)) {
      val viaB = run(Some(true), outer)
      val viaM = run(Some(false), outer)
      val rowsB = viaB.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString).mkString("|")).toSeq.sorted
      val rowsM = viaM.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString).mkString("|")).toSeq.sorted
      assert(rowsB == rowsM, s"outer=$outer")
      val planB = viaB.queryExecution.executedPlan.toString
      assert(planB.contains("BroadcastAsofJoin"), planB)
      assert(planB.contains("BroadcastExchange"), planB)
      // the left side never shuffles under the broadcast plan
      assert(!planB.toLowerCase.contains("hashpartitioning"), planB)
    }
    // strategy auto-picks broadcast for an under-threshold right side
    val auto = run(None, outer = false)
    auto.collect()
    assert(auto.queryExecution.executedPlan.toString.contains("BroadcastAsofJoin"))
  }

  test("A9: forward as-of — earliest at-or-after, min-id ties, outer keeps unmatched") {
    val rnd = new scala.util.Random(21)
    val lRows = (1L to 300L).map(i => (i, "k" + rnd.nextInt(10), rnd.nextInt(40).toLong))
    val rRows = (1L to 300L).map(i => (i, "k" + rnd.nextInt(12), rnd.nextInt(40).toLong))
    val l = leftDf(lRows); val r = rightDf(rRows)
    def naive(outer: Boolean): Set[(Long, Long)] = lRows.flatMap { case (lid, k, lts) =>
      val cands = rRows.filter(x => x._2 == k && x._3 >= lts)
      if (cands.nonEmpty) {
        val w = cands.minBy(x => (x._3, x._1)) // earliest ts, then MIN id
        Some((lid, w._1))
      } else if (outer) Some((lid, -1L)) else None
    }.toSet
    for (outer <- Seq(false, true); bcast <- Seq(false, true)) {
      val got = GraftAsofJoin.asofJoinForward(l, r, Seq("l_key"), Seq("r_key"),
          "l_ts", "r_ts", tieBreak = Seq("r_id"), outer = outer,
          broadcast = Some(bcast))
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      assert(got == naive(outer), s"outer=$outer bcast=$bcast")
    }
  }

  test("A11: loud guards — forward rejects non-numeric ts/tie, nearest rejects shared names") {
    import spark.implicits._
    val l = Seq((1L, "k", "2024-01-01")).toDF("l_id", "l_key", "l_ts")
    val r = Seq((2L, "k", "2024-01-01")).toDF("r_id", "r_key", "r_ts")
    // string ts: the negation composition cannot apply — must fail loud
    val e1 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinForward(l, r, Seq("l_key"), Seq("r_key"), "l_ts", "r_ts")
    }
    assert(e1.getMessage.contains("numeric"))
    // string tie column rejected the same way
    val ln = leftDf(Seq((1L, "k", 10L)))
    val rs = Seq((2L, "k", 5L, "x")).toDF("r_id", "r_key", "r_ts", "r_tag")
    val e2 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinForward(ln, rs, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", tieBreak = Seq("r_tag"))
    }
    assert(e2.getMessage.contains("numeric"))
    // nearest resolves by name across two pass outputs: shared names fail
    // at the API boundary, not as a deep ambiguous-reference error
    val shared = Seq((9L, "k", 5L)).toDF("l_id", "l_key", "r_ts")
    val e3 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinNearest(shared, rightDf(Seq((2L, "k", 5L))),
        Seq("l_key"), Seq("r_key"), "r_ts", "r_ts", leftId = "l_id")
    }
    assert(e3.getMessage.contains("share column names"))
    // reserved temp names fail loud rather than silently colliding
    val withTmp = leftDf(Seq((1L, "k", 10L))).withColumn("__graft_fwd_lts", lit(0L))
    val e4 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinForward(withTmp, rightDf(Seq((2L, "k", 5L))),
        Seq("l_key"), Seq("r_key"), "l_ts", "r_ts")
    }
    assert(e4.getMessage.contains("reserved"))
    // key dataType mismatch (int vs long) would compare raw UnsafeRow
    // bytes and silently match nothing — must fail loud at construction
    val lIntKey = Seq((1L, 5, 10L)).toDF("l_id", "l_key", "l_ts")
    val rLongKey = Seq((2L, 5L, 5L)).toDF("r_id", "r_key", "r_ts")
    val e5 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinMerge(lIntKey, rLongKey, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts")
    }
    assert(e5.getMessage.contains("key types"))
    // ts dataType mismatch the same way
    val lIntTs = Seq((1L, "k", 10)).toDF("l_id", "l_key", "l_ts")
    val e6 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinMerge(lIntTs, rightDf(Seq((2L, "k", 5L))),
        Seq("l_key"), Seq("r_key"), "l_ts", "r_ts")
    }
    assert(e6.getMessage.contains("timestamp types"))
    // self-as-of-join of one unaliased frame: both sides carry the SAME
    // exprIds, so resultProj would bind right columns to left ordinals —
    // fail loud, and the documented remedy (re-alias) must work
    val self = leftDf(Seq((1L, "k", 10L), (2L, "k", 20L)))
    val e7 = intercept[IllegalArgumentException] {
      GraftAsofJoin.asofJoinMerge(self, self, Seq("l_key"), Seq("l_key"),
        "l_ts", "l_ts")
    }
    assert(e7.getMessage.contains("share attributes"))
    val realiased = self.toDF("r_id", "r_key", "r_ts") // fresh exprIds
    val selfRows = GraftAsofJoin.asofJoinMerge(self, realiased,
        Seq("l_key"), Seq("r_key"), "l_ts", "r_ts", tieBreak = Seq("r_id"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(selfRows == Set((1L, 1L), (2L, 2L)))
  }

  test("A10: nearest as-of — closer side wins, equal distance prefers backward") {
    val rnd = new scala.util.Random(33)
    val lRows = (1L to 250L).map(i => (i, "k" + rnd.nextInt(8), rnd.nextInt(30).toLong))
    val rRows = (1L to 250L).map(i => (i, "k" + rnd.nextInt(10), rnd.nextInt(30).toLong))
    val l = leftDf(lRows); val r = rightDf(rRows)
    def naive(outer: Boolean): Set[(Long, Long)] = lRows.flatMap { case (lid, k, lts) =>
      val back = rRows.filter(x => x._2 == k && x._3 <= lts)
        .sortBy(x => (x._3, x._1)).lastOption            // max (ts, id)
      val fwd = rRows.filter(x => x._2 == k && x._3 >= lts)
        .sortBy(x => (x._3, x._1)).headOption            // min (ts, id)
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (math.abs(lts - b._3) <= math.abs(f._3 - lts)) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
      pick.map(w => (lid, w._1)).orElse(if (outer) Some((lid, -1L)) else None)
    }.toSet
    for (outer <- Seq(false, true)) {
      val got = GraftAsofJoin.asofJoinNearest(l, r, Seq("l_key"), Seq("r_key"),
          "l_ts", "r_ts", leftId = "l_id", tieBreak = Seq("r_id"), outer = outer)
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      assert(got == naive(outer), s"outer=$outer")
    }
    // exact-tie preference: click 5 before and 5 after -> backward wins
    val lt = leftDf(Seq((1L, "t", 100L)))
    val rt = rightDf(Seq((7L, "t", 95L), (9L, "t", 105L)))
    val tie = GraftAsofJoin.asofJoinNearest(lt, rt, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", leftId = "l_id", tieBreak = Seq("r_id"))
      .select("r_id").collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(7L))
  }

  test("A6: GraftExtensions injects the planner strategy and SQL function") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    val strategies = org.apache.spark.sql.graftbridge.Bridge.plannerStrategies(e, spark)
    assert(strategies.exists(_.isInstanceOf[GraftStrategy]))
    // the injected expression builder produces the same hash the column API does
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val viaColumn = Seq("hello graft").toDF("t")
      .select(graft.functions.GraftExpressions.polyHash(col("t"))).collect().head.getLong(0)
    val viaBuilder = {
      val expr = graft.functions.GraftExpressions.PolyHash(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          org.apache.spark.unsafe.types.UTF8String.fromString("hello graft"),
          org.apache.spark.sql.types.StringType))
      expr.eval(null).asInstanceOf[Long]
    }
    assert(viaColumn == viaBuilder)
  }

  test("A8: the full injected SQL-function surface runs end-to-end and matches the Column API") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    // same registerFunctions call a .withExtensions(...) session makes
    org.apache.spark.sql.graftbridge.Bridge.registerInjectedFunctions(e, spark)
    import spark.implicits._
    Seq(("alpha beta gamma beta alpha beta gamma delta", Array(1.0f, -0.5f), Array(0.8f, 0.1f)))
      .toDF("t", "va", "vb").createOrReplaceTempView("ext_fn_probe")
    val row = spark.sql(
      """SELECT graft_poly_hash(t)                                    AS ph,
                graft_cosine(va, vb)                                  AS cos,
                graft_hyperplane_bands(va, 2,
                  array(array(0.5d, -0.2d), array(0.1d, 0.3d)))       AS hb,
                graft_shingle_count(split(t, ' '))                    AS sc,
                graft_simhash(split(t, ' '))                          AS sh,
                graft_minhash_bands(graft_shingle_hash(split(t, ' '))) AS mb
         FROM ext_fn_probe""").head()
    // the imperative per-session register() installs the same names — the
    // Column-API results must match the extension-injected SQL results
    graft.functions.GraftExpressions.register(spark)
    graft.functions.SignatureExpressions.register(spark)
    val viaCols = spark.table("ext_fn_probe").select(
      graft.functions.GraftExpressions.polyHash(col("t")).as("ph"),
      graft.functions.GraftExpressions.cosineSim(col("va"), col("vb")).as("cos"),
      call_function("graft_hyperplane_bands", col("va"), lit(2),
        typedlit(Seq(Seq(0.5, -0.2), Seq(0.1, 0.3)))).as("hb"),
      graft.functions.SignatureExpressions.distinctShingleCount(split(col("t"), " ")).as("sc"),
      graft.functions.SignatureExpressions.simhash(split(col("t"), " ")).as("sh"),
      graft.functions.SignatureExpressions.minhashBandKeys(
        graft.functions.SignatureExpressions.shingleHash(split(col("t"), " "))).as("mb")
    ).head()
    assert(row.getLong(0) == viaCols.getLong(0))
    assert(math.abs(row.getDouble(1) - viaCols.getDouble(1)) < 1e-12)
    assert(row.getSeq[Long](2) == viaCols.getSeq[Long](2) && row.getSeq[Long](2).nonEmpty)
    assert(row.getLong(3) == viaCols.getLong(3) && row.getLong(3) > 0)
    assert(row.getLong(4) == viaCols.getLong(4))
    assert(row.getSeq[String](5) == viaCols.getSeq[String](5) && row.getSeq[String](5).nonEmpty)
    // the injected AGGREGATE works from pure SQL too (analyzer wraps it),
    // with int score/id coercing via the declared input types
    import spark.implicits._
    Seq(("g", 1, 10L), ("g", 5, 20L), ("g", 3, 30L), ("h", 9, 40L))
      .toDF("g", "s", "id").createOrReplaceTempView("ext_topk_probe")
    val agg = spark.sql(
      """SELECT g, graft_topk(s, id, 2) AS top FROM ext_topk_probe GROUP BY g
         ORDER BY g""").collect()
    assert(agg.length == 2)
    val gTop = agg(0).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getDouble(0), r.getLong(1)))
    assert(gTop == Seq((5.0, 20L), (3.0, 30L)))
    // ExpressionInfo carries the real implementation class per function
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED graft_simhash")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("SignatureExpressions"), desc)
    val descTopk = spark.sql("DESCRIBE FUNCTION EXTENDED graft_topk")
      .collect().map(_.getString(0)).mkString("\n")
    assert(descTopk.contains("TopKAggregate"), descTopk)
  }
}
