package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B probe for the t30 training loop variants (not part of the
  * driver contract): times each round of the perceptron under (a) the
  * broadcast weight join, (b) the dense literal-array lookup, so a
  * regression can be attributed to a phase instead of guessed at.
  *
  *   runMain graft.tools.TrainProbe [sfDir]
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExpressions.register(spark)
    import graft.operators.{Sampling, TextAnalysis}
    val dim = 1024
    val rounds = 8
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val isTr = Sampling.hashBucket(col("doc_id"), 100, "t30:") < 80
    val pos = TextAnalysis.qualityExpr(col("text")) >= 0.79
    val df = docs.filter(isTr)
    val Scramble = graft.functions.Signatures.Scramble
    val P = graft.functions.TextFunctions.P

    def feats0: DataFrame = df.select(col("doc_id").as("_id"),
        when(pos, 1L).otherwise(-1L).as("_y"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("_tok"))
      .select(col("_id"), col("_y"),
        ((graft.functions.GraftExpressions.polyHash(col("_tok")) * Scramble) % P % dim).as("bucket"))
      .groupBy("_id", "_y", "bucket").agg(count(lit(1)).as("_c"))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val session = spark
    import session.implicits._

    def runJoin(): Unit = {
      val feats = feats0.persist()
      var w = Map.empty[Long, Long]
      for (r <- 1 to rounds) t(s"join round $r") {
        val wDf = w.toSeq.toDF("bucket", "_wt")
        val mis = feats.join(broadcast(wDf), Seq("bucket"), "left")
          .groupBy("_id", "_y")
          .agg(sum(col("_c") * coalesce(col("_wt"), lit(0L))).as("_m"))
          .filter((when(col("_m") > 0, 1L).otherwise(-1L)) =!= col("_y"))
          .select("_id")
        val delta = feats.join(mis, "_id")
          .groupBy("bucket").agg(sum(col("_y") * col("_c")).as("_d"))
          .collect()
        w = delta.foldLeft(w) { (m, row) =>
          val b = row.getLong(0)
          m.updated(b, m.getOrElse(b, 0L) + row.getLong(1))
        }
      }
      feats.unpersist(blocking = false)
      println(s"  [probe] join weights nonzero: ${w.count(_._2 != 0)}")
    }

    def runDense(): Unit = {
      val feats = feats0.persist()
      var w = Map.empty[Long, Long]
      for (r <- 1 to rounds) t(s"dense round $r") {
        val arr = new Array[Long](dim)
        w.foreach { case (b, v) => arr(b.toInt) = v }
        val wAt = element_at(typedlit(arr.toSeq), (col("bucket") + 1L).cast("int"))
        val mis = feats
          .groupBy("_id", "_y")
          .agg(sum(col("_c") * wAt).as("_m"))
          .filter((when(col("_m") > 0, 1L).otherwise(-1L)) =!= col("_y"))
          .select("_id")
        val delta = feats.join(mis, "_id")
          .groupBy("bucket").agg(sum(col("_y") * col("_c")).as("_d"))
          .collect()
        w = delta.foldLeft(w) { (m, row) =>
          val b = row.getLong(0)
          m.updated(b, m.getOrElse(b, 0L) + row.getLong(1))
        }
      }
      feats.unpersist(blocking = false)
      println(s"  [probe] dense weights nonzero: ${w.count(_._2 != 0)}")
    }

    // r14: the per-doc (bucket, count) profile shape — margin as one
    // compiled pass (graft_bucket_margin), delta as the round's only
    // exchange; must produce identical weights to the dense variant
    var docsW = Map.empty[Long, Long]
    def runDocs(): Unit = {
      val docs = feats0
        .groupBy("_id", "_y")
        .agg(collect_list(struct(col("bucket"), col("_c"))).as("_bc"))
        .select(col("_y"), col("_bc"))
        .persist()
      var w = Map.empty[Long, Long]
      for (r <- 1 to rounds) t(s"docs round $r") {
        val arr = new Array[Long](dim)
        w.foreach { case (b, v) => arr(b.toInt) = v }
        val margin = graft.functions.GraftExpressions.bucketMargin(
          col("_bc"), typedlit(arr.toSeq))
        val delta = docs
          .filter((when(margin > 0, 1L).otherwise(-1L)) =!= col("_y"))
          .select(col("_y"), explode(col("_bc")).as("_x"))
          .groupBy(col("_x.bucket").as("bucket"))
          .agg(sum(col("_y") * col("_x._c")).as("_d"))
          .collect()
        w = delta.foldLeft(w) { (m, row) =>
          val b = row.getLong(0)
          m.updated(b, m.getOrElse(b, 0L) + row.getLong(1))
        }
      }
      docs.unpersist(blocking = false)
      docsW = w
      println(s"  [probe] docs weights nonzero: ${w.count(_._2 != 0)}")
    }

    t("DENSE variant total")(runDense())
    t("DOCS variant total")(runDocs())
    t("DENSE variant total 2")(runDense())
    t("DOCS variant total 2")(runDocs())
    t("JOIN variant total")(runJoin())
    spark.stop()
  }
}
