package graft
import org.apache.spark.sql.SparkSession

/** Prints condensed physical-plan diagnostics for headline queries:
  * pushed filters, read schemas (column pruning), join strategies, and
  * whole-stage-codegen coverage. Run:
  *   sbt "runMain graft.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.registry.map(_.name)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      // Execute through the Dataset's OWN QueryExecution so AQE finalizes
      // this plan instance (a sink write would run a separate one and the
      // reported plan would be the never-executed initial plan). toRdd +
      // foreach streams without buffering results on the driver.
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("FileScan")).map { l =>
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(l).getOrElse("")
        val schema = "ReadSchema: [^,]*".r.findFirstIn(l).getOrElse("")
        s"  scan: $pushed $schema"
      }.toSeq
      val joins = plan.linesIterator.filter(_.contains("Join"))
        .map(_.trim.split(" ").take(2).mkString(" ")).toSeq.distinct
      val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSeq
      println(s"== $n  exchanges=$exchanges codegenSpans=${wsc.distinct.size}" +
        (if (plan.contains("isFinalPlan=false")) "  [plan not finalized]" else ""))
      scans.foreach(println)
      joins.foreach(j => println(s"  join: $j"))
    }
    spark.stop()
  }
}
