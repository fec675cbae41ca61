package graft
import org.apache.spark.sql.SparkSession

/** Full executed-plan dump for one query (PlanAudit prints the condensed
  * audit; this prints everything). `sbt "runMain graft.DumpPlan <name>"`.
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.queryExecution.toRdd.foreach(_ => ())
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
