package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style micro profiler for operator internals (kept unlisted;
  * not part of the driver contract).
  */
object TimeParts {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.sources.Tables
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isNotNull)
      .withColumn("day", to_date(col("ts")))
    t("warm count")(ev.count())
    // basket build only
    val pts0 = ev.select(col("event_type"), col("day"),
      floor(unix_millis(col("ts")).cast("double") * 1.0 + 0.5).as("_cx"),
      floor(col("value") * 100.0 + 0.5).as("_cy"))
      .filter(col("_cx").isNotNull && col("_cy").isNotNull)
    val baskets = pts0.groupBy("event_type", "day")
      .agg(sort_array(collect_list(struct(col("_cx").as("x"), col("_cy").as("y")))).as("_pts"))
      .repartition(32)
    t("baskets only")(baskets.write.format("noop").mode("overwrite").save())
    (1 to 3).foreach { i =>
      t(s"full theilSen $i")(graft.operators.Relational.theilSen(
        ev, Seq("event_type", "day"), unix_millis(col("ts")), col("value"),
        maxN = 2000, scaleX = 1L, scaleY = 100L)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
