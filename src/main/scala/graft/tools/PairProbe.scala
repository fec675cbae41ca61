package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B probe: the nested transform/flatten HOF pair expansion vs
  * the native PairExplode generator, on the real q81/q92 basket volumes
  * (~13M pairs at sf0.1), interleaved in one JVM so ambient load cancels.
  *
  *   runMain graft.tools.PairProbe [sfDir]
  */
object PairProbe {
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
    graft.functions.PairExplode.register(spark)
    val baskets = graft.sources.Tables(spark, sfDir, "orders")
      .join(graft.sources.Tables(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("_e"), col("l_partkey").as("_i"))
      .groupBy("_e").agg(sort_array(collect_set(col("_i"))).as("_items"))
      .filter(size(col("_items")).between(2, 60))
      .repartition(32)
      .localCheckpoint(true)
    val n = size(col("_items"))
    def hof = baskets.select(explode(flatten(transform(sequence(lit(0), n - 2), i =>
        transform(sequence(i + 1, n - 1), j =>
          struct(element_at(col("_items"), i + 1).as("a"),
            element_at(col("_items"), j + 1).as("b")))))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(count(lit(1)).as("c"))
    def gen = baskets.select(graft.functions.PairExplode.pairExplode(col("_items")))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"  [pairprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (r <- 1 to 3) {
      t(s"HOF round $r")(hof.write.format("noop").mode("overwrite").save())
      t(s"GEN round $r")(gen.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
