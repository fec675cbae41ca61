package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Every verifiable query the engine ships (SURVEY.md §2b/§2c). */
  def registry: Seq[QueryDef] =
    graft.queries.Relational.queries ++
    graft.queries.Text.queries ++
    graft.queries.Dedup.queries ++
    graft.queries.Similarity.queries ++
    graft.queries.Multimodal.queries ++
    graft.queries.PipelineQueries.queries ++
    graft.queries.Sampling.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_local_supplier")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** Registry restricted by an optional comma-separated name filter —
    * the SPARK_GRAFT_QUERIES contract SHARED by Bench and Verify (one
    * definition so the two tools cannot drift): unknown names fail
    * loudly (a typo must not run zero queries behind a success-shaped
    * output), and the registry is built exactly once per call.
    */
  def filtered(filter: Option[String]): Seq[QueryDef] = {
    val all = registry
    filter match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = want.diff(all.map(_.name).toSet)
        require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
        all.filter(q => want(q.name))
      case None => all
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
