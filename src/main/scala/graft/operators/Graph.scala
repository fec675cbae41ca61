package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based graph analytics over edge DataFrames — the d06-clusters
  * discipline (never a driver-side graph): each iteration is an
  * edges⋈ranks join + per-node partial-agg sum, so one round shuffles
  * |edges| contribution rows and |nodes| rank rows regardless of graph
  * shape, and lineage is truncated per round exactly like
  * [[Dedup.clusters]] / [[Similarity.kmeans]].
  */
object Graph {

  /** PageRank, fixed iterations (the deterministic fixed-round form an
    * external SQL oracle can unroll — convergence-threshold stopping
    * would make row content depend on float comparison order).
    * `edges` must carry (src, dst) one row per DIRECTED edge —
    * symmetrize first for undirected graphs. Nodes are defined by edge
    * endpoints (an isolated node has no edges to define it). Dangling
    * nodes cannot exist under that definition: every node has at least
    * one out-edge after symmetrization; for directed inputs with
    * sinks, their mass leaks per the simplified formulation — document
    * at the call site. The damping constants are computed IN-ENGINE
    * (`lit(1.0) - lit(damping)`) so an external oracle writing
    * `1 - 0.85` gets bit-identical doubles.
    * Output: node, pr (unrounded — round at the binding).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count() // one metadata scalar to the driver
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var pr = nodes.withColumn("pr", lit(1.0) / lit(n.toDouble))
    for (_ <- 1 to iters) {
      val contrib = e.join(pr, col("src") === col("node")).join(outdeg, "src")
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      pr = if (checkpoint) next.localCheckpoint(true) else next
    }
    pr
  }
}
