package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators Spark lacks as single calls, composed from
  * Catalyst primitives so pushdown/AQE still apply (SURVEY.md §2b).
  */
object Relational {

  /** Top-k rows per group by `order`, with a deterministic rank column.
    * `dense` switches row_number → dense_rank (k then bounds rank values,
    * not row count). One shuffle on the partition columns.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String], order: Seq[Column],
      k: Int, rankName: String = "rn", dense: Boolean = false): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    val rank = (if (dense) dense_rank() else row_number()).over(w).cast("long")
    df.withColumn(rankName, rank).filter(col(rankName) <= k)
  }

  /** Gap-based sessionization: marks session starts (`new_session`) and
    * assigns a per-entity `session_id` (running count of starts). One
    * shuffle on the entity column; state is a single lag per row.
    */
  def sessionize(df: DataFrame, entityCol: String, tsMillis: Column,
      tieBreak: Column, gapMillis: Long): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(tsMillis, tieBreak)
    val prev = lag(tsMillis, 1).over(w)
    val marked = df.withColumn("new_session",
      when(prev.isNull || tsMillis - prev > gapMillis, 1L).otherwise(0L))
    marked.withColumn("session_id",
      sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** AS-OF join: for each left row, the single most-recent right row with
    * rightTs <= leftTs on the same key (ties on rightTs broken by max
    * rightId). Spark has no native ASOF operator; a join + argmax would
    * materialize every (left × all-prior-right) pair before aggregating —
    * quadratic under a heavy-tail key. Instead: union both sides, one
    * window per key ordered by (ts, side, rightId) with a running
    * `last(rightId) ignore nulls` — right rows sort before left rows at
    * equal ts, so each left row reads its match off the running value.
    * ONE shuffle on the key, zero fan-out, ids never packed/bounded.
    * Left rows with no prior right row are dropped (inner-asof semantics).
    * Output: one row per left row — leftId, asof_<rightId>.
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String): DataFrame = {
    val lidT = left.schema(leftId).dataType
    val ridT = right.schema(rightId).dataType
    val r = right.select(col(rightKey).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), lit(null).cast(lidT).as("_lid"), col(rightId).as("_rid"))
    val l = left.select(col(leftKey).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), col(leftId).as("_lid"), lit(null).cast(ridT).as("_rid"))
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_asof", last(col("_rid"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_asof").isNotNull)
      .select(col("_lid").as(leftId), col("_asof").as("asof_" + rightId))
  }
}
