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
    * rightTs <= leftTs on the same key. Spark has no native ASOF operator;
    * composed as an equi-join on the key plus a range predicate and a
    * deterministic argmax (ts packed with the id: id must stay < idBound).
    * The equi-join keeps the shuffle keyed on the join key only.
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String,
      idBound: Long = 1000000L): DataFrame =
    left.join(right,
        left(leftKey) === right(rightKey) && right(rightTs) <= left(leftTs))
      .groupBy(left(leftId))
      .agg((max(right(rightTs) * idBound + right(rightId)) % idBound).as("asof_" + rightId))
}
