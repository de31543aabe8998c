package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join: for every left row, attach the latest right row
  * with the same key whose time is ≤ the left time — the classic
  * event-enrichment operator Spark has no native node for.
  *
  * Spark-first composition (one shuffle, no range explosion): tag and union
  * both sides, sort within key by (time, side) — right rows before left rows
  * at equal time, matching ASOF `>=` semantics — then a window
  * `last(right payload, ignoreNulls)` carries the most recent right row
  * forward onto each left row. Cost: one hash shuffle on the key + one
  * sort — the same shape a dedicated SortMerge-AsOf physical operator would
  * have, so a custom SparkPlan would only shave the union/filter overhead.
  *
  * Right rows are first reduced to one per (key, time) (max payload struct,
  * deterministic) so timestamp ties cannot produce engine-dependent matches.
  */
object AsOfJoin {

  /** Returns every left row plus `right_<name>` payload columns (null when
    * no right row precedes it).
    */
  def asOf(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq

    // deterministic tie reduction: one right row per (key, t)
    val r0 = right.select(rightKey.as("_k"), rightTime.as("_t"),
      struct(payload.map { case (n, c) => c.as(n) }: _*).as("_pay"))
      .groupBy(col("_k"), col("_t")).agg(max(col("_pay")).as("_pay"))
    val payTypes = r0.schema("_pay").dataType.asInstanceOf[StructType]
    val leftTypes = left.schema

    val l = left.select(
      (leftKey.as("_k") +: leftTime.as("_t") +: lit(1).as("_side") +:
        leftCols.map(c => left(c).as(c))) ++
        payTypes.map(f => lit(null).cast(f.dataType).as(s"_p_${f.name}")): _*)
    val r = r0.select(
      (col("_k") +: col("_t") +: lit(0).as("_side") +:
        leftTypes.map(f => lit(null).cast(f.dataType).as(f.name)).toSeq) ++
        payTypes.map(f => col(s"_pay.${f.name}").as(s"_p_${f.name}")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("*") +: payTypes.map(f =>
        last(col(s"_p_${f.name}"), ignoreNulls = true).over(w)
          .as(s"right_${f.name}")).toSeq: _*)
    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payTypes.map(f => col(s"right_${f.name}")): _*)
  }
}
