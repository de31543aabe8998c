package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-level per-group ranking — `row_number() OVER (PARTITION BY group
  * ORDER BY order)` without ever sorting one group in one task.
  *
  * A per-group window rank concentrates each group's FULL sort in a
  * single task — fine for many small groups, a wall for few wide ones
  * (5 market segments × 30M customers each). The two-level form is the
  * [[Chunking]] prefix-sum discipline applied to ranks:
  * range-partition on (group ++ order) so each task holds a contiguous
  * slice of every group it sees, rank locally per (task, group) slice,
  * and add each slice's offset — the count of same-group rows in earlier
  * range partitions. Because ranges are contiguous, a group spans
  * consecutive partitions and each internal partition boundary splits at
  * most one group, so the offsets frame is EXACTLY bounded by
  * |groups| + |partitions| − 1 rows (NOT |partitions × groups|) — it
  * broadcasts safely precisely in this operator's premise of few wide
  * groups. A caller with corpus-scale group cardinality should use the
  * plain per-group window rank instead (many small groups is the case
  * that form already parallelizes); the broadcast is the only
  * group-count-proportional site here.
  *
  * `order` must be a TOTAL order within each group (include a unique
  * tie-break key): equal keys split across a range boundary would
  * otherwise take partition-order-dependent ranks.
  */
object Ranks {

  def groupRankByRange(df: DataFrame, group: Seq[String],
      order: Seq[String], out: String = "rank"): DataFrame = {
    val all = (group ++ order).map(col)
    // two consumers (slice counts + the ranked output) — materialize the
    // range layout once
    val parts = df.repartitionByRange(all: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window
      .partitionBy(col("_pid") +: group.map(col): _*)
      .orderBy(order.map(col(_).asc): _*)
    val counts = parts
      .groupBy(col("_pid") +: group.map(col): _*)
      .agg(count(lit(1)).as("_c"))
    // offsets ride a window over the |partitions × groups| frame
    val wOff = Window.partitionBy(group.map(col): _*)
      .orderBy(col("_pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select(col("_pid") +: group.map(col) :+ col("_off"): _*)
    parts
      .join(broadcast(offsets), "_pid" +: group)
      .withColumn(out, col("_off") + row_number().over(wLocal).cast("long"))
      .drop("_pid", "_off")
  }

  /** Two-level per-group running WEIGHTED sum — `sum(weight) OVER
    * (PARTITION BY group ORDER BY order ROWS UNBOUNDED PRECEDING)`
    * without one task per group: the same range-partition + local-window
    * + broadcast-offset discipline as [[groupRankByRange]], with each
    * slice's offset being the sum of same-group WEIGHT in earlier range
    * partitions. The long-typed weight keeps partial sums exact across
    * slice boundaries (the engine determinism contract). Same total-
    * order requirement on `order` as the rank form.
    */
  def groupCumSumByRange(df: DataFrame, group: Seq[String],
      order: Seq[String], weight: String, out: String = "cum"): DataFrame = {
    val all = (group ++ order).map(col)
    val parts = df.repartitionByRange(all: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window
      .partitionBy(col("_pid") +: group.map(col): _*)
      .orderBy(order.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = parts
      .groupBy(col("_pid") +: group.map(col): _*)
      .agg(sum(col(weight)).as("_c"))
    val wOff = Window.partitionBy(group.map(col): _*)
      .orderBy(col("_pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select(col("_pid") +: group.map(col) :+ col("_off"): _*)
    parts
      .join(broadcast(offsets), "_pid" +: group)
      .withColumn(out, col("_off") + sum(col(weight)).over(wLocal))
      .drop("_pid", "_off")
  }
}
