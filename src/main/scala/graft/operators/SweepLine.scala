package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interval-concurrency analytics via the sweep-line (+1/−1 delta) trick.
  *
  * "How many intervals are open at once" is an interval-stabbing problem;
  * the join formulation (`probe ⋈ intervals ON t BETWEEN s AND e`) explodes
  * quadratically. The sweep line reduces it to a SORTED RUNNING SUM over
  * ±1 deltas — but a single global `SUM() OVER (ORDER BY t)` window is the
  * one-partition antipattern (the whole timeline funnels through one task).
  * The scalable form is the two-level prefix sum used by `Chunking`:
  * per-day running sums in parallel (window partitioned by day) plus a
  * day-level carry-in computed on the |days|-sized frame — the only
  * ordered-unpartitioned window runs over days, a dimension, not data.
  */
object SweepLine {

  /** Max number of concurrently-open `[startUs, endUs]` (closed, µs)
    * intervals, reported per day bucket (`t div dayUs`). Only days that
    * contain at least one interval endpoint appear (concurrency cannot
    * change — and so cannot peak anew — on silent days). On days that DO
    * appear, the start-of-day carry-in plateau is a candidate for the
    * max alongside every endpoint value: a day whose only events are
    * interval ENDS still reports the morning plateau it opened with,
    * not the post-close trough.
    *
    * Shape: endpoints → net delta per distinct timestamp (one hash agg —
    * simultaneous starts/ends collapse BEFORE any sort, making the running
    * sum tie-free and deterministic); per-day carry-in from the day-total
    * frame; within-day prefix sums partitioned by day. Two shuffles of the
    * endpoint frame (|2·intervals| collapsing to distinct timestamps),
    * nothing keyed on a single partition except the |days| window.
    */
  def maxConcurrency(intervals: DataFrame, startUs: Column, endUs: Column,
      dayUs: Long = 86400000000L): DataFrame = {
    val deltas = intervals
      .select(explode(array(
        struct(startUs.cast("long").as("t"), lit(1L).as("d")),
        struct((endUs.cast("long") + lit(1L)).as("t"), lit(-1L).as("d"))))
        .as("e"))
      .groupBy(col("e.t").as("t"))
      .agg(sum(col("e.d")).as("delta"))
      .withColumn("day", call_function("div", col("t"), lit(dayUs)))
    // carry-in per day: cumulative sum of PRIOR days' totals. The ordered
    // unpartitioned window is safe here: it runs on the |days|-sized frame.
    val carry = deltas.groupBy(col("day")).agg(sum(col("delta")).as("dd"))
      .withColumn("carry_in", coalesce(sum(col("dd")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("carry_in"))
    val byDay = Window.partitionBy(col("day")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(broadcast(carry), "day")
      .withColumn("conc", col("carry_in") + sum(col("delta")).over(byDay))
      .groupBy(col("day").as("day_bucket"))
      // greatest(conc, carry_in): the start-of-day plateau competes with
      // every endpoint value, so an all-negative-delta day reports the
      // level it opened at instead of its post-close trough.
      .agg(max(greatest(col("conc"), col("carry_in")))
        .as("max_concurrency"))
  }
}
