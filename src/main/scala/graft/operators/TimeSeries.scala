package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window and time-weighted aggregates over the event timeline.
  */
object TimeSeries {

  /** Distinct users per trailing `windowDays`-day window, one row per day
    * in the data range.
    *
    * Shape: the raw fact collapses to distinct (user, day) FIRST (one
    * shuffle, output ≤ |users|×|days| — orders of magnitude under the
    * event count); the window explode (each active day contributes to
    * `windowDays` target days) runs on that reduced frame, narrow; the
    * re-distinct + count is a shuffle of the exploded small frame. The
    * naive alternative — exploding raw events — multiplies the FACT by
    * the window width; this multiplies the distinct frame only.
    * Trailing windows past the last data day are cut by a broadcast
    * one-row max-day bound (partial leading windows are reported — the
    * standard trailing-window convention).
    */
  def rollingDistinct(events: DataFrame, user: Column, ts: Column,
      periodUs: Long, windowDays: Int): DataFrame = {
    val day = call_function("div", unix_micros(ts), lit(periodUs))
    val ud = events.select(user.as("u"), day.as("d")).distinct()
    val maxDay = ud.agg(max(col("d")).as("max_d"))
    ud.select(col("u"), explode(sequence(col("d"),
        col("d") + lit(windowDays - 1))).as("td"))
      .distinct()
      .join(broadcast(maxDay), col("td") <= col("max_d"))
      .groupBy(col("td").as("day_bucket"))
      .agg(count(lit(1)).as(s"n_users_${windowDays}d"))
  }

  /** Per-user time-weighted average of `value`: each observation is
    * weighted by its holding time in WHOLE SECONDS (the gap to the
    * user's next event, µs integer-divided by 1e6); the last observation
    * has no gap and drops, and users whose total weighted time truncates
    * to zero produce no row.
    *
    * Determinism: value is quantized to decimal(18,2); value × gap sums
    * exactly in decimal (order-independent), and only the final
    * weighted-sum / total-gap division runs in double. Seconds (not µs)
    * keep both aggregate magnitudes under 2⁵³, so the decimal→double
    * casts are EXACT in every engine — a µs weighting pushed the sums to
    * 17 significant digits, where Spark's correctly-rounded
    * BigDecimal→double and DuckDB's int128-scaled conversion disagree in
    * the last ulp (observed: 31/150 rows off by one ulp at sf0.01).
    * `ts` must be unique per user — a lead over tied timestamps is
    * partitioning-dependent in any engine. ONE shuffle: the `lead`
    * window and the per-user aggregation share the user_id hash
    * partitioning.
    */
  def twap(events: DataFrame, user: Column, ts: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = unix_micros(ts)
    val withGap = events
      .select(user.as("u"), t.as("t"), value.cast("decimal(18,2)").as("v"))
      .withColumn("gap", call_function("div",
        lead(col("t"), 1).over(
          Window.partitionBy(col("u")).orderBy(col("t"))) - col("t"),
        lit(1000000L)))
      .where(col("gap").isNotNull)
    withGap.groupBy(col("u"))
      .agg(count(lit(1)).as("n_obs"),
        // gap as decimal(18,0): the (37,2) product is exact — uncapped —
        // in both engines (a raw long operand would cap at precision 38)
        sum(col("v") * col("gap").cast("decimal(18,0)")).as("vw"),
        sum(col("gap")).as("tw"))
      .where(col("tw") > 0)
      .select(col("u"), col("n_obs"),
        (col("vw").cast("double") / col("tw").cast("double")).as("twap"))
  }
}
