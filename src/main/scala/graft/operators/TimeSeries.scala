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

  /** Seasonal-naive anomaly screen: each day's count against the mean of
    * the previous `lookback` SAME-WEEKDAY counts — the baseline that
    * survives weekly seasonality, which a plain trailing mean flags as
    * anomalies every weekend.
    *
    * Exactness: the baseline comparison is kept in integers — ratio =
    * (n·lookback)/Σprev as ONE int/int double division, and the anomaly
    * flag |ratio−1| > `tolerance` is a fixed double chain. Only days with
    * a full lookback window report. Shape: one fact shuffle (the daily
    * count agg); both windows run on the |days| frame partitioned by
    * weekday.
    */
  def seasonalResiduals(events: DataFrame, ts: Column, lookback: Int = 4,
      tolerance: Double = 0.5, dayUs: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = call_function("div", unix_micros(ts), lit(dayUs))
    val daily = events.groupBy(day.as("day_bucket"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow", pmod(col("day_bucket"), lit(7L)))
    val w = Window.partitionBy(col("dow")).orderBy(col("day_bucket"))
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("sum_prev", sum(col("n_events")).over(w))
      .withColumn("n_prev", count(lit(1)).over(w))
      .where(col("n_prev") === lookback)
      .withColumn("ratio",
        (col("n_events") * lit(lookback.toLong)).cast("double")
          / col("sum_prev").cast("double"))
      .withColumn("anomaly",
        when(abs(col("ratio") - lit(1.0)) > lit(tolerance), 1L)
          .otherwise(0L))
      .select(col("day_bucket"), col("dow"), col("n_events"),
        col("sum_prev"), col("ratio"), col("anomaly"))
  }

  /** Trailing `windowDays`-row correlation between two daily count
    * series — "do purchases still track views this month?" — the E29
    * exact-sufficient-statistics discipline applied per window: the five
    * sums accumulate over INTEGER daily counts inside ROWS frames (exact
    * at any size), and only each row's closed form runs in double. Days
    * with an incomplete window drop. One fact shuffle (the daily
    * conditional-count agg); all five windows share one |days|-frame sort.
    */
  def rollingCorr(events: DataFrame, ts: Column, typeCol: Column,
      typeA: String, typeB: String, windowDays: Int = 30,
      dayUs: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = call_function("div", unix_micros(ts), lit(dayUs))
    val daily = events
      .where(typeCol.isin(typeA, typeB))
      .groupBy(day.as("day_bucket"))
      .agg(sum(when(typeCol === typeA, 1L).otherwise(0L)).as("na"),
        sum(when(typeCol === typeB, 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy(col("day_bucket"))
      .rowsBetween(-(windowDays - 1), 0)
    val k = lit(windowDays.toLong)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sa", sum(col("na")).over(w))
      .withColumn("sb", sum(col("nb")).over(w))
      .withColumn("sab", sum(col("na") * col("nb")).over(w))
      .withColumn("saa", sum(col("na") * col("na")).over(w))
      .withColumn("sbb", sum(col("nb") * col("nb")).over(w))
      .where(col("cnt") === k)
      .select(col("day_bucket"), col("na"), col("nb"),
        ((k * col("sab") - col("sa") * col("sb")).cast("double") /
          (sqrt((k * col("saa") - col("sa") * col("sa")).cast("double")) *
           sqrt((k * col("sbb") - col("sb") * col("sb")).cast("double"))))
          .as(s"corr_${windowDays}d"))
  }

  /** Two-sided CUSUM change-point series over a (bucket, value) frame —
    * the Page (1954) drift detector for ingest monitoring ("did daily
    * volume shift regime, not just spike?"; the E56 residuals catch
    * single-day anomalies, CUSUM catches sustained level changes).
    *
    * The textbook form is a sequential recurrence
    * (s_i = max(0, s_{i-1} + y_i)) no window function expresses
    * directly; it DOES close over prefix sums: with p_i = Σ_{j≤i} y_j,
    *   max(0, s_{i-1} + y_i) unrolls to  s_i = p_i − min(0, min_{j≤i} p_j)
    * and the mirrored lower side is  t_i = max(0, max_{j≤i} p_j) − p_i —
    * so the whole series is TWO running extrema over one prefix-sum
    * window (shared sort, |buckets| frame — dimension-sized, like the
    * E46 sweep line). All-integer: deviations are scaled by n
    * (y_i = n·x_i − Σx, no mean division), so every engine computes the
    * identical BIGINT series and the flag threshold compares in scaled
    * units.
    */
  def cusum(series: DataFrame, bucket: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = series.select(bucket.as("bucket"), value.as("x"))
    val tot = base.agg(sum(col("x")).as("t"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.crossJoin(broadcast(tot))
      .withColumn("p", sum(col("x") * col("n") - col("t")).over(w))
      .select(col("bucket"), col("x"),
        (col("p") - least(min(col("p")).over(w), lit(0L))).as("cusum_up"),
        (greatest(max(col("p")).over(w), lit(0L)) - col("p")).as("cusum_dn"))
  }
}
