package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention: bucket every user by first-activity period, then
  * count how many of each cohort are still active N periods later — the
  * canonical product-analytics rollup over an event stream.
  *
  * Shape — ONE full-data shuffle: the (user, period) projection is
  * repartitioned by user once, and everything downstream reuses that
  * exchange. `HashPartitioning(u)` satisfies `ClusteredDistribution` for
  * any superset of keys, so the first-seen `min` agg (keys = u), the
  * distinct-activity agg (keys = (u, p)), AND the cohort ⋈ activity join
  * (key = u) all plan with zero additional exchanges — only the final
  * (cohort, offset) rollup shuffles again, over |users × active periods|
  * rows, orders of magnitude smaller than the input. Because (user,
  * period) is distinct and each user has exactly one cohort, the final
  * `count(*)` IS `count_distinct(user)` — no distinct agg at the end.
  * (`repartition` is by-column only — no pinned partition count — so AQE
  * still right-sizes it.)
  */
object Cohort {

  /** Retention matrix of `events`: rows (cohort_period, offset, n_users),
    * period = floor-div of the µs epoch by `periodUs`.
    */
  def retention(events: DataFrame, user: Column, ts: Column,
      periodUs: Long): DataFrame = {
    val period = call_function("div", unix_micros(ts), lit(periodUs))
    val byUser = events.select(user.as("u"), period.as("p"))
      .repartition(col("u"))
    val cohorts = byUser.groupBy(col("u")).agg(min(col("p")).as("cohort_p"))
    val active = byUser.distinct()
    active.join(cohorts, "u")
      .groupBy(col("cohort_p"), (col("p") - col("cohort_p")).as("offset_p"))
      .agg(count(lit(1)).as("n_users"))
  }
}
