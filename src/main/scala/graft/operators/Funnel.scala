package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-step funnel analysis: for an ordered list of step event types,
  * count how many users complete each prefix of the sequence in strict
  * temporal order (step k's event must be strictly after the user's
  * step-(k−1) completion time — the earliest one, which maximizes
  * completions and makes the semantics order-canonical).
  *
  * Shape — ONE full-data shuffle, like [[Cohort]]: the (user, type, ts)
  * projection is repartitioned by user once; every per-step aggregation
  * (`min(ts) where type = step AND ts > prev`) and every join back of the
  * per-user step-time frame is keyed on user, so all of them reuse that
  * exchange (`HashPartitioning(u)` satisfies every downstream
  * distribution). Step count is a query constant, so the plan is a fixed
  * k-stage chain, each stage's right side a |users|-row frame. The final
  * count is a single global agg row.
  */
object Funnel {

  /** Per-step completion counts: (step index 1-based, event_type,
    * n_users). A user counts for step k if they have the full ordered
    * chain through k.
    */
  def steps(events: DataFrame, user: Column, eventType: Column,
      ts: Column, stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    val byUser = events
      .select(user.as("u"), eventType.as("et"), unix_micros(ts).as("t"))
      .repartition(col("u"))
    // fold: stepTimes(k) = per-user min t of step-k events after t_{k-1}
    var prev: DataFrame = null // (u, t_prev) completions of the last step
    val counts = stepTypes.zipWithIndex.map { case (st, i) =>
      val candidates =
        if (prev == null) byUser.where(col("et") === st)
        else byUser.where(col("et") === st)
          .join(prev, "u").where(col("t") > col("t_prev"))
          .select(col("u"), col("et"), col("t"))
      val completed = candidates.groupBy(col("u"))
        .agg(min(col("t")).as("t_prev"))
      prev = completed
      (i + 1, st, completed)
    }
    counts.map { case (i, st, completed) =>
      completed.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(st).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** First-order Markov transition matrix of the per-user event sequence:
    * for each (from_type, to_type) adjacent pair, the transition count and
    * empirical probability P(to | from).
    *
    * Shape: ONE fact shuffle — the `lead` window keys on user, and the
    * (from, to) count agg collapses map-side to the |types|² grid before
    * its (tiny) exchange. The per-from normalization window runs on that
    * grid, not the fact. `ts` ties are broken by `tieBreak` (a unique id)
    * so the sequence — and thus the matrix — is deterministic.
    * Probability is one int/int IEEE division on exact counts.
    */
  def transitions(events: DataFrame, user: Column, eventType: Column,
      ts: Column, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(user).orderBy(ts.asc, tieBreak.asc)
    val grid = events
      .withColumn("_next", lead(eventType, 1).over(byUser))
      .where(col("_next").isNotNull)
      .groupBy(eventType.as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    grid.withColumn("p_next",
        col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
  }
}
