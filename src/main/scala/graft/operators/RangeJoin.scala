package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded time-window range join.
  *
  * The naive formulation — `JOIN ON key = key AND abs(lt - rt) <= W` — is an
  * equi-join only on `key`; on a hot key Spark degenerates to comparing all
  * L×R pairs. Binning makes the range predicate part of the shuffle key:
  * the right side lands in bucket `t div W`, the left side probes its own
  * bucket ± 1 (a 3× explode of the *narrow* probe rows, not the data), and
  * every true pair |lt − rt| ≤ W shares exactly one (key, bin) — found
  * once, counted once, no dedup. Shuffle fan-out is bounded by 3× the left
  * row count regardless of key skew, and AQE's skew-join split still
  * applies because the join is a plain equi-join on (key, bin).
  */
object RangeJoin {

  /** Count right-side rows within ± `windowUs` of each left row (by key).
    * Left rows with no matches are kept with count 0.
    * Output: (id, n_matches).
    */
  def countWithin(left: DataFrame, lKey: Column, lTime: Column, lId: Column,
      right: DataFrame, rKey: Column, rTime: Column,
      windowUs: Long): DataFrame = {
    val w = lit(windowUs)
    val lBin = call_function("div", lTime, w)
    val l = left.select(lId.as("id"), lKey.as("k"), lTime.as("lt"),
        explode(array(lBin - 1L, lBin, lBin + 1L)).as("bin"))
    val r = right.select(rKey.as("k"), rTime.as("rt"),
      call_function("div", rTime, w).as("bin"))
    l.join(r, Seq("k", "bin"), "left")
      .groupBy(col("id"))
      .agg(sum(when(col("rt").isNotNull && abs(col("lt") - col("rt")) <= w,
        1L).otherwise(0L)).as("n_matches"))
  }
}
