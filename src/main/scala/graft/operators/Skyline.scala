package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D skyline (Pareto frontier, minimize both dims) — "the parts no
  * other part beats on BOTH price and size": the multi-criteria
  * shortlist operator (Börzsönyi et al., ICDE'01).
  *
  * The naive formulation is a quadratic self-join ("exists a row ≤ on
  * both dims, < on one"). In 2-D it collapses to running minima over one
  * sort: with rows ordered by x, a row is dominated iff
  *   - some row with STRICTLY smaller x has size ≤ its y (a value-RANGE
  *     frame ending 1 before the current x — rows tied on x are excluded,
  *     they can't dominate through x), or
  *   - some row with EQUAL x has strictly smaller y (the per-(group, x)
  *     minimum).
  * Duplicate (x, y) points are mutually non-dominating and all survive —
  * the standard skyline convention. One shuffle; both windows share the
  * group hash partitioning and the x sort.
  */
object Skyline {

  /** Rows of `df` on the per-group minimize-(x, y) frontier. `x` must be
    * integral-valued or exact (cents, sizes) — the dominance comparisons
    * are pure orderings, so any engine replays them identically.
    */
  def skyline2d(df: DataFrame, group: Column, x: Column,
      y: Column): DataFrame = {
    val byX = Window.partitionBy(group).orderBy(x.asc)
    val strictlyBefore = byX.rangeBetween(Window.unboundedPreceding, -1)
    val tiedOnX = Window.partitionBy(group, x)
    df.withColumn("_min_y_before", min(y).over(strictlyBefore))
      .withColumn("_min_y_tied", min(y).over(tiedOnX))
      .where((col("_min_y_before").isNull || col("_min_y_before") > y)
        && col("_min_y_tied") >= y)
      .drop("_min_y_before", "_min_y_tied")
  }
}
