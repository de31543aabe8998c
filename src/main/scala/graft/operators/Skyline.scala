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

  /** Rows of `df` on the per-group minimize-(x, y) frontier. `x` MUST be
    * an integer-typed column (byte/short/int/long, or decimal with scale
    * 0) — integer CENT counts, not decimal dollars: the strict-
    * predecessor frame is `rangeBetween(…, -1)`, and "current x minus 1"
    * only excludes exactly the x-ties when consecutive x values differ
    * by ≥ 1. A fractional x (1.49 vs 1.50) would leave dominated rows in
    * the gap `(x−1, x)` outside the frame and wrongly keep them, so
    * non-integer x types are rejected up front.
    */
  def skyline2d(df: DataFrame, group: Column, x: Column,
      y: Column): DataFrame = {
    val xType = df.select(x.as("_x")).schema.head.dataType
    val xIntegral = xType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    require(xIntegral,
      s"skyline2d needs an integer-typed x (got $xType): the -1 range " +
        "frame is only tie-exact when x values are whole numbers")
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
