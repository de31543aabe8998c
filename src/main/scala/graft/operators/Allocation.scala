package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Proportional integer allocation with largest-remainder rounding —
  * the financial-ETL primitive behind "spread this order-level discount /
  * tax / rebate across its lines so the cents add up exactly".
  *
  * Floating-point proration loses or invents cents; the largest-remainder
  * method (Hamilton apportionment) is the standard exact fix: each line
  * gets ⌊budget·w/Σw⌋, and the leftover cents go one each to the lines
  * with the largest division remainders. Everything is 64-bit integer
  * arithmetic — bit-identical at any parallelism, in any engine.
  */
object Allocation {

  /** Allocate `budget` (integer units, one value per key group) across the
    * group's rows proportionally to non-negative integer `weight`.
    * Deterministic tie-break for equal remainders: ascending `ord`.
    * Emits the input columns plus `allocated` and `bumped` (0/1).
    *
    * Shape: ONE shuffle on `key`; the group-total window, the base-sum
    * window, and the remainder-ranked row_number all share the same hash
    * partitioning, and the two plain windows piggyback on the ranked
    * window's sort. Per-key state is one group's rows — no driver math,
    * no second pass. Overflow bound: budget·weight must fit in a long
    * (callers with >9.2e18 products should pre-scale weights).
    */
  def largestRemainder(df: DataFrame, key: Column, ord: Column,
      weight: Column, budget: Column): DataFrame = {
    val byKey = Window.partitionBy(key)
    val ranked = byKey.orderBy(col("_rem").desc, ord.asc)
    df.withColumn("_tot", sum(weight).over(byKey))
      .withColumn("_base",
        call_function("div", budget * weight, col("_tot")))
      .withColumn("_rem", (budget * weight) % col("_tot"))
      .withColumn("_rank", row_number().over(ranked))
      .withColumn("_left", budget - sum(col("_base")).over(byKey))
      .withColumn("bumped",
        when(col("_rank") <= col("_left"), 1L).otherwise(0L))
      .withColumn("allocated", col("_base") + col("bumped"))
      .drop("_tot", "_base", "_rem", "_rank", "_left")
  }
}
