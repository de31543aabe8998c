package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bitemporal point-in-time reconstruction — the two-axis time-travel
  * query of a corrected fact store: VALID time (when the fact was true
  * in the world) × TRANSACTION time (when we recorded it). "What did we
  * believe ON tx day T about the state AS OF valid day V" is the audit /
  * restatement question single-axis SCD2 (E13/E23's axis) cannot answer
  * — a retroactive correction rewrites history at an old valid time but
  * a NEW transaction time, and both views must remain reproducible.
  */
object Bitemporal {

  /** The state visible at (validAt, txAt): for each key, among rows with
    * `validFrom ≤ validAt` AND `txSeq ≤ txAt`, the row of the LATEST
    * (validFrom, txSeq) — newest valid version wins, and within a valid
    * version the newest recorded correction wins.
    *
    * Shape: ONE key-partitioned hash aggregation (`max_by` on the packed
    * (validFrom, txSeq) order — the E23 merge discipline, no window
    * sort); the two time predicates push down to the scan. Payload
    * columns ride a struct through the argmax.
    */
  def stateAt(df: DataFrame, key: Column, validFrom: Column, txSeq: Column,
      payload: Seq[(String, Column)], validAt: Column,
      txAt: Column): DataFrame = {
    val pay = struct(payload.map { case (n, c) => c.as(n) }: _*)
    df.where(validFrom <= validAt && txSeq <= txAt)
      .groupBy(key.as("k"))
      .agg(max_by(pay, struct(validFrom, txSeq)).as("_p"))
      .select(col("k") +: payload.map { case (n, _) =>
        col(s"_p.$n").as(n) }: _*)
  }
}
