package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key across two table versions
  * as unchanged / modified / deleted / inserted and count which columns
  * drifted — the data-diff every pipeline runs before trusting a rebuilt
  * table against its predecessor.
  *
  * Shape: ONE full-outer shuffled join on the key (both sides projected
  * to key + compared columns first), then a single hash agg over the
  * classification — nothing driver-side, no per-column re-scan (column
  * diffs are `sum(case)` counters inside the same agg).
  */
object Reconcile {

  /** Diff `left` (old) vs `right` (new) on `key`, comparing `cols`.
    * Returns one row: n_unchanged, n_modified, n_deleted, n_inserted,
    * and a `diff_<col>` count per compared column (among keys present in
    * both versions).
    */
  def snapshotDiff(left: DataFrame, right: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "snapshotDiff needs at least one compared column")
    val l = left.select(col(key).as("k"),
      struct(cols.map(col): _*).as("lrow"))
    val r = right.select(col(key).as("k"),
      struct(cols.map(col): _*).as("rrow"))
    val joined = l.join(r, Seq("k"), "full_outer")
    val inBoth = col("lrow").isNotNull && col("rrow").isNotNull
    val colDiffs = cols.map { c =>
      sum(when(inBoth &&
        !(col(s"lrow.$c") <=> col(s"rrow.$c")), 1L).otherwise(0L))
        .as(s"diff_$c")
    }
    val anyDiff = cols.map(c =>
      !(col(s"lrow.$c") <=> col(s"rrow.$c"))).reduce(_ || _)
    joined.agg(
      sum(when(inBoth && !anyDiff, 1L).otherwise(0L)).as("n_unchanged"),
      (sum(when(inBoth && anyDiff, 1L).otherwise(0L)).as("n_modified") +:
        (Seq(
          sum(when(col("rrow").isNull, 1L).otherwise(0L)).as("n_deleted"),
          sum(when(col("lrow").isNull, 1L).otherwise(0L)).as("n_inserted"))
          ++ colDiffs)): _*)
  }
}
