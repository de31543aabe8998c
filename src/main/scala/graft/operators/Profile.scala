package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the stats a pipeline operator (or a human)
  * needs before trusting a new drop of data: row counts, null counts,
  * exact distincts, and numeric ranges per column.
  *
  * ONE aggregation job computes every column's stats (Catalyst plans the
  * multi-distinct via a single Expand: rows are replicated per distinct
  * column, then one shuffle — cost scales with `cols.length × rows`, the
  * standard exact-multi-distinct trade; at 100 TB swap
  * `approx_count_distinct` in where tolerance allows and Expand drops
  * out). The wide single-row result unpivots to one row per column via
  * `stack` — no second scan, no driver loop over columns.
  */
object Profile {

  /** Profile `cols` (numeric/castable-to-double) of `df`: one output row
    * per column — n_rows, n_nonnull, n_distinct (exact, nulls excluded),
    * min/max as double.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols
      .map(c => s"'$c', __n, `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nonnull, n_distinct, min_v, max_v)"))
  }
}
