package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-group equi-width histogram of a numeric column: `bins` buckets
    * spanning each group's [min, max], the max landing in the last bin.
    *
    * Two aggregations: group extents (rows = |groups|, broadcast back onto
    * the fact — the fact table is never joined shuffled) then the binned
    * count. Bin index is single-row double arithmetic (`floor((v−lo)·bins
    * /(hi−lo))`) — no accumulation, so IEEE-identical in any engine and at
    * any parallelism. Degenerate groups (hi == lo) collapse to bin 0.
    */
  def histogram(df: DataFrame, group: Column, value: Column,
      bins: Int): DataFrame = {
    require(bins >= 1, "histogram needs bins >= 1")
    val extents = df.groupBy(group.as("g")).agg(
      min(value).cast("double").as("lo"), max(value).cast("double").as("hi"))
    val binned = df.select(group.as("g"), value.cast("double").as("v"))
      .join(broadcast(extents), "g")
      .select(col("g"),
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(floor((col("v") - col("lo")) * bins / (col("hi") - col("lo")))
            .cast("long"), lit(bins - 1L))).as("bin"),
        col("lo"), col("hi"))
    binned.groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("n"),
        (first(col("lo")) + col("bin") * (first(col("hi")) - first(col("lo")))
          / bins).as("bin_lo"))
  }

  /** Per-group winsorization census: exact interpolated percentiles
    * [pLo, pHi] per group, values clipped into that range, and the counts
    * of rows clipped at each side — the outlier-capping cleanup stage of a
    * numeric pipeline, reported per group so the caller can audit how much
    * the cap bit.
    *
    * Clipped mass is summed in DECIMAL(18,2) (exact, order-independent);
    * only the final value is cast to double — the engine-wide money-sum
    * rule (SURVEY §6). The percentile agg sorts per group once; the clip
    * pass re-joins the (broadcast, |groups|-row) cutoffs — the fact never
    * shuffles for the join.
    */
  def winsorize(df: DataFrame, group: Column, value: Column,
      pLo: Double, pHi: Double): DataFrame = {
    val cuts = df.groupBy(group.as("g")).agg(
      percentile(value, lit(pLo)).as("lo"),
      percentile(value, lit(pHi)).as("hi"))
    df.select(group.as("g"), value.cast("double").as("v"))
      .join(broadcast(cuts), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        first(col("lo")).as("p_lo"), first(col("hi")).as("p_hi"),
        sum(greatest(least(col("v"), col("hi")), col("lo"))
          .cast("decimal(18,2)")).cast("double").as("clipped_sum"))
  }
}
