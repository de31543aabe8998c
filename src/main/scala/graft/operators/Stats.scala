package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-decimal second-moment statistics: per-group Pearson correlation
  * and sample covariance whose results are BIT-IDENTICAL at any
  * parallelism and in any engine.
  *
  * Built-in `corr`/`covar_samp` merge running double moments across
  * partitions — the merge order changes with partitioning, so the last
  * ulps of the result do too, and a hash-equality oracle flakes. Here the
  * five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are summed in
  * DECIMAL — exact, order-independent — and only the one final closed-form
  * expression runs in double, a fixed-order scalar computation replayed
  * verbatim in the oracle (the engine money-sum rule generalized to
  * second moments).
  *
  * Scale shape: ONE hash aggregation with map-side partials (five decimal
  * sums + a count per group — fixed-width buffer, HashAggregate all the
  * way); nothing else. Inputs are quantized to decimal(18,2)/(18,0) by the
  * caller-visible contract, so products fit decimal(38,*) exactly.
  */
object Stats {

  /** Per-group n, correlation, sample covariance of (x, y). `x` is
    * quantized at 2 decimals, `y` must be integral-valued (counts, hours,
    * buckets — the common profiling pairing).
    */
  def corrExact(df: DataFrame, group: Column, x: Column,
      y: Column): DataFrame = {
    val xd = x.cast("decimal(18,2)")
    val yd = y.cast("decimal(18,0)")
    df.groupBy(group.as("g"))
      .agg(count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * yd).as("sxy"),
        sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
      .select(col("g"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
             .cast("double")))).as("corr"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")).as("covar_samp"))
  }

  /** Per-group simple linear regression (y ~ x) from the same
    * decimal-exact sufficient statistics as [[corrExact]]: slope,
    * intercept, and R². Built-in `regr_slope`/`regr_intercept` merge
    * double moments in partition order (ulp-unstable); here every
    * aggregate is decimal and only the fixed-order closed forms run in
    * double — each decimal operand crosses to double exactly ONCE, and
    * R² is composed from the already-double numerator/denominators (the
    * decimal n·Σxy−ΣxΣy squared would overflow decimal(38) at corpus
    * scale). Same scale shape: ONE HashAggregate, fixed-width buffer.
    * `x` integral-valued, `y` quantized at 2 decimals.
    */
  def olsExact(df: DataFrame, group: Column, x: Column,
      y: Column): DataFrame = {
    val xd = x.cast("decimal(18,0)")
    val yd = y.cast("decimal(18,2)")
    val sNum = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val sDen = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val yDen = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = sNum / sDen
    df.groupBy(group.as("g"))
      .agg(count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * yd).as("sxy"),
        sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
      .select(col("g"), col("n"),
        slope.as("slope"),
        ((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double")).as("intercept"),
        (sNum * sNum / (sDen * yDen)).as("r2"))
  }

  /** Pearson chi-square independence test over the `rowKey` × `colKey`
    * contingency table: one row (chi2, dof, n_rows, n_cells).
    *
    * Exactness discipline: observed and marginal counts are integers;
    * each cell's expected value e = r·c/n and term (o−e)²/e run a FIXED
    * chain of double ops on exactly-representable integer inputs. The
    * final Σ term would be partition-order-dependent as a plain double
    * `sum`, so the (tiny — |rows|×|cols|) term set is sorted by cell key
    * and LEFT-FOLDED inside one row (`sort_array` + `aggregate`), making
    * the statistic bit-identical at any parallelism and replayable via
    * DuckDB's `list(… ORDER BY …)` + `list_reduce` — the cosine-fold
    * discipline applied to a statistic. EMPTY cells (absent key pairs)
    * contribute (0−e)²/e like the textbook definition: the marginal
    * cross-grid is generated and left-joined, not just observed cells.
    *
    * Scale: one count aggregation over the fact; everything after runs
    * on marginal-sized frames (broadcast). dof = (R−1)(C−1).
    */
  def chiSquare(df: DataFrame, rowKey: Column, colKey: Column): DataFrame = {
    val cells = df.groupBy(rowKey.as("r"), colKey.as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("r")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("c")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("r")).as("nr"), count_distinct(col("c")).as("nc"))
    val grid = rt.crossJoin(ct).crossJoin(broadcast(tot))
      .join(cells, Seq("r", "c"), "left")
      .select(col("r"), col("c"), col("n"), col("nr"), col("nc"),
        coalesce(col("o"), lit(0L)).cast("double").as("od"),
        (col("rt").cast("double") * col("ct").cast("double") /
          col("n").cast("double")).as("e"))
      .select(col("r"), col("c"), col("n"), col("nr"), col("nc"),
        ((col("od") - col("e")) * (col("od") - col("e")) / col("e"))
          .as("term"))
    grid.groupBy(col("n"), col("nr"), col("nc"))
      .agg(sort_array(collect_list(struct(col("r"), col("c"), col("term"))))
        .as("ts"))
      .select(
        expr("aggregate(ts, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
          .as("chi2"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        col("n").as("n_rows"),
        (col("nr") * col("nc")).as("n_cells"))
  }
}
