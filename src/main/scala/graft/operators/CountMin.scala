package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame-native
  * MERGEABLE frequency summary — the fixed-size companion to the
  * Misra-Gries heavy-hitter sketch (Sketches.scala): where MG keeps the
  * top-k candidates, CMS answers point frequency queries for ANY item
  * with a one-sided error (never under, over by ≤ e/w · N with
  * probability 1 − (1/2)^d).
  *
  * Shape: the d×w cell grid IS a grouped aggregation — cell (j, b) holds
  * the count of items whose j-th hash lands in bucket b, so building the
  * sketch is one `groupBy(j, b).count()` over a d-way narrow explode of
  * the item stream. Map-side partial aggregation collapses every
  * partition to ≤ d·w rows before the shuffle, the grid never exceeds
  * d·w rows total regardless of data volume, and because cells are
  * ADDITIVE the sketch merges across partitions, days, or streams by
  * summing cell-wise (the E6d HLL-rollup discipline; a streaming sink
  * would commit per-batch partial grids and fold them exactly like
  * `heavyHitterSink`'s counts).
  *
  * Determinism: bucket j of item t = the first two hex nibbles of
  * md5("j:" ++ t) — integer hex parsing, no RNG, replayable verbatim in
  * any engine with md5 (the stratified-sampling nibble discipline,
  * Sampling.scala).
  */
object CountMin {

  /** Bucket of `item` under hash row `j`: the first hex nibbles of
    * md5("j:item") parsed as an integer, reduced mod `w` — always enough
    * nibbles that 16ⁿ ≥ w (minimum 2, so the default w = 256 grid keeps
    * its historical identity mapping bit-for-bit), so no bucket is ever
    * structurally unreachable and the e/w error bound holds at any
    * width. When w does not divide 16ⁿ the modulo is biased — the low
    * buckets receive ⌈16ⁿ/w⌉ vs ⌊16ⁿ/w⌋ shares, ~2.4% skew at the
    * minimum nibble count for w = 1000 — so three EXTRA nibbles are
    * taken in that case, driving the skew below w/16ⁿ ≤ 6e-5 (widths
    * dividing a 16-power, 256 included, keep the exact unbiased minimum
    * mapping). Widths past 2²⁴ are rejected loudly rather than silently
    * degraded — a grid that wide has stopped being a sketch.
    */
  /** Hex-nibble count the [[bucket]] mapping reads for width `w` — the
    * SINGLE source of the rule, shared with every SQL oracle that
    * replays the mapping (Queries.cmsCountsSql derives its nibble count
    * from here, so a future non-256 width cannot silently diverge the
    * two engines' bucket assignment).
    */
  def nibblesFor(w: Int): Int = {
    require(w > 0 && w <= (1 << 24),
      s"CountMin width must be in [1, 2^24], got $w")
    var nibbles = 2
    while ((1L << (4 * nibbles)) < w) nibbles += 1
    if ((1L << (4 * nibbles)) % w != 0) nibbles += 3 // max 9, fits a long
    nibbles
  }

  def bucket(item: Column, j: Int, w: Int): Column = {
    val nibbles = nibblesFor(w)
    pmod(conv(
      substring(md5(concat_ws(":", lit(j.toString), item)), 1, nibbles),
      16, 10).cast("long"), lit(w.toLong))
  }

  /** Build the sketch: the (j, b, cnt) cell grid, ≤ d·w rows. */
  def sketch(items: DataFrame, itemCol: Column, d: Int = 4,
      w: Int = 256): DataFrame =
    items
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(itemCol, j, w).as("b"))): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** [[sketch]] from a pre-aggregated (item, weight) frame: cell (j, b)
    * sums the weights of items hashing there. Cell-identical to
    * sketching the raw stream (cells are sums over item occurrences;
    * grouping the addends per item first changes nothing — integer
    * addition is associative), so a vocabulary-sized count frame that
    * already exists for other aggs can feed the grid without a second
    * pass over the data.
    */
  def sketchWeighted(items: DataFrame, itemCol: Column, weightCol: Column,
      d: Int = 4, w: Int = 256): DataFrame =
    items
      .select(weightCol.as("_w"), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(itemCol, j, w).as("b"))): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(sum(col("_w")).as("cnt"))

  /** Point-frequency estimates for `probes` (any frame with `itemCol`):
    * est(t) = min over hash rows j of cell(j, bucket_j(t)) — the grid is
    * grid-sized, so it BROADCASTS to the probe side and the estimate is
    * one narrow join + min-agg whatever the probe count. Items absent
    * from the sketched stream estimate as the collision mass of their
    * cells (≥ 0, never negative); missing cells count as 0.
    */
  def estimate(cells: DataFrame, probes: DataFrame, itemCol: Column,
      d: Int = 4, w: Int = 256): DataFrame = {
    val jb = probes
      .withColumn("_jb", explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(itemCol, j, w).as("b"))): _*)))
      .select(probes.columns.toIndexedSeq.map(col) :+ col("_jb.j").as("_j")
        :+ col("_jb.b").as("_b"): _*)
    jb.join(broadcast(cells),
        jb("_j") === cells("j") && jb("_b") === cells("b"), "left")
      .groupBy(probes.columns.toIndexedSeq.map(jb(_)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
