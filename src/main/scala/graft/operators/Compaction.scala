package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog compaction: reduce an append-only event/CDC stream to the
  * latest record per key.
  *
  * Implemented as a `max_by` hash aggregation, NOT a window: one shuffle on
  * the key, map-side partial aggregation, no per-key sort and nothing
  * spills at 100 TB (each partial state is a single row per key). The
  * window `row_number() = 1` formulation — which the oracle uses — sorts
  * every key group; at scale that is strictly worse.
  */
object Compaction {

  /** Latest row per key by `ord`. Make the ordering total (e.g. fold a
    * unique id into it) so ties are impossible and results deterministic.
    *
    * `ord` should be a single fixed-width orderable column (long/decimal):
    * those keep the max_by buffer hash-aggregable. A struct ordering works
    * but silently demotes the whole aggregation to SortAggregate — local
    * per-partition sorts of all data — which is the plan this operator
    * exists to avoid; pack compound orderings into a decimal instead
    * (exact up to 38 digits).
    */
  def latestByKey(df: DataFrame, key: Column, ord: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    require(payload.nonEmpty, "latestByKey needs at least one payload column")
    val aggs = payload.map { case (n, c) => max_by(c, ord).as(n) }
    df.groupBy(key.as("key")).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact decimal packing for two-part orderings: `major * 10^minorDigits
    * + minor`, both non-negative, `minor < 10^minorDigits`. Keeps max_by
    * hash-aggregable where a struct would not be.
    */
  def packedOrd(major: Column, minor: Column, minorDigits: Int): Column =
    major.cast("decimal(38,0)") * lit(math.pow(10, minorDigits).toLong)
      .cast("decimal(38,0)") + minor.cast("decimal(38,0)")
}
