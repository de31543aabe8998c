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

  /** Latest row per key by `ord` (a struct column for compound orderings —
    * make it total, e.g. include a unique id, so ties are impossible and
    * results deterministic). `payload` columns are carried via max_by.
    */
  def latestByKey(df: DataFrame, key: Column, ord: Column,
      payload: Seq[(String, Column)]): DataFrame =
    df.groupBy(key.as("key"))
      .agg(max(ord).as("_ord"),
        payload.map { case (n, c) => max_by(c, ord).as(n) }: _*)
      .drop("_ord")
}
