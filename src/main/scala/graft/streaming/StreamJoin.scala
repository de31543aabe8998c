package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the remaining Structured Streaming join surface
  * after windowed aggs (E7), arbitrary state (E8), and streaming dedup
  * (E8b): correlating TWO live streams row-to-row, e.g. funnel/attribution
  * ("view followed by purchase within N hours, per user").
  *
  * Scale shape: both sides shuffle once on the equi-key (user), and the
  * time-RANGE predicate bounds the join state — each side buffers only
  * rows younger than (watermark + window) per key, so StateStore size is
  * `arrival_rate × (watermark + window)`, independent of total stream
  * length. Without the range condition a stream-stream join would have to
  * buffer each side forever; the watermark is what lets Spark evict.
  */
object StreamJoin {

  /** Inner funnel join on one event stream: every `firstType` event paired
    * with the same user's `thenType` events in `[ts, ts + within]`.
    * `events` must be a STREAMING frame with `user_id`, `ts` (timestamp),
    * `event_id`, `event_type`. Emits `a_user/a_ts/a_id` (the `firstType`
    * side), `b_ts/b_id` (the `thenType` side). Both branches carry their
    * own watermark — state for a side is evicted once its event time
    * falls `watermark` behind, which also upper-bounds how late a
    * matching row may arrive.
    */
  def funnel(events: DataFrame, firstType: String, thenType: String,
      within: String, watermark: String = "12 hours"): DataFrame = {
    val a = events.where(col("event_type") === firstType)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("a_id"))
      .withWatermark("a_ts", watermark)
    val b = events.where(col("event_type") === thenType)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"))
      .withWatermark("b_ts", watermark)
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"interval $within"))
  }
}
