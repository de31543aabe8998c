package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Custom streaming state: gap-based sessionization via
  * `flatMapGroupsWithState` — the engine's arbitrary-state surface (the
  * streaming twin of the batch `sessionize` operator, and the pattern any
  * user-defined streaming aggregation plugs into).
  */
object StatefulSessionize {

  final case class Event(user_id: Long, event_id: Long, t_us: Long)
  final case class SessionState(sessionIdx: Long, lastUs: Long,
    nEvents: Long, startUs: Long)
  final case class SessionOut(user_id: Long, session_idx: Long,
    n_events: Long, start_us: Long, end_us: Long, closed: Boolean)

  val GapUs: Long = 1800L * 1000000L

  /** Per-user state transition: events arrive (within a microbatch, sorted
    * here), sessions close when the gap exceeds 30 min; closed sessions are
    * emitted immediately, the open one on timeout/availableNow end.
    */
  def updateUser(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.t_us, e.event_id))
    var cur = state.getOption.orNull
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      cur match {
        case null =>
          cur = SessionState(1L, e.t_us, 1L, e.t_us)
        case s if e.t_us - s.lastUs > GapUs =>
          out += SessionOut(userId, s.sessionIdx, s.nEvents, s.startUs,
            s.lastUs, closed = true)
          cur = SessionState(s.sessionIdx + 1, e.t_us, 1L, e.t_us)
        case s =>
          cur = s.copy(lastUs = e.t_us, nEvents = s.nEvents + 1)
      }
    }
    if (cur != null) state.update(cur)
    out.result().iterator
  }

  /** Wire the state function over a (streaming or batch) typed event set. */
  def sessions(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** availableNow drain of the sessionizer over a parquet landing dir into
    * batch-id-keyed parquet (overwrite per batch — replay-idempotent, same
    * sink contract as `StreamingIngest.incrementalDedupSink`). Successive
    * drains over one checkpoint resume the per-user open-session state, so
    * a caller can land more files and drain again.
    */
  def drainToDir(spark: SparkSession, landing: String, schema: StructType,
      ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    // one drain harness in the codebase: delegate to the generic helper
    StreamingIngest.drainAppendToDir(spark, landing, schema,
      df => sessions(df.as[Event])(spark).toDF(), ckpt, outDir)
  }
}
