package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.{Event, SessionOut}

/** Streaming state machinery: sessions must carry across microbatches
  * (state survives between triggers) and close only when a later batch
  * brings a gap-exceeding event.
  */
class StreamingStateSpec extends AnyFunSuite with SparkFixture {

  test("session state carries across microbatches and closes on gap") {
    import spark.implicits._
    implicit val s = spark
    val input = MemoryStream[Event](spark)
    val q = StatefulSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("graft_state_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val us = 1000000L
      // batch 1: two events 10 min apart → one open session, nothing emitted
      input.addData(Event(7L, 1L, 0L), Event(7L, 2L, 600L * us))
      q.processAllAvailable()
      assert(spark.table("graft_state_test").count() === 0)
      // batch 2: an event 31 min later → closes session 1 (2 events)
      input.addData(Event(7L, 3L, 600L * us + StatefulSessionize.GapUs + us))
      q.processAllAvailable()
      val out = spark.table("graft_state_test").as[SessionOut].collect()
      assert(out.length === 1)
      assert(out.head.user_id === 7L)
      assert(out.head.session_idx === 1L)
      assert(out.head.n_events === 2L)
      assert(out.head.closed)
    } finally q.stop()
  }
}
