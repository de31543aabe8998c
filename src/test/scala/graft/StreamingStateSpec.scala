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

  test("the same stateful query runs unchanged on the RocksDB state " +
      "store (the off-heap escape hatch for 1M+ keys per executor)") {
    import spark.implicits._
    implicit val s = spark
    // config-level swap BASELINE.md r11 cites: identical query code, the
    // state backend moves off-heap — this pins that the swap actually
    // runs (provider class resolves, state survives microbatches)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark)
      val q = StatefulSessionize.sessions(input.toDS())
        .writeStream.format("memory").queryName("graft_rocksdb_test")
        .outputMode(OutputMode.Append()).start()
      try {
        val us = 1000000L
        input.addData(Event(9L, 1L, 0L), Event(9L, 2L, 600L * us))
        q.processAllAvailable()
        assert(spark.table("graft_rocksdb_test").count() === 0)
        input.addData(Event(9L, 3L, 600L * us + StatefulSessionize.GapUs + us))
        q.processAllAvailable()
        val out = spark.table("graft_rocksdb_test").as[SessionOut].collect()
        assert(out.length === 1)
        assert(out.head.n_events === 2L)
        assert(out.head.closed)
        // it really was RocksDB: the provider reports rocksdb custom
        // metrics in the streaming progress
        val metricKeys = q.recentProgress.flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet.toArray(Array.empty[String]))
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb metrics in ${metricKeys.take(20).toSeq}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
