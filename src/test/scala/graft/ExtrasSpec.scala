package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.IvfIndex
import graft.pipeline.{ConfigJson, Pipeline}
import graft.streaming.StatefulSessionize

class ExtrasSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("JSON config parses the reference's config surface") {
    val cfg = ConfigJson.parse(s"""{
      "in": {"path": "$sf/events.parquet"},
      "filters": [
        {"type": "where", "predicate": "value > 5"},
        {"type": "rename", "from": "event_type", "to": "etype"},
        {"type": "select", "cols": ["event_id", "etype", "value"]}
      ],
      "partitioning": {"column": "ts", "unit": "hour",
                       "map_side_partition_split": 4},
      "reducers": 8,
      "stop_on_invalid_record": true
    }""")
    assert(cfg.transforms.length === 3)
    assert(cfg.partitioning.get.unit === "hour")
    assert(cfg.partitioning.get.mapSidePartitionSplit === 4)
    assert(cfg.reducers === Some(8))
    assert(cfg.stopOnInvalidRecord)
    val df = Pipeline.plan(spark, cfg)
    assert(df.columns.toSeq === Seq("event_id", "etype", "value"))
    assert(df.count() > 0)
  }

  test("stateful streaming sessionize matches the batch sessionize") {
    implicit val s = spark
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("t_us"))
      .as[StatefulSessionize.Event]
    // batch-mode run of the same state function (Spark supports
    // flatMapGroupsWithState on batch Datasets: state starts empty)
    val stateful = StatefulSessionize.sessions(events).collect()
      .map(o => (o.user_id, o.session_idx) -> (o.n_events, o.start_us, o.end_us))
      .toMap
    val batch = Queries.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // closed sessions must agree exactly; the trailing open session per
    // user is emitted by batch but still open in state-land — allow it
    stateful.foreach { case (k, v) => assert(batch(k) === v) }
    assert(stateful.nonEmpty)
  }

  test("IVF ANN: probes restrict candidates, scores stay exact") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val brute = graft.operators.Similarity
      .bruteForceTopK(e.where($"id" < 5), e, k = 50)
      .select($"query_id", $"neighbor_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = IvfIndex.annTopK(e.where($"id" < 5), e, k = 5,
      nCells = 16, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"cos").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .foreach(want => assert(r.getDouble(2) === want))
    }
  }

  test("mapPartitions batch decode: deterministic, distributed, typed") {
    val payloads = Multimodal.withPayload(
      Tables.documents(spark, sf).limit(50), $"text", "image")
    val feats = Multimodal.decodeBatch(payloads).collect()
    assert(feats.length === 50)
    assert(feats.forall(_.feature.length === 8))
    val again = Multimodal.decodeBatch(payloads).collect()
      .map(f => f.id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.id) === f.feature.toSeq))
  }
}
