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

  test("profile: nulls excluded from distinct/range, one row per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (1.0, 2.0), (3.0, null), (null, 2.0))
      .toDF("a", "b")
    val out = graft.operators.Profile.numeric(df, Seq("a", "b"))
      .orderBy($"col_name").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    val a = out(0); val b = out(1)
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((4L, 3L, 2L)))
    assert((a.getDouble(4), a.getDouble(5)) === ((1.0, 3.0)))
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((4L, 2L, 1L)))
    assert((b.getDouble(4), b.getDouble(5)) === ((2.0, 2.0)))
    // one aggregation job: a single scan feeds the profile (no per-column
    // re-scan of the source)
    val plan = graft.operators.Profile.numeric(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert("Scan ExistingRDD|LocalTableScan".r.findAllIn(plan).length <= 1)
  }

  test("zValue: matches the reference interleave, and z-layout bounds " +
      "2-D boxes where a 1-D sort cannot") {
    import spark.implicits._
    import graft.operators.ZOrder
    def zRef(a: Long, b: Long): Long =
      (0 until 16).map(i => ((((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1)))).reduce(_ | _)
    val pts = for (a <- 0L to 40L; b <- 0L to 40L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", bits = 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) => assert(got((a, b)) === zRef(a, b)) }
    // layout claim: partition by z, each partition's (a, b) bounding box
    // is TIGHT in both dims; partition by a alone, the b-extent of every
    // partition spans the whole domain — so a 2-D box predicate can skip
    // most z-partitions but no a-partitions on footer-style stats
    def boxes(sorted: org.apache.spark.sql.DataFrame) = sorted
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"a"), max($"a"), min($"b"), max($"b"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val df = pts.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", bits = 16).as("z"))
    val zParts = boxes(df.repartitionByRange(16, $"z")
      .sortWithinPartitions($"z"))
    val aParts = boxes(df.repartitionByRange(16, $"a")
      .sortWithinPartitions($"a"))
    // box query selective in the NON-sort dim: b in [8,11], a unbounded —
    // the a-sorted layout cannot prune it at all, z-order can
    def overlaps(p: (Long, Long, Long, Long)) =
      p._3 <= 11 && p._4 >= 8
    val zTouched = zParts.count(overlaps)
    val aTouched = aParts.count(overlaps)
    assert(zTouched < aTouched,
      s"z-layout touched $zTouched of ${zParts.length}, " +
        s"a-sort touched $aTouched of ${aParts.length}")
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

  test("IVF k-means refinement: deterministic, keeps cell ids, exact search") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val r1 = IvfIndex.refine(e, nCells = 8, rounds = 2)
      .orderBy($"id").collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val r2 = IvfIndex.refine(e, nCells = 8, rounds = 2)
      .orderBy($"id").collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(r1.toSeq === r2.toSeq)                    // deterministic
    assert(r1.map(_._1).toSeq === (0L until 8L))     // seed ids preserved
    assert(r1.forall(_._2.length === 64))            // dimensionality kept
    // refined centroids still drive an exact-in-cell search
    val refined = IvfIndex.refine(e, nCells = 8, rounds = 1)
    val assigned = IvfIndex.assign(e, refined)
    assert(assigned.count() === e.count())
    val brute = graft.operators.Similarity
      .bruteForceTopK(e.where($"id" < 3), e, k = 50)
      .select($"query_id", $"neighbor_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val withRefined = {
      val probes = e.where($"id" < 3)
      // same search path as annTopK but against refined centroids
      val idx = IvfIndex.assign(e, refined)
      probes.select($"id".as("query_id"), $"vec".as("q_vec"))
        .crossJoin(broadcast(refined.select($"id".as("cell"), $"vec".as("c_vec"))))
        .select($"query_id", $"q_vec", $"cell",
          graft.operators.Similarity.cosine($"q_vec", $"c_vec").as("aff"))
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy($"query_id").orderBy($"aff".desc, $"cell")))
        .where($"rn" <= 3).select($"query_id", $"q_vec", $"cell")
        .join(idx, "cell").where($"query_id" =!= $"id")
        .select($"query_id",
          $"id".as("neighbor_id"),
          graft.operators.Similarity.cosine($"q_vec", $"vec").as("cos"))
        .collect()
    }
    assert(withRefined.nonEmpty)
    withRefined.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .foreach(want => assert(r.getDouble(2) === want))
    }
  }

  test("knn_label equals the broadcast-corpus brute-force formulation") {
    // the registered query broadcasts the QUERY side (100 TB shape); the
    // baseline broadcasts the corpus — both must agree exactly
    val e = Tables.embeddings(spark, sf)
    val got = Queries.knnLabel(spark, sf)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = e.where($"vec_id" < 50)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val c = e.where($"vec_id" >= 50)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val want = graft.operators.Similarity.bruteForceTopK(q, c, k = 1)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.size === 50)
  }

  test("sample_exact_n: exactly min(N, stratum size) rows, deterministic") {
    val out1 = Queries.sampleExactN(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out2 = Queries.sampleExactN(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out1.toSeq === out2.toSeq) // content-hash order = replayable
    val sizes = out1.groupBy(_._2).map { case (l, rs) => l -> rs.length }
    val langSizes = Tables.documents(spark, sf).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (l, n) =>
      assert(n === math.min(25L, langSizes(l)), s"lang $l")
    }
  }

  test("corpus_freq_score: every doc scored, bounds hold, near-dups agree") {
    val out = Queries.corpusFreqScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.size === nDocs) // distinct bigrams exist for every doc
    // df of any bigram is in [1, nDocs] ⇒ so is its mean
    assert(out.values.forall(s => s >= 1.0 && s <= nDocs.toDouble))
    assert(out.values.toSeq.distinct.size > 1) // a real signal, not constant
    // docs with identical normalized text (⇒ identical bigram sets) must
    // score identically: check via the fingerprint groups if any exist
    val groups = Tables.documents(spark, sf)
      .groupBy(graft.operators.TextAnalysis.fingerprint($"text").as("fp"))
      .agg(collect_list($"doc_id").as("ids"))
      .where(size($"ids") > 1).select($"ids").collect()
      .map(_.getSeq[Long](0))
    groups.foreach { ids =>
      assert(ids.map(out).distinct.size === 1, s"ids $ids")
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
