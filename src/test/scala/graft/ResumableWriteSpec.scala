package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.ResumableWrite

/** Cross-job partial-done recovery (`AttemptState.java:1-170` semantics at
  * the Spark layer): a partitioned write that crashes mid-run must leave
  * completed waves durable, resume by writing ONLY the missing waves, and
  * skip everything on a third pass.
  */
class ResumableWriteSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_resume_spec_")
    d.toFile.deleteOnExit()
    d.toString
  }

  // through Tables.events, NOT a raw parquet read: the session's
  // nanosAsLong=true delivers raw `ts` as a long of nanoseconds, which
  // bucket() must reject (see the type-guard test below) — Tables.events
  // converts it to the engine's canonical µs timestamp
  private def data = Tables.events(spark, sf).select(col("ts"), col("value"))
  private def bucket =
    graft.operators.TimePartitioning.bucket(
      col("ts"), graft.operators.TimePartitioning.Day)

  test("pass 1 crashes after 2 of 4 waves; only those waves are durable") {
    // fixture self-check (the r9 failure mode made waves 0-2 empty and
    // the assertions vacuous): the corpus must actually populate several
    // waves, or the fixture — not the component — is broken
    val residues = data
      .select(pmod(bucket, lit(4)).as("r")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(residues.size >= 2, s"fixture degenerate: wave residues $residues")
    val out = freshDir()
    val caught = intercept[ResumableWrite.InjectedFault] {
      ResumableWrite.run(spark, data, bucket, out, waves = 4, pass = 1,
        failAfterWaves = Some(2))
    }
    assert(caught.afterWaves === 2)
    assert(ResumableWrite.completedWaves(spark, out) === Set(0, 1))
    // every durable bucket belongs to a committed wave — nothing from the
    // crashed wave leaked into the visible layout
    val buckets = ResumableWrite.readBack(spark, out)
      .select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0))
    assert(buckets.nonEmpty)
    assert(buckets.forall(b => b % 4 == 0 || b % 4 == 1))
  }

  test("resume writes only missing waves; third pass skips everything") {
    val out = freshDir()
    intercept[ResumableWrite.InjectedFault] {
      ResumableWrite.run(spark, data, bucket, out, waves = 4, pass = 1,
        failAfterWaves = Some(2))
    }
    val resumed = ResumableWrite.run(spark, data, bucket, out,
      waves = 4, pass = 2)
    assert(resumed === 2) // exactly the two waves the crash left unwritten
    // skip proof: a completed layout resumes to zero work
    assert(ResumableWrite.run(spark, data, bucket, out, waves = 4,
      pass = 3) === 0)
    // manifest: every bucket written exactly once, by the expected pass
    val m = ResumableWrite.manifest(spark, out)
      .select(col("bucket").cast("long").as("b"), col("pass"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(m.map(_._1).distinct.length === m.length)
    assert(m.forall { case (b, p) => p === (if (b % 4 < 2) 1 else 2) })
    // resumed layout is bit-identical (same per-bucket rows) to a direct
    // unfaulted write
    val direct = freshDir()
    ResumableWrite.run(spark, data, bucket, direct, waves = 4, pass = 1)
    val a = ResumableWrite.readBack(spark, out)
      .select(col("bucket").cast("long").as("bucket"), col("ts"), col("value"))
    val b = ResumableWrite.readBack(spark, direct)
      .select(col("bucket").cast("long").as("bucket"), col("ts"), col("value"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() === data.count())
  }

  test("wave re-run after manifest-append crash window is idempotent") {
    val out = freshDir()
    // simulate the crash BETWEEN a wave's data commit and its manifest
    // append: write wave 0's data directly, leave no manifest, then run —
    // wave 0 re-runs (dynamic overwrite replaces its leaves) and the final
    // layout carries no duplicates
    val w0 = data.withColumn("bucket", bucket)
      .where(pmod(col("bucket"), lit(4)) === lit(0))
    w0.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(out)
    val wrote = ResumableWrite.run(spark, data, bucket, out, waves = 4,
      pass = 1)
    assert(wrote === 4) // no manifest → all four waves run
    assert(ResumableWrite.readBack(spark, out).count() === data.count())
  }

  test("empty waves are recorded complete — the skip contract holds") {
    // only wave-0 buckets survive the filter, so waves 1-3 write zero
    // rows; completion must come from the per-wave marker, not manifest
    // rows, or the empty waves re-run on every subsequent pass
    val out = freshDir()
    val sliver = data.where(
      pmod(graft.operators.TimePartitioning.bucket(
        col("ts"), graft.operators.TimePartitioning.Day), lit(4)) === lit(0))
    assert(ResumableWrite.run(spark, sliver, bucket, out, waves = 4,
      pass = 1) === 4)
    assert(ResumableWrite.completedWaves(spark, out) === Set(0, 1, 2, 3))
    assert(ResumableWrite.run(spark, sliver, bucket, out, waves = 4,
      pass = 2) === 0)
    // manifest reads back with its explicit schema even though three wave
    // subdirs hold no data rows
    assert(ResumableWrite.manifest(spark, out)
      .select(col("wave")).distinct().count() === 1)
  }

  test("empty FIRST wave: manifest read-back before any data has landed") {
    // only wave-2 buckets survive, so waves 0 and 1 are empty BEFORE any
    // data exists in outDir — the wave-0 manifest read-back sees a layout
    // holding nothing but _SUCCESS and must read it as empty under the
    // explicit schema, not throw 'Unable to infer schema for Parquet'
    val out = freshDir()
    val sliver = data.where(
      pmod(graft.operators.TimePartitioning.bucket(
        col("ts"), graft.operators.TimePartitioning.Day), lit(4)) === lit(2))
    assert(sliver.count() > 0, "fixture degenerate: no wave-2 rows")
    assert(ResumableWrite.run(spark, sliver, bucket, out, waves = 4,
      pass = 1) === 4)
    assert(ResumableWrite.completedWaves(spark, out) === Set(0, 1, 2, 3))
    assert(ResumableWrite.run(spark, sliver, bucket, out, waves = 4,
      pass = 2) === 0)
    // the one populated wave's manifest slice carries the right counts
    val m = ResumableWrite.manifest(spark, out)
      .select(col("bucket"), col("n_rows"), col("wave")).collect()
    assert(m.nonEmpty && m.forall(_.getInt(2) === 2))
    assert(m.map(_.getLong(1)).sum === sliver.count())
  }
}
