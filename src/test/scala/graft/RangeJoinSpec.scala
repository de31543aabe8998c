package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("binned range-join count equals the naive |dt| <= W join") {
    // pairs straddling bin boundaries, exact-boundary dt, zero-match rows
    val left = Seq((1L, "u1", 1000L), (2L, "u1", 2500L), (3L, "u2", 100L),
      (4L, "u3", 9999L)).toDF("id", "k", "t")
    val right = Seq(("u1", 900L), ("u1", 1100L), ("u1", 2000L),
      ("u2", 600L), ("u2", 601L), ("u9", 100L)).toDF("k", "t")
    val w = 500L
    val got = RangeJoin.countWithin(left, $"k", $"t", $"id",
        right, $"k", $"t", w)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && abs($"l.t" - $"r.t") <= w, "left")
      .groupBy($"id").agg(sum(when($"r.t".isNotNull, 1L).otherwise(0L)).as("n"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === naive)
    // u2 at t=100: both 600 (inclusive boundary) and 601 (out) exercised
    assert(got.toMap.apply(3L) === 1L)
    assert(got.toMap.apply(4L) === 0L)
  }

  test("corpus equivalence: binned equals naive on events") {
    val ev = Tables.events(spark, sf)
    val errors = ev.where($"event_type" === "error")
    val clicks = ev.where($"event_type" === "click")
    val w = 300L * 1000000L
    val got = RangeJoin.countWithin(errors, $"user_id", unix_micros($"ts"),
        $"event_id", clicks, $"user_id", unix_micros($"ts"), w)
      .orderBy($"id").collect().toSeq
    val naive = errors.select($"event_id".as("id"), $"user_id".as("k"),
        unix_micros($"ts").as("lt"))
      .join(clicks.select($"user_id".as("k"), unix_micros($"ts").as("rt")),
        Seq("k"), "left")
      .groupBy($"id")
      .agg(sum(when($"rt".isNotNull && abs($"lt" - $"rt") <= w, 1L)
        .otherwise(0L)).as("n_matches"))
      .orderBy($"id").collect().toSeq
    assert(got === naive)
  }
}
