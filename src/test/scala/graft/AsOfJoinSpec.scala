package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("asOf picks latest right <= left time; null when none precedes") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 20L, 901L), (2L, 50L, 902L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(left, $"k", $"t", right, $"k", $"t",
        Seq("rid" -> $"rid"))
      .orderBy($"lid").collect()
    // lid=100 at t=10: right at t=10 qualifies (<=, equal-time matches)
    assert(out(0).getAs[Long]("right_rid") === 900L)
    // lid=101 at t=25: latest is t=20
    assert(out(1).getAs[Long]("right_rid") === 901L)
    // lid=102 at t=5: nothing precedes
    assert(out(2).isNullAt(out(2).fieldIndex("right_rid")))
  }

  test("asOfPacked over packDim matches asOf exactly (incl. nulls and unmatched keys)") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L),
        (3L, 99L, 103L)) // key 3 absent from the dim entirely
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 20L, 901L), (2L, 50L, 902L),
        (1L, 20L, 899L)) // tie at (1,20) must reduce identically
      .toDF("k", "t", "rid")
    val viaUnion = AsOfJoin.asOf(left, $"k", $"t", right, $"k", $"t",
        Seq("rid" -> $"rid"))
      .orderBy($"lid").collect().toSeq
    val packed = AsOfJoin.packDim(right, $"k", $"t", Seq("rid" -> $"rid"))
    val viaProbe = AsOfJoin.asOfPacked(left, $"k", $"t", packed)
      .orderBy($"lid").collect().toSeq
    assert(viaProbe === viaUnion)
  }

  test("packDim fails loudly on a hot key past maxVersions, naming the key") {
    // a key updated far beyond the versions-per-entity premise must not
    // silently become one giant row a single task has to hold
    val right = ((1 to 10).map(i => (7L, i.toLong, i * 100L)) :+
        (8L, 1L, 900L)).toDF("k", "t", "rid")
    val e = intercept[Exception] {
      AsOfJoin.packDim(right, $"k", $"t", Seq("rid" -> $"rid"),
        maxVersions = 4).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("asOfPacked.packDim: key 7"), msg)
    // the same frame packs fine at the default bound, key 8 untouched
    val ok = AsOfJoin.packDim(right, $"k", $"t", Seq("rid" -> $"rid"))
      .collect()
    assert(ok.length === 2)
  }

  test("right-side timestamp ties reduce deterministically (max payload)") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 900L), (1L, 5L, 903L), (1L, 5L, 901L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(left, $"k", $"t", right, $"k", $"t",
      Seq("rid" -> $"rid")).collect()
    assert(out.head.getAs[Long]("right_rid") === 903L)
  }
}
