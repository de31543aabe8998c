package graft

import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset path — the engine's answer to the reference's row-batch
  * serialization surface (`PageWritable.java`/`BufferWritable.java`):
  * case-class Encoders over Tungsten rows, no custom serialization code.
  */
final case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class TypedPathSpec extends AnyFunSuite with SparkFixture {

  test("Dataset[T] round-trips through Encoders and matches untyped agg") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val ds = li.select($"l_orderkey", $"l_quantity", $"l_returnflag").as[Line]
    val typed = ds.groupByKey(_.l_returnflag)
      .mapValues(_.l_quantity).reduceGroups(_ + _)
      .collect().toMap
    val untyped = li.groupBy($"l_returnflag")
      .sum("l_quantity").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < 1e-6 * math.max(1.0, math.abs(v)))
    }
  }
}
