package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("payload + metadata struct: bytes, md5, modality") {
    val df = Multimodal.withPayload(
      Seq((1L, "abc")).toDF("id", "txt"), $"txt", "text")
    val r = df.select($"meta.modality", $"meta.num_bytes", $"meta.content_md5")
      .head()
    assert(r.getString(0) === "text")
    assert(r.getInt(1) === 3)
    assert(r.getString(2) === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("stub decode is deterministic and resize respects max side") {
    val df = Multimodal.withPayload(
      Tables.documents(spark, sf).limit(20), $"text", "image")
      .withColumn("dec", Multimodal.stubDecodeImage($"payload"))
      .withColumn("small", Multimodal.stubResize($"dec", 256))
    val rows = df.select($"dec.width", $"dec.height",
      $"small.width", $"small.height").collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 1920)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 1080)
      assert(r.getLong(2) <= 256 && r.getLong(3) <= 256)
    }
    // determinism: same payload → same stub decode
    val again = df.select($"dec.width").collect().map(_.getLong(0))
    assert(again.toSeq === rows.map(_.getLong(0)).toSeq)
  }

  test("frame sampling: stride filters deterministic stub frame ids") {
    val frames = Seq((1L, "video-bytes")).toDF("id", "b")
      .select(Multimodal.stubFrameSample($"b".cast("binary"), 10).as("f"))
      .head().getSeq[Long](0)
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 10 === 0))
  }
}
