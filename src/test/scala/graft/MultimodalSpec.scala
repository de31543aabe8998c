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

  test("real javax.imageio decode: PNG dimensions, channels, pixel hash") {
    // build real PNG payloads in-memory: a 7x5 RGB gradient and a 3x3
    // solid; plus one garbage payload that must fail soft, not kill the task
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val gradient = png(7, 5, (x, y) => (x * 37 << 16) | (y * 51 << 8) | 7)
    val solid = png(3, 3, (_, _) => 0x00112233)
    val df = Seq((1L, gradient), (2L, solid),
        (3L, "not-an-image".getBytes("UTF-8")))
      .toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.decodeImageBatch(df).collect()
      .map(m => m.id -> m).toMap
    assert(out(1L).ok && out(1L).width === 7L && out(1L).height === 5L &&
      out(1L).channels === 3L)
    assert(out(2L).ok && out(2L).width === 3L && out(2L).height === 3L)
    assert(!out(3L).ok && out(3L).width === -1L)
    // pixel hash is a pure function of pixels: re-encoding the same image
    // yields the same hash, different pixels a different one
    val again = Multimodal.decodeImageBatch(
      Seq((9L, png(7, 5, (x, y) => (x * 37 << 16) | (y * 51 << 8) | 7)))
        .toDF("doc_id", "payload")).head()
    assert(again.pixel_hash === out(1L).pixel_hash)
    assert(out(2L).pixel_hash !== out(1L).pixel_hash)
  }

  test("frame sampling: stride filters deterministic stub frame ids") {
    val frames = Seq((1L, "video-bytes")).toDF("id", "b")
      .select(Multimodal.stubFrameSample($"b".cast("binary"), 10).as("f"))
      .head().getSeq[Long](0)
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 10 === 0))
  }

  test("real javax.sound decode: WAV rate/channels/frames, pcm hash, failures") {
    def wav(rate: Float, channels: Int, frames: Int, seed: Long): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
        true, false)
      val pcm = new Array[Byte](frames * 2 * channels)
      var i = 0
      while (i < pcm.length) {
        pcm(i) = (((seed * 31 + i * 17) % 256) - 128).toByte; i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // truncated header: recognized container, malformed body — must record
    // ok=false, never throw (the NonFatal contract)
    val truncated = wav(8000f, 1, 10, 1L).take(16)
    val df = Seq((1L, wav(16000f, 2, 25, 7L)), (2L, wav(8000f, 1, 3, 9L)),
        (3L, "not-audio".getBytes("UTF-8")), (4L, truncated))
      .toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.decodeAudioBatch(df).collect().map(m => m.id -> m).toMap
    assert(out(1L).ok && out(1L).sample_rate === 16000L &&
      out(1L).channels === 2L && out(1L).frames === 25L)
    assert(out(2L).ok && out(2L).sample_rate === 8000L &&
      out(2L).channels === 1L && out(2L).frames === 3L)
    assert(!out(3L).ok && out(3L).sample_rate === -1L)
    assert(!out(4L).ok)
    // pcm hash is a pure function of the samples: same samples, same hash
    val again = Multimodal.decodeAudioBatch(
      Seq((9L, wav(16000f, 2, 25, 7L))).toDF("doc_id", "payload")).head()
    assert(again.pcm_hash === out(1L).pcm_hash)
    assert(out(2L).pcm_hash !== out(1L).pcm_hash)
  }
}
