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

  test("real frame-sampled video: length-prefixed PNG container, stride " +
      "sampling, corrupted payloads fail soft") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 7 frames of 4x3: stride 3 samples frames 0, 3, 6
    val vid7 = Multimodal.encodeVideo((0 until 7).map(f =>
      png(4, 3, (x, y) => (f << 16) | (x << 8) | y)))
    val vid1 = Multimodal.encodeVideo(Seq(png(2, 2, (x, y) => x + y)))
    val truncated = vid7.take(vid7.length - 5)  // last frame cut mid-PNG
    // garbage in a SAMPLED slot (frame 0) must fail soft; garbage in a
    // skipped slot is never decoded at all — the container's length index
    // makes skipping a seek, which is the whole point of frame sampling
    val garbageSampled = Multimodal.encodeVideo(
      Seq("not-a-png-frame".getBytes("UTF-8"), png(2, 2, (_, _) => 1)))
    val garbageSkipped = Multimodal.encodeVideo(
      Seq(png(2, 2, (_, _) => 1), "not-a-png-frame".getBytes("UTF-8")))
    val df = Seq((1L, vid7), (2L, vid1), (3L, truncated),
        (4L, garbageSampled), (5L, Array.empty[Byte]), (6L, garbageSkipped))
      .toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.decodeVideoBatch(df, stride = 3).collect()
      .map(m => m.id -> m).toMap
    assert(out(1L).ok && out(1L).n_frames === 7L && out(1L).sampled === 3L &&
      out(1L).width === 4L && out(1L).height === 3L)
    assert(out(2L).ok && out(2L).n_frames === 1L && out(2L).sampled === 1L &&
      out(2L).width === 2L)
    assert(!out(3L).ok && !out(4L).ok && !out(5L).ok)
    assert(out(6L).ok && out(6L).n_frames === 2L && out(6L).sampled === 1L)
    // the pixel fold is a pure function of the SAMPLED pixels: same
    // frames → same hash; a change inside an UNSAMPLED frame (idx 1)
    // leaves the hash untouched, a change in a sampled one (idx 3) moves it
    def vidWith(change: Int => Boolean): Array[Byte] =
      Multimodal.encodeVideo((0 until 7).map(f =>
        png(4, 3, (x, y) =>
          ((f + (if (change(f)) 99 else 0)) << 16) | (x << 8) | y)))
    val variants = Multimodal.decodeVideoBatch(
      Seq((10L, vidWith(_ => false)), (11L, vidWith(_ == 1)),
        (12L, vidWith(_ == 3))).toDF("doc_id", "payload"), stride = 3)
      .collect().map(m => m.id -> m).toMap
    assert(variants(10L).pixel_hash === out(1L).pixel_hash)
    assert(variants(11L).pixel_hash === out(1L).pixel_hash)
    assert(variants(12L).pixel_hash !== out(1L).pixel_hash)
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

  test("aHash64: noise-invariant, pattern-sensitive, rejects tiny images") {
    def png(pattern: Long, noise: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (b <- 0 until 64; y <- b / 8 * 4 until b / 8 * 4 + 4;
           x <- b % 8 * 4 until b % 8 * 4 + 4)
        img.setRGB(x, y, if ((pattern & (1L << b)) != 0L) 0xffffff else 0)
      if (noise) { img.setRGB(5, 9, 0x808080); img.setRGB(20, 3, 0x777777) }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // balanced patterns so the threshold sits mid-contrast
    val p1 = 0x5555555555555555L
    val p2 = 0x0F0F0F0F0F0F0F0FL
    val tiny = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    val df = Seq((1L, png(p1, noise = false)), (2L, png(p1, noise = true)),
        (3L, png(p2, noise = false)), (4L, bos.toByteArray),
        (5L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.aHash64(df).collect().map(r => r.id -> r).toMap
    assert(out(1L).ok && out(2L).ok && out(3L).ok)
    // a noisy re-render hashes IDENTICALLY to its source
    assert(out(1L).ahash === out(2L).ahash)
    // a different pattern hashes differently
    assert(out(1L).ahash !== out(3L).ahash)
    // the hash IS the pattern for block-aligned images
    assert(out(1L).ahash === p1 && out(3L).ahash === p2)
    // sub-8x8 images and junk bytes record ok=false, never throw
    assert(!out(4L).ok && !out(5L).ok)
  }
}
