package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY §2 L7): images/audio/video ride through
  * the engine as opaque `binary` columns plus a typed metadata struct, the
  * standard lakehouse shape for 100 TB multimodal sets — the bytes shuffle
  * only when the row does, and metadata predicates (modality, size) push
  * down to parquet without touching payloads.
  *
  * Image decode is REAL: [[decodeImageBatch]] drives the JDK's own
  * `javax.imageio` readers (PNG/GIF/BMP/JPEG) in the `mapPartitions` batch
  * shape — no external codec needed. Audio decode is REAL too:
  * [[decodeAudioBatch]] drives `javax.sound.sampled` (WAV/AU/AIFF PCM).
  * Video decode is REAL over a JDK-only MJPEG-style container:
  * [[decodeVideoBatch]] walks length-prefixed intra-coded frames —
  * skipped frames are SEEKS over the length index, never decodes — and
  * decodes every `stride`-th frame through the same `javax.imageio`
  * machinery. Inter-coded codecs (H.264 etc.) have no JDK decoder; swap
  * the per-frame read for a codec library behind the same signature
  * without touching any plan shape.
  */
object Multimodal {

  /** Metadata struct for a binary payload column. */
  def meta(payload: Column, modality: String): Column = struct(
    lit(modality).as("modality"),
    length(payload).as("num_bytes"),
    md5(payload).as("content_md5"))

  /** Attach payload+meta from any source column (here: utf-8 text bytes as a
    * stand-in payload so tests run on the synthetic tables).
    */
  def withPayload(df: DataFrame, src: Column, modality: String): DataFrame =
    df.withColumn("payload", src.cast("binary"))
      .withColumn("meta", meta(col("payload"), modality))

  /** The MJPEG-style video container: concatenated
    * [4-byte big-endian length][PNG frame] records. Intra-coded (every
    * frame self-contained), so frame sampling needs only the length
    * index — the property real frame-sampling pipelines exploit with
    * keyframe-only reads.
    */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      bos.write((f.length >>> 24) & 0xff); bos.write((f.length >>> 16) & 0xff)
      bos.write((f.length >>> 8) & 0xff); bos.write(f.length & 0xff)
      bos.write(f, 0, f.length)
    }
    bos.toByteArray
  }

  /** Decoded video metadata row: `ok = false` (all fields -1) marks a
    * payload that is not a well-formed frame container or whose sampled
    * frames fail image decode — record-and-continue, like [[ImageMeta]].
    */
  final case class VideoMeta(id: Long, n_frames: Long, sampled: Long,
    width: Long, height: Long, pixel_hash: Long, ok: Boolean)

  /** REAL frame-sampled video decode over the [[encodeVideo]] container:
    * one pass walks the length prefixes (a SEEK per skipped frame — the
    * index scan costs O(frames), not O(bytes decoded)), and every
    * `stride`-th frame decodes through the same `javax.imageio` readers
    * as [[decodeImageBatch]], folding sampled pixels into one
    * deterministic hash. Reports total frame count, sampled count, the
    * first sampled frame's dimensions, and the pixel fold. Same
    * codec-farm `mapPartitions` shape: per-partition init amortized,
    * bytes never leave the executor, typed output frame.
    */
  def decodeVideoBatch(df: DataFrame, stride: Int, idCol: String = "doc_id",
      payloadCol: String = "payload")
      : org.apache.spark.sql.Dataset[VideoMeta] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import df.sparkSession.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val fail = VideoMeta(id, -1L, -1L, -1L, -1L, -1L, ok = false)
        try {
          var off = 0; var frames = 0L; var sampled = 0L
          var w = -1L; var h = -1L; var acc = 0L
          var bad = bytes.length == 0
          while (!bad && off + 4 <= bytes.length) {
            val len = ((bytes(off) & 0xff) << 24) |
              ((bytes(off + 1) & 0xff) << 16) |
              ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
            val start = off + 4
            // long arithmetic: a crafted length near Int.MaxValue must not
            // overflow past the bounds check
            if (len <= 0 || start.toLong + len > bytes.length) bad = true
            else {
              if (frames % stride == 0) {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes, start, len))
                if (img == null) bad = true
                else {
                  if (w < 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      acc = acc * 31L + img.getRGB(x, y); x += 1
                    }
                    y += 1
                  }
                  sampled += 1
                }
              }
              frames += 1
              off = start + len
            }
          }
          if (bad || off != bytes.length || frames == 0) fail
          else VideoMeta(id, frames, sampled, w, h, acc, ok = true)
        } catch {
          // same contract as the image/audio decoders: malformed frames
          // provoke RuntimeExceptions inside ImageIO — record, move on
          case scala.util.control.NonFatal(_) => fail
        }
      }
    }
  }

  /** Decoded image metadata row: `ok = false` (all fields -1) marks bytes
    * that are not a decodable image — a web-crawl decode must record the
    * failure and move on, never kill the task.
    */
  final case class ImageMeta(id: Long, width: Long, height: Long,
    channels: Long, pixel_hash: Long, ok: Boolean)

  /** REAL image decode — `javax.imageio` ships PNG/GIF/BMP/JPEG readers in
    * the JDK, so this path needs no external codec: width, height, channel
    * count, and a deterministic row-major fold over ARGB pixel values
    * (`h = h*31 + argb`), so the same pixels hash identically regardless of
    * the container encoding. Same `mapPartitions` batch shape as
    * [[decodeBatch]]: per-partition init outside the row loop, nothing
    * collected to the driver, and the output is a typed Dataset whose
    * schema pushes down like any other column.
    */
  def decodeImageBatch(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload")
      : org.apache.spark.sql.Dataset[ImageMeta] = {
    import df.sparkSession.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition init: keep ImageIO off its disk scratch cache so
      // executor-local tmp churn never becomes the bottleneck
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) ImageMeta(id, -1L, -1L, -1L, -1L, ok = false)
          else {
            val w = img.getWidth; val h = img.getHeight
            var acc = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { acc = acc * 31L + img.getRGB(x, y); x += 1 }
              y += 1
            }
            ImageMeta(id, w.toLong, h.toLong,
              img.getColorModel.getNumComponents.toLong, acc, ok = true)
          }
        } catch {
          // NonFatal, not just IOException: JDK ImageIO decoders throw
          // RuntimeExceptions (ArrayIndexOutOfBounds, NegativeArraySize,
          // IllegalArgument) on malformed-but-recognized headers — exactly
          // the web-crawl input this decoder must record and move past,
          // never kill the task on
          case scala.util.control.NonFatal(_) =>
            ImageMeta(id, -1L, -1L, -1L, -1L, ok = false)
        }
      }
    }
  }

  /** Decoded audio metadata row: `ok = false` (all fields -1) marks bytes
    * that are not decodable audio — same record-and-continue contract as
    * [[ImageMeta]].
    */
  final case class AudioMeta(id: Long, sample_rate: Long, channels: Long,
    frames: Long, pcm_hash: Long, ok: Boolean)

  /** REAL audio decode — `javax.sound.sampled` ships WAV/AU/AIFF PCM
    * readers in the JDK, so this path needs no external codec either:
    * sample rate, channel count, frame count, and a deterministic fold
    * over the raw PCM byte stream (`h = h*31 + byte`), so the same samples
    * hash identically regardless of container framing. Same
    * `mapPartitions` batch shape as [[decodeImageBatch]]: per-partition
    * init amortized, bytes never leave the executor, typed output frame.
    * Compressed codecs (mp3/ogg) have no JDK decoder and surface as
    * `ok = false` — swap in a codec library behind the same signature.
    */
  def decodeAudioBatch(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload")
      : org.apache.spark.sql.Dataset[AudioMeta] = {
    import df.sparkSession.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val buf = new Array[Byte](8192) // per-partition scratch, reused
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            var acc = 0L
            var n = ais.read(buf)
            while (n > 0) {
              var i = 0
              while (i < n) { acc = acc * 31L + buf(i); i += 1 }
              n = ais.read(buf)
            }
            AudioMeta(id, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              ais.getFrameLength, acc, ok = true)
          } finally ais.close()
        } catch {
          // UnsupportedAudioFileException, truncated streams, and the
          // RuntimeExceptions malformed headers provoke — record, move on
          case scala.util.control.NonFatal(_) =>
            AudioMeta(id, -1L, -1L, -1L, -1L, ok = false)
        }
      }
    }
  }

  /** Decoded features for one payload row. */
  final case class DecodedFeature(id: Long, width: Long, height: Long,
    channels: Long, feature: Array[Float])

  /** Batch decode via `mapPartitions` — the Scala analogue of a
    * `mapInPandas` batch UDF and the shape a real codec drops into: the
    * partition iterator amortizes per-batch init (codec handles, model
    * weights) across all rows of a partition, and nothing is collected to
    * the driver. The decode body is a STUB (deterministic bytes→features);
    * swap `decodeOne` for a JNI/library call without touching the plan.
    */
  def decodeBatch(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", dims: Int = 8)
      : org.apache.spark.sql.Dataset[DecodedFeature] = {
    import df.sparkSession.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition init happens HERE once (codec/session handles)
      def splitmix(x0: Long): Long = {
        var z = x0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      def decodeOne(id: Long, bytes: Array[Byte]): DecodedFeature = {
        var h = 0L
        var i = 0
        while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
        val feat = Array.tabulate(dims)(d =>
          (splitmix(h + d) >>> 40).toFloat / (1 << 24).toFloat)
        DecodedFeature(id, math.abs(h % 1920) + 1, math.abs(h % 1080) + 1,
          3L, feat)
      }
      rows.map(r => decodeOne(r.getLong(idIdx), r.getAs[Array[Byte]](pIdx)))
    }
  }

  /** Average-hash row: 64-bit perceptual signature, or `ok = false` for
    * undecodable bytes. */
  final case class AHashRow(id: Long, ahash: Long, ok: Boolean)

  /** Perceptual average-hash (aHash) of an image column: decode → 8×8
    * block-mean downsample of the integer luminance → one bit per block
    * (mean ≥ global mean), packed row-major into a long. Near-duplicate
    * images (re-encodes, small noise, watermark dust) land on the SAME
    * 64-bit value, so near-dup detection is the dedup discipline applied
    * to pixels: a narrow decode map emitting 8 bytes per image, a hash
    * `groupBy`/self-join on the signature — the image bytes never cross
    * a shuffle. All-integer arithmetic (sums and one integer-division
    * threshold) — deterministic on any JVM, no float resampling.
    *
    * Block geometry: the image is cut into an 8×8 grid of
    * ⌊w/8⌋×⌊h/8⌋-pixel blocks (images smaller than 8×8 are rejected as
    * `ok = false` — there is no 64-bit structure to hash).
    */
  def aHash64(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload")
      : org.apache.spark.sql.Dataset[AHashRow] = {
    import df.sparkSession.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](pIdx)))
          if (img == null || img.getWidth < 8 || img.getHeight < 8)
            AHashRow(id, -1L, ok = false)
          else {
            val bw = img.getWidth / 8
            val bh = img.getHeight / 8
            val means = new Array[Long](64)
            var total = 0L
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                var acc = 0L
                var y = by * bh
                while (y < (by + 1) * bh) {
                  var x = bx * bw
                  while (x < (bx + 1) * bw) {
                    val rgb = img.getRGB(x, y)
                    // integer luma: (r + g + b) — monotone in brightness,
                    // no float weights to drift
                    acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                      (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                means(by * 8 + bx) = acc
                total += acc
                bx += 1
              }
              by += 1
            }
            var hash = 0L
            var i = 0
            while (i < 64) {
              // bit = block sum >= mean of block sums (integer compare:
              // 64 * blockSum >= total)
              if (means(i) * 64L >= total) hash |= (1L << i)
              i += 1
            }
            AHashRow(id, hash, ok = true)
          }
        } catch {
          case scala.util.control.NonFatal(_) => AHashRow(id, -1L, ok = false)
        }
      }
    }
  }
}
