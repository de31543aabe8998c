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
  * shape — no external codec needed. Audio/video decode remains
  * environment-dependent (no such libs in this container), so those
  * decoders are STUBS: deterministic functions of the bytes with the real
  * Spark-side plumbing (schema, batching, partition behavior). Swap
  * `stubDecode*` for a real codec (e.g. a JNI/Pandas-UDF batch decoder)
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

  /** STUB image decode: "dimensions" derived deterministically from the
    * content hash — stands in for a real decode returning (width, height,
    * channels). Pure column expr ⇒ stays in codegen; a real decoder would be
    * a `mapInPandas`/`mapPartitions` batch over the same schema.
    */
  def stubDecodeImage(payload: Column): Column = {
    val h = abs(xxhash64(payload))
    struct(
      (pmod(h, lit(1920L)) + 1L).as("width"),
      (pmod(call_function("shiftright", h, lit(11)), lit(1080L)) + 1L).as("height"),
      lit(3L).as("channels"))
  }

  /** STUB resize: scales stub dimensions, keeping aspect semantics. */
  def stubResize(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scaleDen = greatest(w, h)
    struct(
      call_function("div", w * maxSide, scaleDen).as("width"),
      call_function("div", h * maxSide, scaleDen).as("height"),
      decoded.getField("channels").as("channels"))
  }

  /** STUB frame sampling for video payloads: deterministic frame indices
    * (every `stride`-th of a stub frame count derived from bytes).
    */
  def stubFrameSample(payload: Column, stride: Int): Column = {
    val frames = pmod(abs(xxhash64(payload)), lit(300L)) + 1L
    filter(sequence(lit(0L), frames - 1L), i => i % stride === 0)
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
          case _: java.io.IOException =>
            ImageMeta(id, -1L, -1L, -1L, -1L, ok = false)
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
}
