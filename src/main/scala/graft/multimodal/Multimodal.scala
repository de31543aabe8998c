package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY §2 L7): images/audio/video ride through
  * the engine as opaque `binary` columns plus a typed metadata struct, the
  * standard lakehouse shape for 100 TB multimodal sets — the bytes shuffle
  * only when the row does, and metadata predicates (modality, size) push
  * down to parquet without touching payloads.
  *
  * The actual media *decode* is environment-dependent (no image/audio libs in
  * this container), so decoders here are STUBS: deterministic functions of
  * the bytes with the real Spark-side plumbing (schema, batching, partition
  * behavior). Swap `stubDecode*` for a real codec (e.g. a JNI/Pandas-UDF
  * batch decoder) without touching any plan shape.
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
}
