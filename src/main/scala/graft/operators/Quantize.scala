package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 embedding quantization — the standard
  * memory/bandwidth move for ANN at retrieval scale: a 64-dim float
  * vector (256 B) becomes 64 int8 codes + one float scale (~68 B packed),
  * and the quantized dot product runs on integers.
  *
  * Determinism is the design constraint (SURVEY §6): `scale` =
  * `max(|v|) / 127` (max is exact, one correctly-rounded division),
  * codes = `round(v / scale)` (both engines round half away from zero),
  * and every quantized dot/norm is an INTEGER sum — order-independent
  * and exact, so scores replay bit-identically in the oracle with no
  * fold-order ceremony. Only the final `qdot / (sqrt · sqrt)` returns to
  * floating point, mirrored expression-for-expression cross-engine.
  *
  * Codes are kept as `array<int>` columns here; a storage-bound deployment
  * packs them to a 64-byte `binary` with the scale alongside — the
  * arithmetic and its determinism are unchanged.
  */
object Quantize {

  /** `max(|v|) / 127` in double — one scalar per vector. */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) /
      lit(127.0)

  /** Symmetric int8 codes: `round(v / scale)` ∈ [-127, 127] (an all-zero
    * vector quantizes to all-zero codes rather than dividing by zero).
    */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      when(s === 0.0, lit(0))
        .otherwise(round(x.cast("double") / s).cast("int")))
  }

  /** Exact integer dot product of two code arrays. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Quantized cosine: integer dot/norms, one double division at the end
    * (0.0 when either side is the all-zero vector).
    */
  def qcos(a: Column, b: Column): Column = {
    val den = sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double"))
    when(den === 0.0, lit(0.0)).otherwise(qdot(a, b).cast("double") / den)
  }
}
