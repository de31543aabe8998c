package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout key
  * behind "optimize zorder by (a, b)": sorting a table by the bit
  * interleave of two dimensions clusters rows that are close in BOTH,
  * so per-file min/max statistics prune 2-D box predicates instead of
  * only the leading sort column. At 100 TB the win is at the WRITE:
  * `repartitionByRange(zval).sortWithinPartitions(zval)` gives every
  * parquet file a tight (a, b) bounding box; readers with `a BETWEEN …
  * AND b BETWEEN …` filters skip all but the overlapping files on
  * footer stats alone.
  *
  * Pure integer bit arithmetic (shifts/masks/or) — codegen'd end-to-end
  * on Spark and replayed operator-for-operator in the oracle engine, so
  * layout keys are bit-identical everywhere.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two NON-NEGATIVE integral
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * `2 * bits ≤ 63`. Values are masked to `bits` bits first (callers
    * quantize dimensions into that range — e.g. day buckets, key mod 2^k).
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val mask = lit((1L << bits) - 1L)
    val am = a.cast("long").bitwiseAND(mask)
    val bm = b.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      val abit = shiftright(am, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
      val bbit = shiftright(bm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }
}
