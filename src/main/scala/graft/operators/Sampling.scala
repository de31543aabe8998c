package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation.
  *
  * Random `sample()` is irreproducible across runs/engines; these operators
  * hash row *content* instead, so the same row is kept everywhere, every
  * time — the property a 100 TB pipeline needs for resumable/incremental
  * runs. Sampling is a stateless map over the scan: no shuffle, no driver
  * state, and the md5 basis replays in any engine.
  */
object Sampling {

  /** First hex nibble of md5(key) as an integer in [0, 16). */
  def hashNibble(key: Column): Column =
    conv(substring(md5(key), 1, 1), 16, 10).cast("int")

  /** Keep a row iff hashNibble(key) < cutoff — i.e. an exact cutoff/16
    * content-deterministic sample.
    */
  def hashSample(df: DataFrame, key: Column, cutoff: Column): DataFrame =
    df.where(hashNibble(key) < cutoff)

  /** Stratified variant: per-stratum cutoffs (stratum value → keep x/16),
    * default for strata not listed. Rates stay exact n/16 fractions so the
    * sample is replayable; finer rates = more nibbles.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      cutoffs: Seq[(String, Int)], default: Int): DataFrame = {
    val cutoff = cutoffs.foldRight(lit(default): Column) {
      case ((value, c), els) => when(stratum === value, lit(c)).otherwise(els)
    }
    hashSample(df, key, cutoff)
  }
}
