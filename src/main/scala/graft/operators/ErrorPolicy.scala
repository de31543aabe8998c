package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Invalid-record policy — the reference's `stop_on_invalid_record` switch
  * (test config `embulk_mapred_stop_on_invalid_record_config.yml`; the
  * executor aborts the job when an output plugin rejects a row and the flag
  * is true, otherwise skips the row).
  *
  * Spark-first shape: validity is a *column predicate* (`try_*` conversions
  * yield null on failure), so each policy is a plan transform:
  *  - Permissive: keep all rows, failed conversions become null (+ optional
  *    `_corrupt` marker column);
  *  - Drop: filter invalid rows out (reference `stop_on_invalid_record:
  *    false` ⇒ "skip the record");
  *  - Fail: abort when any invalid row exists (reference `true`), surfaced
  *    eagerly via a cheap `isEmpty` probe on the invalid subset.
  */
object ErrorPolicy {
  sealed trait Policy
  case object Permissive extends Policy
  case object Drop extends Policy
  case object Fail extends Policy

  final case class InvalidRecordException(count: Long)
    extends RuntimeException(s"$count invalid record(s); stop_on_invalid_record=true")

  /** Apply a policy given parsed columns and a validity predicate.
    * `parsed` are (name, expr) pairs added to the frame (typically `try_cast`
    * / `from_json` results); a row is invalid when `valid` is false/null.
    */
  def apply(df: DataFrame, parsed: Seq[(String, Column)], valid: Column,
      policy: Policy): DataFrame = {
    val withCols = parsed.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    policy match {
      case Permissive => withCols.withColumn("_corrupt", !coalesce(valid, lit(false)))
      case Drop       => withCols.where(coalesce(valid, lit(false)))
      case Fail =>
        val invalid = withCols.where(!coalesce(valid, lit(false)))
        val n = invalid.limit(1).count()
        if (n > 0) throw InvalidRecordException(invalid.count())
        withCols
    }
  }
}
