package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: reduce an append-only
  * changelog to one row per ATTRIBUTE VERSION per key, with
  * `[valid_from, valid_to)` intervals — the standard warehouse shape for
  * "what was this key's value at time t" joins, and the inverse of
  * [[Compaction.latestByKey]] (which keeps only the open interval).
  *
  * Plan shape: ONE shuffle on the key feeds both windows. The
  * change-point filter (`lag(attr) != attr`) is narrow and preserves both
  * the hash partitioning and the per-partition sort order, so the second
  * window (`lead(from)` + `row_number` for valid_to/version over the
  * SURVIVING rows) re-uses the exchange AND the sort — the executed plan
  * has a single Exchange and a single Sort (PlanSpec-guarded). Per-key
  * state in each WindowExec is one key group at a time; nothing is
  * corpus-global, so the operator scales with the largest single key's
  * history, not the table.
  *
  * The ordering must be total (fold a unique id in) — ties would make
  * both the change-point detection and the interval bounds
  * nondeterministic on any engine.
  */
object Scd2 {

  /** `df`'s changelog → SCD2 history of `attr` per `key`. All arguments
    * are column NAMES already present in `df` (pre-project computed
    * orderings). `ord` must be a total ordering. Output columns: the key,
    * `version` (1-based per key in `ord` order), the attribute,
    * `valid_from` (= `from` at the change point), `valid_to` (= next
    * change's `from`; null while current).
    */
  def history(df: DataFrame, key: String, ord: Seq[String], attr: String,
      from: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ord.map(col): _*)
    df.withColumn("scd2_prev", lag(col(attr), 1).over(w))
      .where(col("scd2_prev").isNull || col("scd2_prev") =!= col(attr))
      .withColumn("valid_to", lead(col(from), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(key), col("version"), col(attr),
        col(from).as("valid_from"), col("valid_to"))
  }
}
