package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog compaction: reduce an append-only event/CDC stream to the
  * latest record per key.
  *
  * Implemented as a `max_by` hash aggregation, NOT a window: one shuffle on
  * the key, map-side partial aggregation, no per-key sort and nothing
  * spills at 100 TB (each partial state is a single row per key). The
  * window `row_number() = 1` formulation — which the oracle uses — sorts
  * every key group; at scale that is strictly worse.
  */
object Compaction {

  /** Latest row per key by `ord`. Make the ordering total (e.g. fold a
    * unique id into it) so ties are impossible and results deterministic.
    *
    * `ord` should be a single fixed-width orderable column (long/decimal):
    * those keep the max_by buffer hash-aggregable. A struct ordering works
    * but silently demotes the whole aggregation to SortAggregate — local
    * per-partition sorts of all data — which is the plan this operator
    * exists to avoid; pack compound orderings into a decimal instead
    * (exact up to 38 digits).
    */
  def latestByKey(df: DataFrame, key: Column, ord: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    require(payload.nonEmpty, "latestByKey needs at least one payload column")
    val aggs = payload.map { case (n, c) => max_by(c, ord).as(n) }
    df.groupBy(key.as("key")).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact decimal packing for two-part orderings: `major * 10^minorDigits
    * + minor`, both non-negative, `minor < 10^minorDigits`. Keeps max_by
    * hash-aggregable where a struct would not be.
    */
  def packedOrd(major: Column, minor: Column, minorDigits: Int): Column =
    major.cast("decimal(38,0)") * lit(math.pow(10, minorDigits).toLong)
      .cast("decimal(38,0)") + minor.cast("decimal(38,0)")

  /** CDC MERGE: apply a changelog of upserts (`op = "U"`) and deletes
    * (`op = "D"`) onto a base snapshot — the Delta/Iceberg `MERGE INTO`
    * semantic, expressed as ONE hash aggregation instead of a join:
    * base rows enter the union at sequence −1, changelog rows at their own
    * `seq` (must be ≥ 0 and unique per key — make it so upstream), and
    * `max_by` keeps the latest version of every key; keys whose final op
    * is a delete are dropped after the agg.
    *
    * Why not the textbook full-outer-join + COALESCE: that is two shuffles
    * (changes must first self-compact, then join) and builds join hash
    * tables of the full base. The union + max_by form is one shuffle of
    * base+changes with map-side partials, and handles keys that are
    * inserted AND later deleted in the same batch for free. At 100 TB the
    * base dominates; its rows carry a constant seq so partial aggregation
    * collapses them immediately.
    *
    * Aggregate exec honesty: the op flag is byte-encoded internally, so
    * with all-numeric payloads this is a pure HashAggregate (see
    * [[latestByKey]]; EngineOpsSpec pins it). A STRING payload column
    * puts a variable-width field in the max_by buffer, which
    * HashAggregate can't hold, and Spark demotes to SortAggregate —
    * still ONE shuffle and the map-side partial still collapses to a row
    * per key before the wire, with only a per-partition sort on the key
    * added. That remains strictly cheaper than the window `row_number`
    * MERGE (which sorts by (key, seq) over the same shuffle); there is
    * no vanilla-Spark plan that hash-aggregates a string-carrying
    * extremum buffer.
    *
    * `base` and `changes` must share the payload schema; `changes`
    * additionally carries `seq` and `op` columns named by the params.
    */
  def mergeChangelog(base: DataFrame, changes: DataFrame, key: String,
      seq: String, op: String, payload: Seq[String]): DataFrame = {
    // op rides the max_by buffer as a BYTE (1=U, 2=D), not the string —
    // otherwise every merge would carry a variable-width buffer field and
    // demote to SortAggregate even for all-numeric payloads
    val opByte = when(col(op) === "D", lit(2).cast("byte"))
      .otherwise(lit(1).cast("byte"))
    val unioned = base
      .select((Seq(col(key), lit(-1L).as("_m_seq"),
        lit(1).cast("byte").as("_m_op")) ++ payload.map(col)): _*)
      .unionByName(changes.select((Seq(col(key), col(seq).cast("long")
        .as("_m_seq"), opByte.as("_m_op")) ++ payload.map(col)): _*))
    val kept = latestByKey(unioned, col(key), col("_m_seq"),
      ("_m_op" -> col("_m_op")) +: payload.map(n => n -> col(n)))
    kept.where(col("_m_op") =!= 2)
      .select((col("key").as(key) +: payload.map(col)): _*)
  }

  /** Golden-record survivorship: per key, each output column survives
    * INDEPENDENTLY under its own rule — `rules` maps an output name to
    * (value, eligibility): the value of the eligible row with the
    * highest `ord` wins (master-data "latest non-null / latest matching"
    * merge). Ineligible rows get a NULL ordering key, which `max_by` /
    * `arg_max` skip in both engines; a key with no eligible row yields
    * NULL for that column while its other columns still resolve.
    *
    * Same scale shape as [[latestByKey]]: ONE hash aggregation with
    * map-side partials — per-column window passes (the textbook
    * formulation) would each sort the full table.
    */
  def goldenRecord(df: DataFrame, key: Column, ord: Column,
      rules: Seq[(String, Column, Column)]): DataFrame = {
    require(rules.nonEmpty, "goldenRecord needs at least one rule")
    val aggs = rules.map { case (n, value, eligible) =>
      max_by(value, when(eligible, ord)).as(n)
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(key.as("key")).agg(aggs.head, aggs.tail: _*)
  }
}
