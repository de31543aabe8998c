package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join: for every left row, attach the latest right row
  * with the same key whose time is ≤ the left time — the classic
  * event-enrichment operator Spark has no native node for.
  *
  * Spark-first composition (one shuffle, no range explosion): tag and union
  * both sides, sort within key by (time, side) — right rows before left rows
  * at equal time, matching ASOF `>=` semantics — then a window
  * `last(right payload, ignoreNulls)` carries the most recent right row
  * forward onto each left row. Cost: one hash shuffle on the key + one
  * sort — the same shape a dedicated SortMerge-AsOf physical operator would
  * have, so a custom SparkPlan would only shave the union/filter overhead.
  *
  * Right rows are first reduced to one per (key, time) (max payload struct,
  * deterministic) so timestamp ties cannot produce engine-dependent matches.
  */
object AsOfJoin {

  /** Returns every left row plus `right_<name>` payload columns (null when
    * no right row precedes it).
    */
  def asOf(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq

    // deterministic tie reduction: one right row per (key, t)
    val r0 = right.select(rightKey.as("_k"), rightTime.as("_t"),
      struct(payload.map { case (n, c) => c.as(n) }: _*).as("_pay"))
      .groupBy(col("_k"), col("_t")).agg(max(col("_pay")).as("_pay"))
    val payTypes = r0.schema("_pay").dataType.asInstanceOf[StructType]
    val leftTypes = left.schema

    val l = left.select(
      (leftKey.as("_k") +: leftTime.as("_t") +: lit(1).as("_side") +:
        leftCols.map(c => left(c).as(c))) ++
        payTypes.map(f => lit(null).cast(f.dataType).as(s"_p_${f.name}")): _*)
    val r = r0.select(
      (col("_k") +: col("_t") +: lit(0).as("_side") +:
        leftTypes.map(f => lit(null).cast(f.dataType).as(f.name)).toSeq) ++
        payTypes.map(f => col(s"_pay.${f.name}").as(s"_p_${f.name}")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("*") +: payTypes.map(f =>
        last(col(s"_p_${f.name}"), ignoreNulls = true).over(w)
          .as(s"right_${f.name}")).toSeq: _*)
    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payTypes.map(f => col(s"right_${f.name}")): _*)
  }

  /** Pack the right side ONCE into one row per key holding the time-
    * sorted (t, pay) array — the build side of the repeated-probe as-of
    * ([[asOfPacked]]). Ties are first reduced exactly as in [[asOf]]
    * (one right row per (key, t), max payload struct), so `t` is unique
    * within each array and struct ordering is ordering by `t`.
    *
    * Scale shape: the dim collapses to |keys| rows whose array length is
    * that key's version count — bounded per key by construction in
    * temporal dimensions (versions-per-entity, not events). Written
    * `bucketBy(_k)` this is the E16 layout: every later probe join on
    * `_k` plans with ZERO dim-side exchange.
    *
    * PREMISE, enforced: the packed array is one ROW — a key whose
    * version count defies the versions-per-entity premise (an entity
    * updated every second for a year) would become a single giant row
    * that one task must hold. Rather than degrade silently,
    * `maxVersions` (default 2²⁰) fails the job LOUDLY naming the hot
    * key, the same contract as `Hierarchy.flatten`'s depth overrun; for
    * genuinely hotter dims, raise the bound deliberately or pre-compact
    * versions (e.g. last-per-hour) before packing.
    */
  def packDim(right: DataFrame, rightKey: Column, rightTime: Column,
      payload: Seq[(String, Column)],
      maxVersions: Int = 1 << 20): DataFrame =
    right.select(rightKey.as("_k"), rightTime.as("_t"),
        struct(payload.map { case (n, c) => c.as(n) }: _*).as("_pay"))
      .groupBy(col("_k"), col("_t")).agg(max(col("_pay")).as("_pay"))
      .groupBy(col("_k"))
      .agg(sort_array(collect_list(struct(col("_t").as("t"),
        col("_pay").as("pay")))).as("_arr"))
      // assert_true returns NULL when the bound holds, so the predicate
      // passes every conforming row and THROWS (naming the key) on a hot
      // one — a filter can't be pruned away, unlike a dropped column
      .where(assert_true(size(col("_arr")) <= lit(maxVersions),
        concat(lit("asOfPacked.packDim: key "), col("_k").cast("string"),
          lit(" holds "), size(col("_arr")).cast("string"),
          lit(s" versions (> maxVersions=$maxVersions); raise the bound" +
            " or pre-compact versions before packing"))).isNull)

  /** As-of probe against a [[packDim]]-packed dimension: ONE equi-join on
    * the key (left outer — unmatched keys keep null payloads, matching
    * [[asOf]]) plus a per-row `array_max(filter(arr, t ≤ leftTime))` —
    * the latest version at-or-before the event, `>=` tie semantics
    * identical to [[asOf]] because a version AT the probe time passes the
    * filter. Emits the same `right_<name>` columns as [[asOf]].
    *
    * When `packed` is read from a table bucketed (and sorted) on `_k`,
    * the join plans with NO exchange and NO sort on the dim side — only
    * the probe side moves. That is the repeated-probe / streaming-
    * microbatch shape: [[asOf]] re-shuffles the whole dimension on every
    * call, this probes a build-once layout.
    */
  def asOfPacked(left: DataFrame, leftKey: Column, leftTime: Column,
      packed: DataFrame): DataFrame = {
    val leftCols = left.columns.toSeq
    val elemT = packed.schema("_arr").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[StructType]
    val payT = elemT("pay").dataType.asInstanceOf[StructType]
    left.join(packed, leftKey === packed("_k"), "left")
      .withColumn("_pick",
        array_max(filter(col("_arr"), e => e("t") <= leftTime)))
      .select(leftCols.map(col) ++
        payT.map(f => col(s"_pick.pay.${f.name}").as(s"right_${f.name}")): _*)
  }

  /** Nearest-direction as-of: each left row takes the right row closest
    * in time — backward (≤, via the same carry-forward window) or
    * forward (strictly >, via the mirrored carry-BACKWARD window) —
    * ties broken toward backward. Both windows share ONE key shuffle and
    * ONE (t, side) sort (the frames differ, not the sort order). Emits
    * `right_<name>` of the chosen row plus `asof_dt` (signed µs, right −
    * left) and `asof_dir` ('b'/'f', null when no right row exists).
    * A right row AT the left's timestamp sorts before it (side 0 first),
    * so it is backward's match with dt = 0 — forward is strictly after.
    */
  def asOfNearest(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r0 = right.select(rightKey.as("_k"), rightTime.as("_t"),
      struct(payload.map { case (n, c) => c.as(n) }: _*).as("_pay"))
      .groupBy(col("_k"), col("_t")).agg(max(col("_pay")).as("_pay"))
    val payTypes = r0.schema("_pay").dataType.asInstanceOf[StructType]
    val leftTypes = left.schema

    val l = left.select(
      (leftKey.as("_k") +: leftTime.as("_t") +: lit(1).as("_side") +:
        leftCols.map(c => left(c).as(c))) :+
        lit(null).cast(r0.schema("_pay").dataType).as("_pay"): _*)
    val r = r0.select(
      (col("_k") +: col("_t") +: lit(0).as("_side") +:
        leftTypes.map(f => lit(null).cast(f.dataType).as(f.name)).toSeq) :+
        col("_pay"): _*)

    val ord = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tagged = struct(col("_t").as("t"), col("_pay").as("pay"))
    val sided = when(col("_side") === 0, tagged)
    val carried = l.unionByName(r)
      .withColumn("_b", last(sided, ignoreNulls = true).over(back))
      .withColumn("_f", first(sided, ignoreNulls = true).over(fwd))
    val bd = col("_t") - col("_b.t") // ≥ 0
    val fd = col("_f.t") - col("_t") // > 0
    val useB = col("_b").isNotNull && (col("_f").isNull || bd <= fd)
    carried.where(col("_side") === 1)
      .withColumn("_c", when(useB, col("_b")).otherwise(col("_f")))
      .select(leftCols.map(col) ++
        payTypes.map(f => col(s"_c.pay.${f.name}")
          .as(s"right_${f.name}")).toSeq ++ Seq(
          (col("_c.t") - col("_t")).as("asof_dt"),
          when(col("_c").isNull, lit(null).cast("string"))
            .when(useB, lit("b")).otherwise(lit("f")).as("asof_dir")): _*)
  }
}
