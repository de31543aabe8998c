package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-join pruning — the explicit form of Spark's runtime
  * `InjectRuntimeFilter`, for joins the optimizer does not cover (notably
  * the left-anti join of incremental dedup, where the probe side is the
  * huge incoming batch and the build side is the corpus fingerprint set).
  *
  * The filter is a sketch (bytes per distinct key ≈ 1.2 at 1 % fpp), built
  * distributed by `BloomFilterAggregate` and reduced to the driver exactly
  * like an AQE statistic — never the keys themselves. Probe rows failing
  * `might_contain` are dropped *before* the shuffle; false positives only
  * make the pruned set slightly larger, so the join that follows remains
  * exact. At 100 TB this turns "shuffle the whole batch" into "shuffle the
  * ~overlap".
  */
object BloomPrune {

  /** Build a serialized bloom filter of `key` over `build` (distributed
    * agg; driver holds only the sketch bytes).
    */
  def buildFilter(build: DataFrame, key: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Array[Byte] = {
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(key))),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
    build.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Keep only probe rows whose `key` might be in the filter. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Incremental dedup with bloom pre-pruning: rows whose content hash
    * definitely isn't in the corpus skip the anti-join shuffle entirely
    * and are emitted directly; only possible collisions join. Result is
    * identical to [[Dedup.incremental]].
    */
  def incrementalPruned(incoming: DataFrame, corpus: DataFrame,
      id: Column, text: Column, expectedCorpus: Long = 1000000L): DataFrame = {
    val corpusFps = corpus.select(md5(text).as("fp")).distinct()
    val bf = buildFilter(corpusFps, col("fp"), expectedCorpus)
    val hashed = incoming.select(md5(text).as("fp"), id.as("id"))
    // an empty build side yields a null sketch (BloomFilterAggregate over
    // zero rows); might_contain(null) is NULL, which a where-filter would
    // treat as false on BOTH branches — dropping the whole batch. With no
    // corpus there is nothing to prune: every row goes to the anti-join,
    // which correctly passes everything through. Likewise a null text ⇒
    // null fp makes might_contain NULL: coalesce routes those rows to the
    // definitely-new branch, matching Dedup.incremental's left_anti (a
    // null join key never matches, so the anti-join keeps the row).
    val (definitelyNew, candidates) =
      if (bf == null) (hashed.limit(0), hashed)
      else (hashed.where(!coalesce(mightContain(bf, col("fp")), lit(false))),
        hashed.where(coalesce(mightContain(bf, col("fp")), lit(false))))
    val maybeSeen = candidates.join(corpusFps, Seq("fp"), "left_anti")
    definitelyNew.unionByName(maybeSeen)
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))
  }
}
