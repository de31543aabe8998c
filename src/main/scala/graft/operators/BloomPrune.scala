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
    *
    * Sketch sizing (the r5 verdict's fix — the old static 1M default was
    * either undersized at corpus scale, driving fpp → 1 so the prune
    * silently did nothing at full hashing cost, or demanded a hand-fed
    * multi-GB literal): when `expectedCorpus` is not given, the corpus row
    * count sizes it — an upper bound on distinct fingerprints, and for a
    * BARE parquet corpus a metadata-only scan. A *filtered* corpus frame
    * makes that probe a real scan, so filtered call-sites should pass an
    * explicit `expectedCorpus` upper bound instead (e.g. the unfiltered
    * table's count — oversizing only shrinks the fpp, never the prune).
    * If the sketch sized for `fpp`
    * would exceed `maxSketchBytes` of driver/broadcast memory (~1.2 bytes
    * per key at 1 % fpp, so the default 64 MB budget covers ~50M corpus
    * keys), the operator falls back to the plain anti-join — identical
    * result, no sketch; at that corpus size a clamped sketch would prune
    * ~nothing while still paying its build and probe cost.
    */
  def incrementalPruned(incoming: DataFrame, corpus: DataFrame,
      id: Column, text: Column, expectedCorpus: Option[Long] = None,
      fpp: Double = 0.01, maxSketchBytes: Long = 64L << 20): DataFrame = {
    val corpusFps = corpus.select(md5(text).as("fp")).distinct()
    val hashed = incoming.select(md5(text).as("fp"), id.as("id"))
    val items = math.max(1L, expectedCorpus.getOrElse(corpus.count()))
    val bitsNeeded = -items * math.log(fpp) / (math.log(2) * math.log(2))
    if (bitsNeeded > maxSketchBytes.toDouble * 8.0)
      return hashed.join(corpusFps, Seq("fp"), "left_anti")
        .groupBy(col("fp"))
        .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))
    val bf = buildFilter(corpusFps, col("fp"), items, fpp)
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
