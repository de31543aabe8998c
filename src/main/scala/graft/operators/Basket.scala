package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Market-basket association rules: pairwise item co-occurrence with
  * support / confidence / lift — the classic retail-analytics operator
  * (Agrawal et al., SIGMOD'93 frequent-itemset family, restricted to the
  * pair lattice level that covers the overwhelming share of practical
  * rule mining).
  *
  * Two physical paths, auto-selected on the item-domain size:
  *
  *  - **≤ 64 distinct items** (brand/category/segment-level mining — the
  *    common case): each basket folds to ONE 64-bit set via
  *    `bit_or(1L << idx)` — a codegen'd HashAggregate with a fixed-width
  *    long buffer and map-side partials (duplicates collapse in the OR,
  *    no distinct pass). A second long-keyed agg collapses the |baskets|
  *    mask frame to |distinct patterns| weighted rows, and ALL pair/item
  *    counting runs on that tiny frame. The fact is touched by exactly
  *    one shuffle; nothing object-typed ever aggregates. (The
  *    collect_set formulation this replaced ran 120–200 s at the 100×
  *    decade probe — a 45M-group ObjectHashAggregate materializing
  *    per-basket arrays; the bitmap path collapses the same work into
  *    long arithmetic.)
  *  - **Unbounded domains**: per-basket item sets via `collect_set`,
  *    pairs from a bounded narrow double-explode (≤ k² per basket),
  *    materialized once (`localCheckpoint`) for the three consuming
  *    branches — never an item×item product across baskets.
  */
object Basket {

  /** Pair rules over a `(basket, item)` frame (need not be distinct).
    * Emits one row per unordered pair (item_a < item_b) with
    * co-occurrence ≥ `minSupport`: n_ab, n_a, n_b, confidence P(b|a),
    * and lift. Confidence and lift are single int/int IEEE divisions on
    * exact integer counts. Dispatches on the item-domain probe — an O(1)
    * driver action bounded at 65 rows.
    */
  def pairRules(df: DataFrame, basket: Column, item: Column,
      minSupport: Long): DataFrame = {
    // Probe WITHOUT the window: distinct().limit(65) short-circuits on a
    // partial-agg'd frame, so an unbounded item domain (the very case the
    // generic path exists for) never pays a single-task row_number sort
    // just to learn it has > 64 items.
    val distinctItems = df.select(item.as("it")).distinct()
    if (distinctItems.limit(65).count() <= 64) {
      // dense 0-based idx; the ≤64-row sort is a no-op at this size
      val vocab = distinctItems.withColumn("idx",
        (row_number().over(Window.orderBy(col("it"))) - 1).cast("int"))
      pairRulesBitmap(df, basket, item, minSupport, vocab)
    } else pairRulesGeneric(df, basket, item, minSupport)
  }

  /** Small-domain path: one fact shuffle (the per-basket OR-fold), then
    * everything runs on the |distinct mask patterns| frame. `vocab` must
    * hold ≤ 64 items with a dense 0-based `idx`.
    */
  private[graft] def pairRulesBitmap(df: DataFrame, basket: Column,
      item: Column, minSupport: Long, vocab: DataFrame): DataFrame = {
    val bit = expr("shiftleft(CAST(1 AS BIGINT), idx)")
    val masks = df.select(basket.as("bk"), item.as("it"))
      .join(broadcast(vocab), "it")
      .groupBy(col("bk")).agg(bit_or(bit).as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("w"))
      .localCheckpoint() // tiny; three branches must not re-run the fact agg
    val nBaskets = masks.agg(sum(col("w")).as("n_baskets"))
    val bits = masks
      .select(col("mask"), col("w"), explode(sequence(lit(0), lit(63))).as("i"))
      .where(col("mask")
        .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), i)")) =!= 0L)
    val itemCounts = bits.groupBy(col("i")).agg(sum(col("w")).as("n_it"))
    val pairs = bits
      .select(col("mask"), col("w"), col("i"),
        explode(sequence(lit(0), lit(63))).as("j"))
      .where(col("j") > col("i") && col("mask")
        .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), j)")) =!= 0L)
      .groupBy(col("i"), col("j")).agg(sum(col("w")).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(vocab.select(col("idx").as("i"), col("it").as("item_a"))), "i")
      .join(broadcast(vocab.select(col("idx").as("j"), col("it").as("item_b"))), "j")
      .join(broadcast(itemCounts.select(col("i"), col("n_it").as("n_a"))), "i")
      .join(broadcast(itemCounts.select(col("i").as("j"), col("n_it").as("n_b"))), "j")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** Unbounded-domain path: per-basket sets + bounded double-explode. */
  private[graft] def pairRulesGeneric(df: DataFrame, basket: Column,
      item: Column, minSupport: Long): DataFrame = {
    val baskets = df.select(basket.as("bk"), item.as("it"))
      .groupBy(col("bk"))
      .agg(collect_set(col("it")).as("items"))
      .localCheckpoint()
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val itemCounts = baskets
      .select(explode(col("items")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n_it"))
    val pairs = baskets
      .select(explode(col("items")).as("item_a"), col("items"))
      .select(col("item_a"), explode(col("items")).as("item_b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("n_it", "n_a")),
        col("item_a") === col("it")).drop("it")
      .join(broadcast(itemCounts.withColumnRenamed("n_it", "n_b")),
        col("item_b") === col("it")).drop("it")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
