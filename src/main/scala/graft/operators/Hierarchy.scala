package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening by pointer doubling: root / depth / materialized
  * path for every node of a parent-pointer forest (org charts, BOM
  * explosions, category trees).
  *
  * The naive walk joins once per LEVEL — O(depth) shuffles, hopeless for
  * deep chains. Pointer jumping squares the known-ancestor distance each
  * round (`anc ← anc.anc`, accumulating depth and the path segment), so a
  * depth-d forest finishes in ⌈log₂ d⌉ self-joins on the pointer key —
  * the PRAM list-ranking discipline expressed as DataFrame equi-joins.
  * Every round is a plain shuffled join on one long key; the frame stays
  * |nodes| rows; lineage is truncated per round via `localCheckpoint`
  * (the E31 PageRank discipline) so plan size stays constant.
  *
  * State per node: the furthest KNOWN ancestor `anc`, the distance
  * `depth` to it, and `path` = the id chain (anc, node] rendered
  * "a/b/node" (anc itself excluded so segments concatenate exactly).
  * A node is settled once `anc` is a root; settled rows drop out of the
  * join (only unsettled rows probe), so late rounds shrink to the few
  * deepest chains.
  */
object Hierarchy {

  /** Flatten `nodes(id, parent)` — `parent` NULL marks a root. Returns
    * (id, root, depth, path) with path = "root/…/id". `maxRounds` bounds
    * the doubling loop (2^maxRounds ≥ deepest chain); a forest deeper
    * than the bound fails loudly rather than returning wrong rows.
    */
  def flatten(nodes: DataFrame, maxRounds: Int = 20): DataFrame = {
    val idStr = col("id").cast("string")
    var frame = nodes.select(col("id").cast("long").as("id"),
        col("parent").cast("long").as("anc"),
        when(col("parent").isNull, lit(0)).otherwise(lit(1)).as("depth"),
        when(col("parent").isNull, lit("")).otherwise(idStr).as("path"),
        col("parent").isNull.as("settled"))
      .withColumn("anc", coalesce(col("anc"), col("id")))
      .localCheckpoint()
    var round = 0
    var remaining = frame.where(!col("settled")).limit(1).count()
    while (remaining > 0L && round < maxRounds) {
      val anc = frame.select(col("id").as("a_id"), col("anc").as("a_anc"),
        col("depth").as("a_depth"), col("path").as("a_path"),
        col("settled").as("a_settled"))
      val jumped = frame.where(!col("settled"))
        .join(anc, col("anc") === col("a_id"))
        .select(col("id"), col("a_anc").as("anc"),
          (col("depth") + col("a_depth")).as("depth"),
          when(col("a_path") === "", col("path"))
            .otherwise(concat(col("a_path"), lit("/"), col("path")))
            .as("path"),
          col("a_settled").as("settled"))
      frame = frame.where(col("settled")).unionByName(jumped)
        .localCheckpoint()
      remaining = frame.where(!col("settled")).limit(1).count()
      round += 1
    }
    require(remaining == 0L,
      s"hierarchy deeper than 2^$maxRounds or contains a cycle")
    frame.select(col("id"), col("anc").as("root"), col("depth"),
      when(col("path") === "", col("id").cast("string"))
        .otherwise(concat(col("anc").cast("string"), lit("/"), col("path")))
        .as("path"))
  }
}
