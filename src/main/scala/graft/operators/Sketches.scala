package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) detection: the exact two-pass pattern a
  * 100 TB corpus scan actually uses.
  *
  * Pass 1 runs a Misra–Gries summary per partition (`mapPartitions`, a
  * bounded map of at most `k-1` counters — O(k) memory at ANY key
  * cardinality) and merges the summaries on the driver with the
  * mergeable-summaries rule (sum counters, subtract the k-th largest,
  * drop non-positive — Agarwal et al., "Mergeable Summaries", PODS'12).
  * The merged summary undercounts any item by at most n/k, so every item
  * with true frequency STRICTLY above n/k survives as a candidate — and
  * at most k-1 candidates exist.
  *
  * Pass 2 broadcasts the candidate set back over the data and counts the
  * candidates EXACTLY (a filtered hash agg whose key space is ≤ k-1 —
  * map-side partials collapse it to almost nothing before the shuffle).
  * The final filter `k·count > n` therefore returns the exact
  * heavy-hitter set: recall from the sketch guarantee, precision from
  * the exact recount. Nothing here is approximate in the OUTPUT — the
  * sketch only prunes the candidate space so no full-cardinality
  * aggregation ever runs.
  *
  * Why not one exact `groupBy(item)` + HAVING? At corpus scale the item
  * space (e.g. the token vocabulary) is orders of magnitude larger than
  * the answer; the two-pass shape shuffles ≤ k-1 partial counters per
  * partition instead of the full vocabulary. Reference analogy: the
  * reduce-side key-space contract of the partitioned execution mode
  * (`EmbulkPartitioningMapReduce.java:145-186`) with a map-side sketch
  * standing in for the full shuffle.
  */
object Sketches {

  /** Misra–Gries summary: at most `k-1` counters; any item's count is
    * underestimated by at most (processed items)/k.
    */
  private[graft] def misraGries(items: Iterator[String],
      k: Int): mutable.Map[String, Long] = {
    val counters = mutable.Map.empty[String, Long]
    items.foreach { it =>
      if (counters.contains(it)) counters(it) += 1L
      else if (counters.size < k - 1) counters(it) = 1L
      else {
        // decrement-all: drop every counter by one, evict zeros
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val v = counters(key) - 1L
          if (v <= 0L) dead += key else counters(key) = v
        }
        dead.foreach(counters.remove)
      }
    }
    counters
  }

  /** Mergeable-summaries combine: sum counters, then subtract the k-th
    * largest value and drop non-positives, restoring the ≤ k-1 size
    * bound while keeping total undercount ≤ n/k.
    */
  private[graft] def mergeSummaries(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long], k: Int): mutable.Map[String, Long] = {
    b.foreach { case (key, v) => a(key) = a.getOrElse(key, 0L) + v }
    if (a.size >= k) {
      val kth = a.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = a.iterator.collect {
        case (key, v) if v - kth <= 0L => key
      }.toList
      dead.foreach(a.remove)
      a.keysIterator.toList.foreach(key => a(key) -= kth)
    }
    a
  }

  /** Exact items with `k · freq(item) > total` (strictly above a 1/k
    * frequency share), via the sketch-pruned two-pass plan above.
    * Output: item, cnt, share (one IEEE division — engine-replayable).
    */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k >= 2, s"heavyHitters needs k >= 2, got $k")
    val items = df.select(item.cast("string").as("item"))
    val spark = df.sparkSession
    import spark.implicits._
    // pass 1: per-partition Misra-Gries (one ≤k-1-entry map per
    // partition crosses to the driver), mergeable combine there. The
    // partition's item count rides the same summary row (one long), so
    // n_total needs no third pass over the input — the former
    // crossJoin(broadcast(df.agg(count))) subtree re-ran the whole
    // upstream pipeline (for heavy_words: a full corpus re-tokenize)
    // just to count rows.
    val summaries = items.as[String].rdd
      .mapPartitions { it =>
        var n = 0L
        val mg = misraGries(it.map { x => n += 1; x }, k)
        Iterator.single((mg, n))
      }
      .collect()
    val candidates = summaries.map(_._1)
      .foldLeft(mutable.Map.empty[String, Long])(mergeSummaries(_, _, k))
      .keys.toSeq.sorted
    // nTotal is SNAPSHOTTED at call time (ADVICE r18): the MG summary
    // collect already counted every partition's rows, so the total rides
    // as a literal instead of a crossJoin(agg(count)) re-tokenize. The
    // returned frame's cnt re-derives from the source at execution, so
    // the call-time snapshot assumes immutable input — the engine's
    // parquet contract; a mutable-source caller must re-invoke.
    val nTotal = summaries.map(_._2).sum
    // pass 2: candidate filter BEFORE the aggregation — the recount's
    // key space is ≤ k-1, never the item cardinality (InSet, codegen'd)
    items.where(col("item").isin(candidates: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(k.toLong) > lit(nTotal))
      .select(col("item"), col("cnt"),
        (col("cnt").cast("double") / lit(nTotal).cast("double"))
          .as("share"))
  }
}
