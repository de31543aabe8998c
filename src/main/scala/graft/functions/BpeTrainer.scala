package graft.functions

import scala.collection.mutable

/** Deterministic BPE merge-table training (Sennrich et al. 2016): start
  * from single characters, repeatedly merge the most frequent adjacent
  * symbol pair across the (word → frequency) table; ties break to the
  * lexicographically smallest (left, right) pair, so the output is a pure
  * function of the word counts.
  *
  * The distributed part — pre-tokenizing the corpus and aggregating word
  * frequencies — runs in Spark ([[graft.BpeTrain]]); only the vocabulary-
  * sized frequency table reaches this in-memory loop, the same shape a
  * 100 TB run would use (word-count agg is one map-side-combined shuffle;
  * the driver holds one row per distinct word, what a tokenizer-training
  * job holds anyway).
  */
object BpeTrainer {

  def train(wordCounts: Seq[(String, Long)], maxMerges: Int,
      minFreq: Long = 2L): Seq[(String, String)] = {
    // word → (symbols, freq); only multi-symbol words participate
    var words: Vector[(Array[String], Long)] = wordCounts
      .filter(_._1.length > 1).sortBy(_._1)
      .map { case (w, c) =>
        val syms = mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i); val n = Character.charCount(cp)
          syms += w.substring(i, i + n); i += n
        }
        (syms.toArray, c)
      }.toVector
    val merges = mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.length < maxMerges) {
      // pair frequencies (overlapping occurrences all count, the
      // classic formulation — application is still left-to-right
      // non-overlapping, both here and in the encoder)
      val freq = mutable.HashMap[(String, String), Long]()
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        freq.updateWith((syms(j), syms(j + 1)))(p => Some(p.getOrElse(0L) + c))
      val best = freq.filter(_._2 >= minFreq)
      if (best.isEmpty) continue = false
      else {
        val ((l, r), _) = best.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r))
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = mutable.ArrayBuffer[String]()
            var k = 0
            while (k < syms.length) {
              if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
                out += l + r; k += 2
              } else { out += syms(k); k += 1 }
            }
            (out.toArray, c)
          }
        }
      }
    }
    merges.toSeq
  }
}
