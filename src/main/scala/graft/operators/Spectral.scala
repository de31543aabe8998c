package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed spectral analysis: the corpus's top principal direction
  * by power iteration over an INTEGER-EXACT Gram matrix.
  *
  * The determinism problem with distributed PCA is the Gram accumulation
  * — Σ v·vᵀ as floating sums is partition-order-dependent in its last
  * ulps, and every downstream eigen-quantity inherits the noise. Here
  * each row's contribution is QUANTIZED first — q_ij = ⌊v_i·v_j·2²⁰⌋,
  * an exact integer per row — and the d² cells are summed in 64-bit
  * integers: associative, order-independent, bit-identical at any
  * parallelism (the engine's decimal-sum rule applied to linear
  * algebra). The power iteration then runs on the driver's d×d integer
  * matrix as a FIXED sequence of double ops (ascending-index folds,
  * L∞ normalization per round), which an oracle replays instruction for
  * instruction with a recursive CTE over DuckDB list folds.
  *
  * Scale shape: ONE corpus pass (`mapPartitions` accumulating a d²-long
  * array per partition — the Misra-Gries/treeAggregate discipline;
  * vectors never shuffle, only |partitions|·d² cell rows do), one tiny
  * hash agg, an O(d²) driver collect (d = embedding width, a constant).
  */
object Spectral {

  /** The quantized Gram as (idx = i·d + j, q) rows — d² of them. */
  def gramQuantized(vecs: DataFrame, vecCol: String,
      scale: Long): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col(vecCol)).as[Seq[Float]].mapPartitions { it =>
      var acc: Array[Long] = null
      var d = 0
      it.foreach { v =>
        if (acc == null) { d = v.length; acc = new Array[Long](d * d) }
        var i = 0
        while (i < d) {
          val vi = v(i).toDouble
          var j = 0
          while (j < d) {
            acc(i * d + j) += math.floor(vi * v(j) * scale).toLong
            j += 1
          }
          i += 1
        }
      }
      if (acc == null) Iterator.empty
      else acc.iterator.zipWithIndex.map { case (q, idx) => (idx, q) }
    }.toDF("idx", "q").groupBy(col("idx")).agg(sum(col("q")).as("q"))
  }

  /** Fixed-`iters` power iteration on the d×d quantized Gram: returns
    * the L∞-normalized iterate and the final L∞ scaling factor (the
    * dominant-eigenvalue estimate of the QUANTIZED matrix). Every loop
    * is an ascending-index left fold — the replay contract.
    */
  def powerIterate(g: Array[Long], d: Int,
      iters: Int): (Array[Double], Double) = {
    var x = Array.fill(d)(1.0)
    var m = 1.0
    var k = 0
    while (k < iters) {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += g(i * d + j).toDouble * x(j); j += 1 }
        y(i) = acc
        i += 1
      }
      m = 0.0
      i = 0
      while (i < d) { val a = math.abs(y(i)); if (a > m) m = a; i += 1 }
      val nx = new Array[Double](d)
      i = 0
      while (i < d) { nx(i) = y(i) / m; i += 1 }
      x = nx
      k += 1
    }
    (x, m)
  }

  /** End to end: (dim_idx, loading, eigenvalue) — loadings L2-normalized
    * (ascending-index square fold + one sqrt), eigenvalue = the final L∞
    * factor rescaled by 1/scale (the quantization undone).
    */
  def pcaTopComponent(spark: SparkSession, vecs: DataFrame, vecCol: String,
      scale: Long = 1L << 20, iters: Int = 20): DataFrame = {
    import spark.implicits._
    val cells = gramQuantized(vecs, vecCol, scale)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val d = math.sqrt(cells.length.toDouble).round.toInt
    val g = new Array[Long](d * d)
    cells.foreach { case (idx, q) => g(idx) = q }
    val (x, m) = powerIterate(g, d, iters)
    var l2acc = 0.0
    var i = 0
    while (i < d) { l2acc += x(i) * x(i); i += 1 }
    val l2 = math.sqrt(l2acc)
    (0 until d).map(i => (i.toLong, x(i) / l2, m / scale.toDouble))
      .toDF("dim_idx", "loading", "eigenvalue")
  }
}
