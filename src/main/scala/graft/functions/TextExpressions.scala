package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingling kernel.
  *
  * The composable formulation (`transform(sequence(...), i => concat_ws(...,
  * element_at(toks, i+j)))` + `array_distinct`) interprets a lambda stack
  * per shingle per row — profiled at ~2-3 ms/doc, the single hottest step of
  * the dedup pipeline at sf0.1. This kernel does the same work in one Java
  * pass (~µs/doc).
  *
  * Contract (must stay mirror-exact with the DuckDB oracle, SURVEY §6):
  * input is already-normalized single-spaced text; tokens = split on space;
  * fewer than n tokens ⇒ one shingle = the whole string; otherwise the
  * distinct n-grams in first-occurrence order.
  */
/** Static kernel shared by interpreted eval and generated code. */
object WordShinglesKernel {
  def compute(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    val toks = text.split(" ")
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(text)))
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val k = toks.length - (n - 1)
      while (i < k) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    }
  }
}

case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input and n >= 1, got " +
        s"${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShinglesKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Distinct word n-gram shingles of a (normalized) text column. */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
