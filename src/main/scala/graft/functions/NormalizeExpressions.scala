package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization + ASCII-control cleanup — the first stage
  * every web-scale text pipeline runs before hashing/deduplicating text
  * (the same byte sequence can arrive composed or decomposed; fingerprints
  * built on raw bytes split what is visually one document).
  *
  * Contract (mirror-exact with the DuckDB oracle, SURVEY §6):
  *   1. NFC-normalize (canonical composition, `java.text.Normalizer`;
  *      DuckDB replays with `nfc_normalize`).
  *   2. Every char in `[\x00-\x20\x7F]` (ASCII controls, space, DEL) is
  *      whitespace; runs collapse to one space; leading/trailing trimmed.
  *      (Non-ASCII Unicode spaces are deliberately out of contract — NFC
  *      never produces them from ASCII and RE2/Java regex class semantics
  *      would have to agree on `\p{Z}`, which they don't.)
  *
  * Scale shape: pure narrow map, codegen'd, zero shuffle — linear to any
  * corpus size. The reference has no text surface; this extends its
  * map-phase cleanup stage (`EmbulkMapReduce.java` mapper) to text.
  */
object NfcCleanKernel {
  def compute(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = nfc.charAt(i)
      if (c <= ' ' || c == '\u007F') {
        if (sb.length > 0) pendingSpace = true // leading ws drops
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing ws never appended
  }
}

case class NfcClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_clean requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcCleanKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcCleanKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_clean"
}

object NormalizeFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** NFC-compose + control-strip + whitespace-collapse a text column. */
  def nfcClean(text: Column): Column =
    ColumnBridge.column(NfcClean(ColumnBridge.expression(text)))
}
