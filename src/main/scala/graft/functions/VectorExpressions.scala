package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst kernel for cosine similarity over embedding arrays.
  *
  * The composable route (`zip_with` + `aggregate`) evaluates higher-order
  * lambdas per element per row — interpreted, allocation-heavy, and outside
  * whole-stage codegen. This expression generates a single fused loop, which
  * is what a 100 TB similarity join spends its time in.
  *
  * Numeric contract (SURVEY §6): each accumulator (dot, ‖a‖², ‖b‖²) is a
  * left-fold over exact float→double products, and the result is
  * `dot / (sqrt(na) * sqrt(nb))` — term-for-term the same IEEE operation
  * sequence as the `aggregate`-based fold and the DuckDB oracle's
  * `list_reduce`, so all three produce bit-identical doubles — for arrays
  * with NO null elements. A null ELEMENT contributes 0.0 here (totality on
  * every ArrayData implementation) while DuckDB arithmetic propagates NULL
  * through the fold, so the engines diverge on a vector that actually
  * contains a null slot; the oracle-compared paths read parquet embedding
  * columns written with non-null elements, where the bit-identical claim
  * holds exactly.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Null ELEMENTS read as 0.0 — explicitly, on every ArrayData
  // implementation. UnsafeArrayData already returns 0.0 for a null slot's
  // primitive read, but GenericArrayData would NPE on the unboxing; pinning
  // the semantics (null element contributes nothing to dot or norms) makes
  // the kernel total instead of representation-dependent.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (av.isNullAt(i)) 0.0
        else if (aF) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (bv.isNullAt(i)) 0.0
        else if (bF) bv.getFloat(i).toDouble else bv.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aV, bV) => {
      // every local is freshName'd: two CosineSim instances can land in one
      // generated function (e.g. full-precision vs quantized side by side)
      // and a bare `i` would collide — janino rejects, Spark silently
      // falls back to interpreted for the whole projection
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (elemIsFloat(left)) s"(double) $aV.getFloat($i)"
                 else s"$aV.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $bV.getFloat($i)"
                 else s"$bV.getDouble($i)"
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        int $n = java.lang.Math.min($aV.numElements(), $bV.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = $aV.isNullAt($i) ? 0.0 : $getA;
          double $y = $bV.isNullAt($i) ? 0.0 : $getB;
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level cosine similarity backed by [[CosineSim]]. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
