package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product — the one
  * hot scalar where the built-in composition (`aggregate(zip_with(...))`)
  * falls short: the fold materializes an intermediate array per row and
  * its higher-order-function lambdas stay outside simple codegen. This
  * expression generates a tight primitive loop inside whole-stage codegen
  * (preference order (b) from the build brief: native Expression > UDF).
  *
  * Determinism contract: the loop accumulates left-to-right in double,
  * exactly like `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)` and
  * exactly like the DuckDB oracle's `list_reduce(list_prepend(0.0, ...))`
  * — so swapping it into oracled queries is bit-safe.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression counting agreeing positions of two
  * `array<bigint>` columns — the MinHash signature-similarity kernel.
  * The built-in spelling `size(filter(zip_with(a, b, eq-or-null),
  * notNull))` allocates an intermediate array per candidate pair and its
  * lambdas evaluate interpreted; candidate-verify is exactly the stage
  * whose row count explodes with near-dup density, so it earns the same
  * preference-order-(b) treatment as [[FloatVectorDot]]. Semantics are
  * identical (positionwise equality over the common prefix), so swapping
  * it into the rows-only sketch queries changes no values.
  */
case class LongArrayAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agreement"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        int $c = 0;
        for (int $i = 0; $i < $n; $i++) {
          if ($x.getLong($i) == $y.getLong($i)) $c++;
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayAgreement =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Count of agreeing positions of two `array<bigint>` columns. */
  def sig_agreement(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayAgreement(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product of two `array<float>` columns in double precision. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Cosine similarity (norms recomputed — precompute per vector when the
    * column feeds a join, see [[graft.llmops.Similarity.bruteForceTopK]]).
    */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
