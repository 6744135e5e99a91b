package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Compiled float-vector kernels for the ANN operators.
  *
  * Semantics are bit-identical to the declarative spec in
  * [[graft.operators.Similarity.dotSpec]] (`aggregate(zip_with(x, y,
  * p·q), 0.0, +)` — left-to-right double accumulation), but run as one
  * whole-stage-codegen'd loop instead of nested interpreted higher-order
  * functions. The HOF chain allocates a zipped array and evaluates two
  * lambda closures per element; at 100 TB the dot product is the inner
  * loop of every ANN probe join, so it must be a tight scalar loop.
  *
  * Null parity with the HOF chain: null input → null; length mismatch →
  * null (zip_with pads with null, null element nullifies the sum); a
  * null element likewise nullifies the result (only possible when the
  * array type says containsNull — the check is compiled out otherwise).
  */
abstract class FloatVecBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Both inputs must be array<float>: the kernel reads elements with
    * `getFloat`, which on a double/decimal-backed array would silently
    * reinterpret bytes. SQL users of graft_dot/graft_cosine get a clean
    * analysis error instead (cast to array<float> explicitly).
    */
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} requires (array<float>, array<float>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  protected def leftNullableElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  protected def rightNullableElems: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull
}

/** dot(x, y) = Σ xᵢ·yᵢ in double, sequential accumulation. */
case class FloatDotExpr(left: Expression, right: Expression)
  extends FloatVecBinaryExpr {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = leftNullableElems || rightNullableElems
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (leftNullableElems || rightNullableElems)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot(a,b) / √dot(a,a) / √dot(b,b), all three dots
  * accumulated in ONE pass over the arrays (same per-accumulator fp op
  * sequence as three separate folds → identical doubles, 3× less work).
  */
case class FloatCosineExpr(left: Expression, right: Expression)
  extends FloatVecBinaryExpr {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = leftNullableElems || rightNullableElems
    var dxy = 0.0
    var dxx = 0.0
    var dyy = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xd = x.getFloat(i).toDouble
      val yd = y.getFloat(i).toDouble
      dxy += xd * yd
      dxx += xd * xd
      dyy += yd * yd
      i += 1
    }
    dxy / math.sqrt(dxx) / math.sqrt(dyy)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dxy = ctx.freshName("dxy")
      val dxx = ctx.freshName("dxx")
      val dyy = ctx.freshName("dyy")
      val xd = ctx.freshName("xd")
      val yd = ctx.freshName("yd")
      val nullCheck =
        if (leftNullableElems || rightNullableElems)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dxy = 0.0;
         |  double $dxx = 0.0;
         |  double $dyy = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    final double $xd = (double) $x.getFloat($i);
         |    final double $yd = (double) $y.getFloat($i);
         |    $dxy += $xd * $yd;
         |    $dxx += $xd * $xd;
         |    $dyy += $yd * $yd;
         |  }
         |  ${ev.value} = $dxy / Math.sqrt($dxx) / Math.sqrt($dyy);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graft.ColumnBridge

  def dotc(x: Column, y: Column): Column =
    ColumnBridge.column(FloatDotExpr(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  def cosinec(a: Column, b: Column): Column =
    ColumnBridge.column(FloatCosineExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
