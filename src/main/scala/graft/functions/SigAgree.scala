package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Number of positions where two `array<long>` MinHash signatures agree —
  * the kernel of the estimated-Jaccard recheck on candidate pairs
  * (est_jaccard = sig_agree / k).
  *
  * The composable form — `aggregate(zip_with(a, b, ==), sum)` — is
  * CodegenFallback and runs once per CANDIDATE PAIR, which is the
  * verification hot path of every LSH dedup job (candidates ≈ 10× corpus
  * rows under the bucket caps). This is the third [[CosineSim]]-style
  * drop-down: one fused allocation-free loop, whole-stage codegen.
  * NULL if either input is NULL or lengths mismatch (a mismatched
  * signature pair is a caller bug, not agreement 0). */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_agree expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgree.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("agree")
      s"""
         |java.lang.Integer $boxed = graft.functions.SigAgree.compute($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigAgree = copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agree"
}

object SigAgree {
  /** Null (boxed) for length mismatch or null elements. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Integer = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var agree = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    java.lang.Integer.valueOf(agree)
  }

  /** Column form. */
  def sig_agree(a: Column, b: Column): Column =
    GraftBridge.column(SigAgree(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
