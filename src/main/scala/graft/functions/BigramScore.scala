package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The trained interpolated-bigram model as a driver-held artifact: the
  * one-row output of [[graft.ext.TextOps.bigramLm]] collected into plain
  * Scala maps (vocab ≤ a few hundred entries — KBs at any corpus scale,
  * the bloom-bits/PQ-codebook broadcast-scalar lifecycle). Shipping the
  * model INSIDE the scoring expression (instead of cross-joining the
  * one-row frame) is also what removes the per-position interpreted
  * `element_at` map scans — the expression probes executor-local
  * [[java.util.HashMap]]s rebuilt once per deserialized instance. */
case class BigramModel(uni: Map[String, Double], oovP: Double,
                       bi: Map[String, Map[String, Double]])
    extends Serializable

/** Native interpolated-bigram log-probability over an `array<string>`
  * token column — the [[MinHashSig]]/[[LshSignature]] treatment applied
  * to [[graft.ext.TextOps.perplexityBigram]]'s scoring pass: ONE fused
  * whole-stage-codegen loop per document instead of a per-position
  * interpreted `aggregate` lambda (two `element_at` map scans + CaseWhen
  * tree per token — measured ~5× x39's scoring constant at sf0.1).
  *
  * Bit-identical to the composable fold (CorpusQualitySpec parity):
  * position 1 contributes ln P_uni(w₁); position i > 1 contributes
  * ln(λ·P_bi(wᵢ|wᵢ₋₁) + (1−λ)·P_uni(wᵢ)) with missing-history/
  * missing-bigram → P_bi = 0 and OOV → P_uni = oov_p, accumulated
  * left-to-right in the same order with the same `1−λ` constant folded
  * at construction and `StrictMath.log` (Spark's `ln`). Empty token
  * arrays yield 0.0 (the composable form is undefined there — its
  * `sequence(1, 0)` guard never sees one on real input); NULL input
  * yields NULL.
  */
case class BigramScore(child: Expression, model: BigramModel, lambda: Double)
    extends UnaryExpression {
  require(lambda >= 0 && lambda < 1, s"lambda must be in [0,1), got $lambda")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_lp expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // folded exactly like the composable form's lit(1 - lambda)
  private val oneMinusLambda: Double = 1 - lambda

  /** UTF8String-keyed lookup tables, built once per (deserialized)
    * expression instance — executors pay the conversion once per task
    * set, not per row. */
  @transient private lazy val uniMap: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](model.uni.size * 2)
    model.uni.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Double.valueOf(v))
    }
    m
  }
  @transient private lazy val biMap
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Double]] = {
    val m = new java.util.HashMap[
      UTF8String, java.util.HashMap[UTF8String, java.lang.Double]](model.bi.size * 2)
    model.bi.foreach { case (w1, inner) =>
      val im = new java.util.HashMap[UTF8String, java.lang.Double](inner.size * 2)
      inner.foreach { case (w2, p) =>
        im.put(UTF8String.fromString(w2), java.lang.Double.valueOf(p))
      }
      m.put(UTF8String.fromString(w1), im)
    }
    m
  }

  /** The fused scoring kernel — called from both interpreted eval and the
    * generated code (via an [[CodegenContext.addReferenceObj]] handle). */
  def score(toks: ArrayData): Double = {
    val n = toks.numElements()
    var acc = 0.0
    var i = 0
    var prev: UTF8String = null
    while (i < n) {
      val w = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val pu = uniMap.get(w)
      val puni = if (pu == null) model.oovP else pu.doubleValue()
      if (i == 0) acc += StrictMath.log(puni)
      else {
        val inner = biMap.get(prev)
        val pb = if (inner == null) null else inner.get(w)
        val pbi = if (pb == null) 0.0 else pb.doubleValue()
        acc += StrictMath.log(lambda * pbi + oneMinusLambda * puni)
      }
      prev = w
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any): Any = score(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramScore", this,
      classOf[BigramScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramScore =
    copy(child = newChild)

  override def prettyName: String = "bigram_lp"
}

object BigramScore {
  /** Column form. */
  def bigram_lp(toks: Column, model: BigramModel, lambda: Double): Column =
    GraftBridge.column(BigramScore(GraftBridge.expression(toks), model, lambda))
}
