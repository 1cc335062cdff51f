package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH signature over an `array<double>` column:
  * `planes` sign bits (bit p = 1 ⇔ Σⱼ xⱼ·sign(p, j) > 0) computed in one
  * fused whole-stage-codegen loop.
  *
  * Rationale (the SimHash lesson from SCALING.md, applied to the vector
  * path): the composable form — one `aggregate(zip_with(...))` fold per
  * plane — is CodegenFallback, so a 60-plane signature over a d-dim
  * vector costs 60 interpreted array walks per row. This expression is
  * the (b)-rung drop-down like [[CosineSim]]: one allocation-free pass
  * accumulating all plane sums, with the ±1 plane components looked up
  * from a lazily-grown shared sign-mask table instead of re-hashed per
  * row (the sign depends only on (plane, dim), never on the data).
  *
  * Bit-for-bit identical to the composable form
  * ([[graft.ext.Similarity.lshSignatureComposed]], parity-tested in
  * AnnLshSpec), including the edge case where ANY null element nulls
  * every plane fold → signature 0. A NULL input array yields NULL (the
  * composable form mapped it to 0; callers filter null signatures —
  * a vector that doesn't exist shouldn't bucket anywhere).
  */
case class LshSignature(child: Expression, planes: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64,
    s"planes must be in [1, 64] (one 64-bit signature), got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    LshSignature.compute(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshSignature.compute($a, $planes);")

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)

  override def prettyName: String = "lsh_signature"
}

object LshSignature {

  /** Sign masks per dimension index: bit p of `masks(j)` = 1 ⇔ plane p's
    * component at dim j is +1, defined as xxhash64(p, j) (seed 42) being
    * even — the exact hash chain of the composable column form
    * (`xxhash64(lit(p), j)` = XXH64.hashInt(j, XXH64.hashInt(p, 42))).
    * All 64 planes are precomputed per dim, so one global table serves
    * every planes ≤ 64. Lazily grown copy-on-write; reads are lock-free. */
  @volatile private var masks: Array[Long] = new Array[Long](0)

  private def signMasks(n: Int): Array[Long] = {
    val m = masks
    if (m.length >= n) m
    else synchronized {
      val cur = masks
      if (cur.length >= n) cur
      else {
        val grown = java.util.Arrays.copyOf(cur,
          math.max(n, math.max(64, cur.length * 2)))
        var j = cur.length
        while (j < grown.length) {
          var mask = 0L
          var p = 0
          while (p < 64) {
            if ((XXH64.hashInt(j, XXH64.hashInt(p, 42L)) & 1L) == 0L)
              mask |= (1L << p)
            p += 1
          }
          grown(j) = mask
          j += 1
        }
        masks = grown
        grown
      }
    }
  }

  /** Fused kernel shared by interpreted eval and codegen. Any null
    * element → 0L (it nulls every plane's fold in the composable form,
    * and NULL > 0 is false, so every bit lands 0). */
  def compute(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    val m = signMasks(n)
    val sums = new Array[Double](planes)
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return 0L
      val x = v.getDouble(j)
      val mask = m(j)
      var p = 0
      while (p < planes) {
        sums(p) += (if (((mask >>> p) & 1L) != 0L) x else -x)
        p += 1
      }
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      if (sums(p) > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Column form. */
  def lsh_signature(vec: Column, planes: Int): Column =
    GraftBridge.column(LshSignature(GraftBridge.expression(vec), planes))
}
