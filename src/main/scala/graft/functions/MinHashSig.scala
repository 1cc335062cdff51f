package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over an `array<string>` shingle column: for
  * each of `k` hash functions, the minimum hash over the shingle set,
  * computed in one fused whole-stage-codegen pass.
  *
  * Hash chain is bit-identical to the composable form in
  * [[graft.ext.Dedup.withMinHash]] (parity-tested in MinHashSpec):
  * per shingle `h = xxhash64(s)` (one string hash), then per function
  * `hashInt(seed, hashLong(h, 42))` (k cheap long rehashes) — the
  * string-hash-once/rehash-k cost shape, but without the k interpreted
  * `array_min(transform(...))` walks (HOFs are CodegenFallback; this is
  * the [[LshSignature]]/SimHash lesson applied to the MinHash path).
  * NULL shingle elements hash to the seed (42), exactly like
  * `xxhash64(null)`. Empty shingle sets yield NULL (callers drop them);
  * NULL input yields NULL.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"signature length k must be in [1, 1024], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("mh")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MinHashSig.compute($a, $k);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Fused kernel shared by interpreted eval and codegen. Null for empty
    * shingle sets (matches `when(size(hs) > 0, ...)`). */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // xxhash64(s): string bytes hashed at seed 42; null element → 42
      val h0 =
        if (shingles.isNullAt(i)) 42L
        else {
          val s = shingles.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      // xxhash64(h0, seed): fold h0 (long) at seed 42, then the int seed
      val h1 = XXH64.hashLong(h0, 42L)
      var s = 0
      while (s < k) {
        val hs = XXH64.hashInt(s, h1)
        if (hs < mins(s)) mins(s) = hs
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column form. */
  def minhash_sig(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), k))
}
