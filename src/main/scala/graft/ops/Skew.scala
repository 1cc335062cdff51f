package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB toolbox, SCALING.md).
  *
  * AQE's skew-join split handles most runtime skew; explicit salting is
  * the deterministic fallback when one key dominates so hard that even a
  * split partition exceeds executor memory, or when AQE is unavailable
  * (e.g. inside a cached stage).
  */
object Skew {

  /** Salted inner equi-join: the skewed (fact) side gets a random-ish but
    * DETERMINISTIC salt in [0, buckets) derived from a row fingerprint;
    * the small side is replicated `buckets` times. The join key becomes
    * (key, salt), fanning one hot key across `buckets` reducers.
    *
    * Replication multiplies the small side by `buckets` — use only when
    * small-side-rows × buckets stays broadcast-scale.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
