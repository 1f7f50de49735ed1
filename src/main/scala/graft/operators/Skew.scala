package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins at scale: salt the fact side's join key so
  * a hot key spreads over `buckets` reducers, and replicate the dim side
  * once per salt. Semantically identical to the plain join (verified in
  * OperatorsSpec); use when one key dominates the key distribution and
  * AQE's skew-join split isn't available or sufficient.
  */
object Skew {

  /** Inner-join `fact ⋈ dim` on `key`, salted.
    *
    * @param uniqueCol a fact column making the salt deterministic (so
    *                  results are stable across retries/partitionings)
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      uniqueCol: String,
      buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(key), col(uniqueCol)), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
