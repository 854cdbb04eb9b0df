package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (hot LSH
  * buckets, hot join keys): salt the skewed side into `saltFactor` subkeys
  * and replicate the other side across all salts. AQE's skew-join split
  * covers sort-merge joins at runtime; explicit salting is the plan-level
  * tool when a key is so hot a single task would still spill (100 TB rule:
  * never let one key own a partition).
  */
object Skew {

  /** Equi-join `left` ⋈ `right` on `key` with the left side salted.
    * `left` is the large/skewed side (salt = deterministic hash of the whole
    * row spread over saltFactor); `right` is replicated saltFactor× via an
    * exploded salt column, so (key, salt) is an ordinary equi-join key.
    * Result equals the plain join, but each hot key fans across saltFactor
    * tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
