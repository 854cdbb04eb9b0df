package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join and spreads the hot key") {
    // hot key: 10k rows of key=1 vs 10 rows of other keys
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, i.toLong))).toDF("key", "payload")
    val right = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched"))
      .toDF("key", "name")

    val plain = left.join(right, Seq("key"))
      .groupBy("key", "name").count()
      .as[(Long, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "key", saltFactor = 8)
      .groupBy("key", "name").count()
      .as[(Long, String, Long)].collect().toSet
    assert(salted === plain)

    // the hot key really fans out across salts
    val saltSpread = left.withColumn("__salt",
      pmod(hash(struct(col("key"), col("payload"))), lit(8)))
      .filter(col("key") === 1L)
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(saltSpread === 8L)
  }
}
