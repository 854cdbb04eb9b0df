package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Morton-curve layout: interleave arithmetic, determinism, and the
  * locality property that justifies it — contiguous z-ranges are narrow
  * in EVERY clustered column, not just the leading sort key. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed bit positions") {
    // col0=0b11, col1=0b01 at bits=2: col0 bit0→pos0, bit1→pos2;
    // col1 bit0→pos1, bit1→pos3 ⇒ z = 1 + 4 + 2 = 7
    val got = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 2).as("z"))
      .as[Long].head()
    assert(got === 7L)
    assert(Seq((0L, 0L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 2).as("z"))
      .as[Long].head() === 0L)
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("a"), col("b")), 32) // 64 bits > 62
    }
  }

  test("zValues: deterministic, partitioning-invariant, within range") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val z1 = ZOrder.zValues(df, Seq("x", "y"), bits = 6)
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSet
    val z2 = ZOrder.zValues(df.repartition(13), Seq("x", "y"), bits = 6)
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSet
    assert(z1 === z2)
    assert(z1.forall { case (_, _, z) => z >= 0 && z < (1L << 12) })
    // the full 64x64 grid at 6 bits is a bijection onto 0..4095
    assert(z1.map(_._3).size === 4096)
  }

  test("zValues: full-range and hash-valued long columns stay sane " +
      "(the BIGINT formulation overflowed past 2^(63-bits) ranges)") {
    // extremes + hash-like values: range = 2^64-ish, where
    // (x - mn) * 2^bits wrapped under BIGINT arithmetic and produced
    // negative/garbage z-values; the DECIMAL(38,0) path must bucket
    // them monotonically into [0, 2^bits)
    val rows = Seq(
      (Long.MinValue, 0L), (Long.MaxValue, 1L), (-1L, 2L), (0L, 3L),
      (7730967624485223907L, 4L), (-8913761212898315023L, 5L))
    val df = rows.toDF("h", "i")
    val z = ZOrder.zValues(df, Seq("h", "i"), bits = 4)
      .select("h", "z").as[(Long, Long)].collect().toMap
    assert(z.values.forall(v => v >= 0 && v < (1L << 8)),
      s"z out of range: $z")
    // bucketing must be monotone in the column value
    val ordered = rows.map(_._1).sorted.map(z)
    // extract h's bucket (even bit positions of z, j=0 of 2 cols)
    def hBucket(zv: Long): Long =
      (0 until 4).map(b => ((zv >> (2 * b)) & 1L) << b).sum
    val hb = ordered.map(hBucket)
    assert(hb === hb.sorted, s"non-monotone buckets: $hb")
    assert(hb.head === 0L && hb.last === (1L << 4) - 1,
      s"extremes must land in the first/last bucket: $hb")
  }

  test("locality: z-order keeps per-partition min/max narrow in BOTH " +
      "columns; a linear sort only in its leading key") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    def spreads(laid: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val per = laid.select("x", "y").as[(Long, Long)]
        .mapPartitions { rows =>
          if (rows.isEmpty) Iterator.empty
          else {
            var mnx, mny = Long.MaxValue
            var mxx, mxy = Long.MinValue
            rows.foreach { case (x, y) =>
              mnx = math.min(mnx, x); mxx = math.max(mxx, x)
              mny = math.min(mny, y); mxy = math.max(mxy, y)
            }
            Iterator.single((mxx - mnx, mxy - mny))
          }
        }.collect()
      (per.map(_._1).sum, per.map(_._2).sum)
    }
    val (zx, zy) = spreads(
      ZOrder.zOrderBy(df, Seq("x", "y"), bits = 6, partitions = 16))
    val (lx, ly) = spreads(df.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    // linear sort: x razor-thin, y spans the world
    assert(lx < zx, s"linear leading-key spread $lx vs z $zx")
    assert(ly > 900, s"linear y-spread $ly should be ~full-range")
    // z-order: BOTH columns materially narrower than the linear loser
    assert(zy < ly / 2, s"z y-spread $zy vs linear $ly")
    assert(zx < 900 && zy < 900, s"z spreads ($zx, $zy) must stay bounded")
  }
}
