package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Manual scale probe for content-defined chunking: md5-per-position
  * ([[operators.Multimodal.cdcChunks]]) vs the Gear rolling hash
  * ([[operators.Multimodal.cdcChunksGear]]) over N assets × L bytes of
  * synthetic payload — the evidence for SCALING.md's claim that the
  * rolling formulation removes the per-position digest wall (expected
  * ~windowBytes× less hashing plus the digest-vs-Long-arithmetic
  * constant) while producing the same CLASS of chunking (content-derived
  * boundaries, ~boundaryMod expected length; boundary POSITIONS differ —
  * different fingerprint function, same contract).
  *
  * Usage: `sbt "runMain graft.CdcProbe 2000 65536"` (≈128 MB).
  */
object CdcProbe {

  def main(args: Array[String]): Unit = {
    val nAssets = if (args.nonEmpty) args(0).toInt else 2000
    val assetLen = if (args.length > 1) args(1).toInt else 65536
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic pseudo-text payloads, built executor-side (the driver
    // never holds the corpus); every 10th asset is a shifted clone so both
    // operators exercise the dedup path, not just boundary scanning
    val assets = spark.range(nAssets.toLong)
      .select(col("id").as("asset_id"))
      .as[Long]
      .map { id =>
        val seed = if (id % 10 == 0 && id > 0) id - 1 else id
        val rnd = new scala.util.Random(seed * 2654435761L)
        val sb = new StringBuilder(assetLen + 32)
        if (id % 10 == 0 && id > 0) sb.append("inserted prefix bytes ")
        while (sb.length < assetLen) {
          sb.append("w").append(rnd.nextInt(100000)).append(' ')
        }
        (id, sb.toString)
      }
      .toDF("asset_id", "payload_text")
      .repartition(cpus.toInt * 2)
      .localCheckpoint()
    val totalBytes = assets
      .agg(sum(length(col("payload_text")))).head().getLong(0)

    val (nMd5, tMd5) = timed(
      Multimodal.cdcChunks(assets, windowBytes = 8, boundaryMod = 64)
        .count())
    val (nGear, tGear) = timed(
      Multimodal.cdcChunksGear(assets, windowBytes = 8, boundaryMod = 64)
        .count())

    println(s"""{"n_assets":$nAssets,"asset_len":$assetLen,""" +
      s""""total_mb":${totalBytes / (1 << 20)},""" +
      s""""md5_sec":$tMd5,"md5_chunks":$nMd5,""" +
      s""""gear_sec":$tGear,"gear_chunks":$nGear}""")
    spark.stop()
  }
}
