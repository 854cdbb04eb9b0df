package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column queries over synthetic binary payloads (document text
  * bytes stand in for media; the decode itself is stubbed — see
  * [[graft.operators.Multimodal]]). The SQL-expressible plumbing (binary
  * columns, metadata, frame offsets) is oracle-checked; the stub decoder
  * path is covered by MultimodalSpec.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + typed metadata: byte length and content hash.
    "m01_asset_metadata" -> ((s, d) => {
      val assets = Multimodal.asAssetTable(Tables.documents(s, d),
        "doc_id", "text", "text")
      assets.select(col("asset_id"), col("meta.n_bytes").as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
    }),

    // Frame sampling over the binary column: every 2nd 16-byte frame.
    "m02_frame_sample" -> ((s, d) => {
      val assets = Multimodal.asAssetTable(Tables.documents(s, d),
        "doc_id", "text", "video")
      Multimodal.sampleFrames(assets, frameBytes = 16, stride = 2)
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_frames"), max(col("frame_idx")).as("last_idx"))
    }),
    // Resize stub: 2:1 stride decimation of the payload stream; the
    // decimated payload re-hashes deterministically in any engine.
    "m03_resize_stride" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("resized", Multimodal.resizeStride(col("text"), 2))
        .select(col("doc_id").as("asset_id"),
          length(col("resized")).as("n_chars_resized"),
          md5(col("resized").cast("binary")).as("resized_md5"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m03_resize_stride" ->
      """SELECT doc_id AS asset_id,
        |  length(regexp_replace(text, '([\s\S])[\s\S]{0,1}', '\1', 'g')) AS n_chars_resized,
        |  md5(regexp_replace(text, '([\s\S])[\s\S]{0,1}', '\1', 'g')) AS resized_md5
        |FROM documents""".stripMargin,
    "m01_asset_metadata" ->
      """SELECT doc_id AS asset_id, strlen(text) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,
    "m02_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(floor(length(text) / 16) AS BIGINT) AS n
        |  FROM documents)
        |SELECT asset_id, (n - 1) // 2 + 1 AS n_frames,
        |  ((n - 1) // 2) * 2 AS last_idx
        |FROM f WHERE n > 0""".stripMargin,
  )
}
