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
    // Content-defined chunking + cross-asset chunk dedup: every 10th
    // asset re-enters with bytes INSERTED at the front — fixed-size
    // blocking would misalign every block after the insertion, but CDC
    // boundaries re-synchronize at the first content-derived cut, so
    // the clone's tail chunks dedup against the original's
    // (n_assets_sharing > 1). The oracle re-derives every boundary,
    // chunk hash and sharing count.
    "m04_cdc_chunks" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val shifted = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(lit("inserted prefix bytes "), col("text")).as("text"))
      val assets = docs.unionByName(shifted)
        .select(col("doc_id").as("asset_id"),
          col("text").as("payload_text"))
      Multimodal.cdcChunks(assets, windowBytes = 8, boundaryMod = 64)
    }),
    // CDC with the TRUE rolling hash (Gear/FastCDC family) — the same
    // insertion-resync fixture as m04, boundaries from an O(1)-per-byte
    // rolling recurrence in ONE mapPartitions pass instead of an md5
    // digest per position. The oracle re-derives the 256-entry gear
    // table from md5 per character and every windowed SUM per position
    // (each fits BIGINT exactly — no wraparound in the recurrence, so
    // the rolling and per-position formulations are provably equal),
    // then every chunk hash and sharing count.
    "m05_cdc_gear" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val shifted = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(lit("inserted prefix bytes "), col("text")).as("text"))
      val assets = docs.unionByName(shifted)
        .select(col("doc_id").as("asset_id"),
          col("text").as("payload_text"))
      Multimodal.cdcChunksGear(assets, windowBytes = 8, boundaryMod = 64)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m04_cdc_chunks" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, text AS p FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000 AS asset_id,
        |    'inserted prefix bytes ' || text AS p
        |  FROM documents WHERE doc_id % 10 = 0),
        |ends AS (
        |  SELECT asset_id, e FROM (
        |    SELECT a.asset_id, a.p,
        |      unnest(generate_series(8, length(a.p))) AS e
        |    FROM assets a)
        |  WHERE ('0x' || substr(md5(substr(p, (e - 7)::INT, 8)),
        |    1, 8))::BIGINT % 64 = 0
        |  UNION
        |  SELECT asset_id, length(p) AS e FROM assets WHERE length(p) > 0),
        |chunks AS (
        |  SELECT asset_id,
        |    row_number() OVER (PARTITION BY asset_id ORDER BY e) - 1
        |      AS chunk_idx,
        |    COALESCE(lag(e) OVER (PARTITION BY asset_id ORDER BY e) + 1, 1)
        |      AS start,
        |    e - COALESCE(lag(e) OVER (PARTITION BY asset_id ORDER BY e)
        |      + 1, 1) + 1 AS chunk_len
        |  FROM ends),
        |withmd5 AS (
        |  SELECT c.asset_id, c.chunk_idx, c.start, c.chunk_len,
        |    md5(substr(a.p, c.start::INT, c.chunk_len::INT)) AS chunk_md5
        |  FROM chunks c JOIN assets a ON a.asset_id = c.asset_id),
        |sh AS (
        |  SELECT chunk_md5, count(DISTINCT asset_id) AS n_assets_sharing
        |  FROM withmd5 GROUP BY chunk_md5)
        |SELECT w.asset_id, w.chunk_idx, w.start, w.chunk_len,
        |  w.chunk_md5, s.n_assets_sharing
        |FROM withmd5 w JOIN sh s ON s.chunk_md5 = w.chunk_md5""".stripMargin,
    "m05_cdc_gear" ->
      """WITH assets AS (
        |  SELECT doc_id AS asset_id, text AS p FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000 AS asset_id,
        |    'inserted prefix bytes ' || text AS p
        |  FROM documents WHERE doc_id % 10 = 0),
        |pos AS (
        |  SELECT a.asset_id, a.p, u.e
        |  FROM assets a, LATERAL unnest(generate_series(8, length(a.p)))
        |    AS u(e)),
        |chars AS (
        |  SELECT asset_id, e, j.j AS j, substr(p, (e - j.j)::INT, 1) AS c
        |  FROM pos, range(0, 8) j(j)),
        |g AS (
        |  SELECT c, ('0x' || substr(md5(c), 1, 10))::BIGINT AS gv
        |  FROM (SELECT DISTINCT c FROM chars)),
        |h AS (
        |  SELECT ch.asset_id, ch.e, sum(g.gv * (1::BIGINT << ch.j)) AS hv
        |  FROM chars ch JOIN g USING (c)
        |  GROUP BY ch.asset_id, ch.e),
        |ends AS (
        |  SELECT asset_id, e FROM h WHERE hv % 64 = 0
        |  UNION
        |  SELECT asset_id, length(p) AS e FROM assets WHERE length(p) > 0),
        |chunks AS (
        |  SELECT asset_id,
        |    row_number() OVER (PARTITION BY asset_id ORDER BY e) - 1
        |      AS chunk_idx,
        |    COALESCE(lag(e) OVER (PARTITION BY asset_id ORDER BY e) + 1, 1)
        |      AS start,
        |    e - COALESCE(lag(e) OVER (PARTITION BY asset_id ORDER BY e)
        |      + 1, 1) + 1 AS chunk_len
        |  FROM ends),
        |withmd5 AS (
        |  SELECT c.asset_id, c.chunk_idx, c.start, c.chunk_len,
        |    md5(substr(a.p, c.start::INT, c.chunk_len::INT)) AS chunk_md5
        |  FROM chunks c JOIN assets a ON a.asset_id = c.asset_id),
        |sh AS (
        |  SELECT chunk_md5, count(DISTINCT asset_id) AS n_assets_sharing
        |  FROM withmd5 GROUP BY chunk_md5)
        |SELECT w.asset_id, w.chunk_idx, w.start, w.chunk_len,
        |  w.chunk_md5, s.n_assets_sharing
        |FROM withmd5 w JOIN sh s ON s.chunk_md5 = w.chunk_md5""".stripMargin,
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
