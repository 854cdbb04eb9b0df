package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded/processed multimodal asset row. */
case class AssetFeatures(
    asset_id: Long,
    modality: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media as opaque `binary` columns with a typed metadata struct,
  * processed executor-side in batches.
  *
  * IMAGE decode is real — [[decodeImage]] uses the JDK's bundled
  * `javax.imageio` codecs (PNG/JPEG/GIF/BMP) with luminance-grid feature
  * extraction. AUDIO decode is real for WAV/PCM — [[decodeAudio]] uses the
  * JDK's bundled `javax.sound.sampled` RIFF parser with per-window RMS
  * feature extraction. VIDEO decode remains STUBBED behind [[decodeStub]]
  * (no container/codec demuxers exist in this environment) — a
  * deterministic fake that derives "features" from payload bytes, and the
  * default for the oracle-checked queries (the driver fixtures are
  * synthetic bytes, not real media). Everything around the decoders is
  * the real engineering surface: schema, binary column plumbing,
  * per-partition batch processing (`mapPartitions` — the Scala analog of
  * arrow-batched python UDFs), and the feature-vector handoff into the
  * kNN/dedup operators.
  */
object Multimodal {

  /** Deterministic fake decoder: PLACEHOLDER for a real image/audio decode.
    * Derives `dim` pseudo-features from payload bytes (stable across runs /
    * partitionings). Swap with a real codec call; the pipeline shape —
    * bytes in, float features out, executed per-partition on executors —
    * is what a real implementation keeps. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Real image decode via the JDK's bundled codecs (PNG/JPEG/GIF/BMP ship
    * with `javax.imageio` — no external library): decode the payload, then
    * extract `dim` luminance features on a fixed ceil(√dim)² sample grid
    * (nearest-pixel, BT.601 luma, normalized to [0, 1]) — a deterministic
    * downsample-to-features step, the decode+resize stage of an image
    * training pipeline. Payloads ImageIO cannot parse (synthetic fixtures,
    * truncated files, non-image modalities) fall back to [[decodeStub]], so
    * mixed corpora flow instead of failing the task. */
  def decodeImage(payload: Array[Byte], dim: Int): Array[Float] = {
    val img =
      // NonFatal, not just IOException: imageio codecs throw
      // IllegalArgumentException / AIOOBE / CMMException on corrupt or
      // fuzzed payloads, and one bad crawl image must not fail the stage
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1)
      decodeStub(payload, dim)
    else {
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        val x = math.min(img.getWidth - 1, (j % g) * img.getWidth / g)
        val y = math.min(img.getHeight - 1, (j / g) * img.getHeight / g)
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val gn = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        out(j) = (0.299f * r + 0.587f * gn + 0.114f * b) / 255.0f
        j += 1
      }
      out
    }
  }

  /** Real audio decode for WAV (RIFF/PCM) via the JDK's bundled
    * `javax.sound.sampled` — the same no-external-codec move as
    * [[decodeImage]]: parse the container header, stream PCM frames,
    * mono-mix the channels, and emit `dim` per-window RMS amplitudes over
    * equal time windows (each in [0, 1]) — the decode + featurize stage
    * of an audio training pipeline (an RMS energy grid is the standard
    * first-pass loudness contour). Handles 8/16-bit signed and unsigned
    * PCM, both endiannesses. Payloads the JDK cannot parse (synthetic
    * fixtures, compressed codecs) fall back to [[decodeStub]], so mixed
    * corpora flow instead of failing the task. */
  def decodeAudio(payload: Array[Byte], dim: Int): Array[Float] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val stream =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (stream == null) decodeStub(payload, dim)
    else try {
      val fmt = stream.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val pcmOk = (enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED) &&
        (bits == 8 || bits == 16) && ch >= 1
      val bytes = if (pcmOk) stream.readAllBytes() else null
      val frameBytes = ch * (bits / 8)
      val nFrames = if (bytes == null) 0 else bytes.length / frameBytes
      if (nFrames == 0) decodeStub(payload, dim)
      else {
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val big = fmt.isBigEndian
        val sumSq = new Array[Double](dim)
        val cnt = new Array[Long](dim)
        var f = 0
        while (f < nFrames) {
          val w = (f.toLong * dim / nFrames).toInt
          var c = 0
          var acc = 0.0
          while (c < ch) {
            val off = f * frameBytes + c * (bits / 8)
            val s =
              if (bits == 16) {
                val lo = bytes(off + (if (big) 1 else 0)) & 0xFF
                val hi = bytes(off + (if (big) 0 else 1))
                val raw =
                  if (signed) (hi << 8) | lo
                  else (((hi & 0xFF) << 8) | lo) - 32768
                raw / 32768.0
              } else {
                if (signed) bytes(off) / 128.0
                else ((bytes(off) & 0xFF) - 128) / 128.0
              }
            acc += s
            c += 1
          }
          val mono = acc / ch
          sumSq(w) += mono * mono
          cnt(w) += 1
          f += 1
        }
        val out = new Array[Float](dim)
        var j = 0
        while (j < dim) {
          out(j) =
            if (cnt(j) == 0) 0.0f
            else math.sqrt(sumSq(j) / cnt(j)).toFloat
          j += 1
        }
        out
      }
    } finally stream.close()
  }

  /** Build the canonical asset table from any (id, payload) source:
    * binary column + typed metadata struct (modality, declared dims,
    * format). Metadata travels with the bytes so downstream stages never
    * re-probe the payload. */
  def asAssetTable(src: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame =
    src.select(
      col(idCol).as("asset_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(modality).as("modality"),
        octet_length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit("raw").as("format")).as("meta"))

  /** Executor-side batched decode + feature extraction over the binary
    * column. Partition-parallel; each task iterates its partition's rows
    * once (the batch shape a real decoder needs — open codec once per
    * partition, stream rows through it). `decoder` defaults to
    * [[decodeStub]] (the deterministic, oracle-checkable path); pass
    * [[decodeImage]] for real PNG/JPEG payloads. */
  def extractFeatures(assets: DataFrame, dim: Int,
      decoder: (Array[Byte], Int) => Array[Float] = decodeStub)
      : Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("meta.modality").as("modality"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup (real impl: initialize the codec here, once)
        rows.map { case (id, modality, payload) =>
          AssetFeatures(id, modality, payload.length,
            decoder(payload, dim))
        }
      }
  }

  /** Resize stub: stride decimation of the payload stream — keep the first
    * of every `stride` characters (PLACEHOLDER for a real image scaler; the
    * dataflow a real impl keeps is identical: a narrow per-row transform,
    * no shuffle, output travels as a new payload column). Implemented as a
    * regex so the decimation is reproducible by any regex engine. */
  def resizeStride(payloadText: org.apache.spark.sql.Column,
      stride: Int): org.apache.spark.sql.Column = {
    require(stride >= 2, s"stride $stride")
    // [\s\S] instead of `.`: Java regex excludes \r\n
    // from `.` while RE2 engines exclude only \n — the explicit class
    // decimates identically everywhere, payload content notwithstanding
    regexp_replace(payloadText,
      s"([\\s\\S])[\\s\\S]{0,${stride - 1}}", "$1")
  }

  /** 64-bit AVERAGE perceptual hash of an image payload (the public
    * aHash family — Krawetz, "Looks Like It"): real JDK decode
    * ([[decodeImage]], [[decodeStub]] fallback keeps undecodable rows
    * flowing), 8×8 luma sample grid, bit i set when grid cell i's luma
    * exceeds the grid mean. Survives re-encode/resize (grid sampling +
    * mean threshold), not crops/rotations — the standard trade. */
  def aHash64(payload: Array[Byte]): Long = {
    val lum = decodeImage(payload, 64) // g = 8 → an 8×8 grid
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += lum(i); i += 1 }
    mean /= 64
    var h = 0L
    i = 0
    while (i < 64) { if (lum(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** 64-bit DIFFERENCE perceptual hash (dHash): 9-wide × 8-row luma
    * grid ([[decodeImage]] at dim = 72 samples exactly that grid), bit
    * per horizontal gradient sign — more robust than [[aHash64]] to
    * global brightness shifts because only NEIGHBOR ordering matters. */
  def dHash64(payload: Array[Byte]): Long = {
    val lum = decodeImage(payload, 72) // g = 9 → 8 rows of 9 samples
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (lum(r * 9 + c) < lum(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** 64-bit audio fingerprint — the audio axis of near-dup detection
    * (the energy-contour core of the public Haitsma–Kalker fingerprint,
    * reduced to one band): real WAV decode ([[decodeAudio]],
    * [[decodeStub]] fallback), 65 equal-time RMS windows, bit per
    * energy-gradient sign between consecutive windows. Time-proportional
    * windows make the fingerprint invariant to sample rate and bit
    * depth (same contour, different sampling); NOT to trimming/offset —
    * the standard trade at one band. */
  def audioHash64(payload: Array[Byte]): Long = {
    val rms = decodeAudio(payload, 65)
    var h = 0L
    var i = 0
    while (i < 64) { if (rms(i) < rms(i + 1)) h |= 1L << i; i += 1 }
    h
  }

  /** Audio fingerprints packed as two 32-bit words (the [[imageHashes]]
    * shape) — feeds [[BqIndex.hammingNearDupPairs]] unchanged. */
  def audioHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val h = audioHash64(payload)
          (id, Seq(h & 0xFFFFFFFFL, h >>> 32))
        }
      }
      .toDF("asset_id", "fp_bits")
  }

  /** Audio near-duplicate pairs by fingerprint Hamming distance — the
    * [[imageNearDupPairs]] pattern over [[audioHash64]]. */
  def audioNearDupPairs(assets: DataFrame, maxHd: Int = 7): DataFrame =
    BqIndex.hammingNearDupPairs(
      audioHashes(assets).select(col("asset_id").as("id"),
        col("fp_bits").as("bits")),
      maxHd)

  /** Perceptual hashes of every asset, packed as two 32-bit words each —
    * exactly [[BqIndex.hammingNearDupPairs]]' input shape, so image
    * near-dup pairing rides the existing pigeonhole-exact multi-index
    * Hamming machinery and the codegen `hamming64` kernel. Executor-side
    * batched decode (the [[extractFeatures]] mapPartitions shape).
    * Output: (asset_id, ahash_bits, dhash_bits). */
  def imageHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // two unsigned 32-bit values carried as BIGINT elements — the word
    // layout BqIndex's codegen hamming64 kernel and band explode expect
    def pack(h: Long): Seq[Long] = Seq(h & 0xFFFFFFFFL, h >>> 32)
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          (id, pack(aHash64(payload)), pack(dHash64(payload)))
        }
      }
      .toDF("asset_id", "ahash_bits", "dhash_bits")
  }

  /** Image near-duplicate pairs by perceptual-hash Hamming distance —
    * the IMAGE axis of the dedup family (exact n-gram / MinHash /
    * SimHash / embedding-cosine cover text; this covers re-encoded,
    * resized, slightly-edited media): decode → [[imageHashes]] →
    * [[BqIndex.hammingNearDupPairs]] (pigeonhole-exact for
    * hd ≤ maxHd on the 64-bit codes — never an all-pairs scan).
    * Output (a_id, b_id, hd). dHash by default (brightness-shift
    * robust); `useDHash = false` pairs on aHash. */
  def imageNearDupPairs(assets: DataFrame, maxHd: Int = 7,
      useDHash: Boolean = true): DataFrame =
    BqIndex.hammingNearDupPairs(
      imageHashes(assets).select(col("asset_id").as("id"),
        (if (useDHash) col("dhash_bits") else col("ahash_bits"))
          .as("bits")),
      maxHd)

  /** Content-defined chunking over a text payload column — the
    * rsync/LBFS-style blob-dedup primitive a multimodal data lake needs:
    * chunk boundaries fall where a sliding window's fingerprint hits a
    * target residue (content-derived, so an insertion early in an asset
    * shifts ONE chunk's boundary instead of re-aligning every fixed-size
    * block — the property that lets identical media segments dedup
    * across assets that differ elsewhere). The window fingerprint is an
    * md5 prefix of the `windowBytes`-char window ending at each position,
    * boundary iff fingerprint % `boundaryMod` == 0 — expected chunk
    * length ≈ boundaryMod bytes.
    *
    * LEGACY ORACLE FORM — production callers use [[cdcChunksGear]]: the
    * Gear rolling hash computes a fingerprint in O(1) Long ops per byte
    * instead of one md5 digest per position (measured 20× on CdcProbe's
    * 125 MB ladder: 154.3 → 7.7 s) with the same resynchronization
    * property, output schema and downstream tail. This md5 form stays as
    * the cross-engine-trivial variant the m04 harness row hash-checks
    * (one digest call per position — nothing to re-derive).
    *
    * Output: (asset_id, chunk_idx, start, chunk_len, chunk_md5,
    * n_assets_sharing) — the md5 identifies a chunk's CONTENT, and
    * `n_assets_sharing` counts distinct assets carrying the identical
    * chunk (the dedup signal; > 1 ⇒ the bytes can be stored once).
    *
    * Scale: the candidate-end scan is SEGMENTED — each asset explodes to
    * ceil(n / segChars) segment rows, each slicing only the ≤
    * `segChars + windowBytes − 1` chars its windows touch, so per-row
    * memory is O(segChars) regardless of asset size (a 100 MB blob never
    * materializes a 100 M-element position array in one row). Boundary
    * positions then travel as NARROW (asset_id, end) rows through the
    * dedup + per-asset lag window — the payload is shuffled exactly once
    * (the chunk-hash equi-join back to the asset table), not once per
    * candidate position. The sharing count is one hash-agg keyed by
    * uniform md5 values. Nothing corpus-wide. */
  def cdcChunks(assets: DataFrame, windowBytes: Int = 8,
      boundaryMod: Int = 64, payloadCol: String = "payload_text",
      segChars: Int = 4096): DataFrame = {
    require(windowBytes > 0 && boundaryMod > 0 && segChars > windowBytes,
      s"windowBytes $windowBytes boundaryMod $boundaryMod segChars $segChars")
    // BYTE-oriented on purpose (blob dedup chunks bytes, not characters):
    // the binary cast makes every substring byte-positioned and O(len) —
    // a STRING payload would make each window extraction O(position)
    // (UTF-8 char-boundary scan from the start ⇒ O(n²) per asset). For
    // ASCII text the chunking is identical either way; a multi-byte char
    // can split across a chunk boundary, which is harmless for dedup
    // (reassembly is by offset, not by chunk content).
    val p = col(payloadCol).cast("binary")
    val n = length(p)
    // candidate boundary = window-END positions e ∈ [windowBytes, n] with
    // the target residue. Segment s covers ends [windowBytes + s*segChars,
    // min(windowBytes + (s+1)*segChars − 1, n)] — the per-row position
    // array is ≤ segChars elements, and each element extracts its
    // windowBytes-byte window STRAIGHT from the payload attribute: on
    // BINARY a substring is an O(window) byte copy at any offset, so the
    // per-element work is constant. (An intermediate slice column buys
    // nothing once the payload is binary, and computed Column vals must
    // never be embedded in lambda BODIES — the tree evaluates once per
    // element, the shingles trap.)
    val nSegs = (floor((n - windowBytes).cast("double") / segChars) + 1)
      .cast("int")
    // positions explode FIRST and the boundary test runs as a TOP-LEVEL
    // filter (r16): the old `filter(sequence(...), lambda)` evaluated the
    // md5 window digest through the higher-order function's
    // CodegenFallback — one interpreted Expression.eval tree walk per
    // candidate position. As a Generate → Filter pair the identical
    // predicate compiles into the whole-stage-codegen stage (md5/substr/
    // conv are all codegen expressions); the payload column referenced
    // per position row is a pointer into the parent row inside the same
    // stage — only (asset_id, __e) survives to the stage boundary, so
    // nothing payload-sized is shuffled or materialized per position.
    val segEnds = assets
      .filter(n >= windowBytes)
      .select(col("asset_id"), p.as("__p"), n.as("__n"),
        explode(sequence(lit(0), nSegs - 1)).as("__s"))
      .select(col("asset_id"), col("__p"),
        explode(
          sequence(lit(windowBytes) + col("__s") * segChars,
            least(lit(windowBytes) + (col("__s") + 1) * segChars - 1,
              col("__n")))).as("__e"))
      .filter(conv(substring(md5(col("__p").substr(
          (col("__e") - lit(windowBytes) + 1).cast("int"),
          lit(windowBytes))),
        1, 8), 16, 10).cast("long") % boundaryMod === 0)
      .select(col("asset_id"), col("__e"))
    // the asset end is always a chunk end; assets shorter than one window
    // yield just the end boundary = one whole-asset chunk
    val ends = segEnds
      .unionByName(assets.filter(n > 0)
        .select(col("asset_id"), n.cast("int").as("__e")))
      .dropDuplicates("asset_id", "__e")
    assembleChunks(assets, ends, payloadCol)
  }

  /** Shared CDC tail: boundary-end rows (asset_id, __e) → per-asset chunk
    * specs (lag window over NARROW rows), chunk content hashes (payload
    * joined back ONCE), and cross-asset sharing counts (separate hash-agg
    * + equi-join — NOT a window over chunk_md5: a hot chunk shared by
    * millions of assets would hold a per-row distinct set; the agg is
    * two-phase map-side). Example (the production default — Gear
    * boundaries feeding this tail):
    * {{{
    * val chunks = Multimodal.cdcChunksGear(assets,
    *   windowBytes = 8, boundaryMod = 64)        // ≈64-byte chunks
    * chunks.filter(col("n_assets_sharing") > 1)  // dedupable content
    * }}} */
  private def assembleChunks(assets: DataFrame, ends: DataFrame,
      payloadCol: String): DataFrame = {
    val p = col(payloadCol).cast("binary")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id")).orderBy(col("__e").asc)
    val specs = ends
      .withColumn("start",
        coalesce(lag(col("__e"), 1).over(w) + 1, lit(1)))
      .withColumn("chunk_idx",
        org.apache.spark.sql.functions.row_number().over(w) - 1)
      .withColumn("chunk_len", col("__e") - col("start") + 1)
      .select(col("asset_id"), col("chunk_idx"), col("start"),
        col("chunk_len"))
    val chunks = specs
      .join(assets.select(col("asset_id"), p.as("__p")), Seq("asset_id"))
      .withColumn("chunk_md5",
        md5(col("__p").substr(col("start"), col("chunk_len"))))
    val sharing = chunks.groupBy(col("chunk_md5"))
      .agg(countDistinct(col("asset_id")).as("n_assets_sharing"))
    chunks.join(sharing, Seq("chunk_md5"))
      .select(col("asset_id"), col("chunk_idx"), col("start"),
        col("chunk_len"), col("chunk_md5"), col("n_assets_sharing"))
  }

  /** The 256-entry Gear table: gear(b) = the first 10 hex chars of the
    * md5 of the single byte b, as a 40-bit Long. md5-derived so an
    * external engine re-derives every entry (DuckDB:
    * `('0x'||substr(md5(chr(b)),1,10))::BIGINT` — identical for ASCII
    * bytes, where a one-char string IS its byte). */
  private[graft] lazy val gearTable: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { b =>
      md.reset()
      val hex = md.digest(Array(b.toByte))
        .map(x => f"$x%02x").mkString.substring(0, 10)
      java.lang.Long.parseLong(hex, 16)
    }.toArray
  }

  /** Reference (non-rolling) windowed Gear hash at 1-based end position
    * `e` — the driver-side mirror the spec pins [[cdcChunksGear]]'s
    * rolling recurrence against, and the exact formula the m05 oracle
    * re-derives per position: H(e) = Σ_{j=0}^{W−1} gear(b_{e−j}) · 2^j.
    * All terms < 2^40 · 2^{W−1} with W ≤ 8 ⇒ the sum fits a Long
    * EXACTLY (< 2^50) — no wraparound anywhere, which is what makes the
    * per-position SQL formulation equal to the rolling one. */
  private[graft] def gearHashAt(bytes: Array[Byte], e: Int,
      windowBytes: Int): Long = {
    var h = 0L
    var j = 0
    while (j < windowBytes) {
      h += gearTable(bytes(e - 1 - j) & 0xff) << j
      j += 1
    }
    h
  }

  /** [[cdcChunks]] with a TRUE rolling hash — the Gear family
    * (public CDC literature: Xia et al., FastCDC, USENIX ATC 2016): the
    * window fingerprint updates in O(1) Long ops per byte
    * (H' = 2·(H − 2^{W−1}·gear(oldest)) + gear(newest)) instead of one
    * md5 digest per position — ~windowBytes× less hashing plus the
    * digest-vs-arithmetic constant, on the CPU-bound path of blob-scale
    * dedup (ScaleProbe measures the wall drop at ≥ 100 MB of assets).
    * Boundary rule: end position e (1-based, e ≥ windowBytes) is a cut
    * iff H(e) % boundaryMod == 0, H over the window's bytes with the
    * NEWEST byte at coefficient 2^0; the asset end always cuts. Same
    * insertion-resynchronization property, chunk/sharing output and
    * downstream dataflow as [[cdcChunks]] ([[assembleChunks]]).
    *
    * Spark shape: ONE `mapPartitions` pass over (asset_id, payload)
    * emitting NARROW (asset_id, end) rows — the file's established idiom
    * for imperative byte work (the decode family); everything after the
    * scan is the shared declarative tail. Per-row memory is O(1) beyond
    * the payload itself (no position arrays). Engine parity: gear
    * values are md5-derived ([[gearTable]]) and every sum fits a Long
    * exactly, so DuckDB re-derives each boundary per position from the
    * same parquet (ASCII payloads — the [[cdcChunks]] byte/char
    * contract). */
  def cdcChunksGear(assets: DataFrame, windowBytes: Int = 8,
      boundaryMod: Int = 64, payloadCol: String = "payload_text")
      : DataFrame = {
    require(windowBytes > 0 && windowBytes <= 8 && boundaryMod > 0,
      s"windowBytes $windowBytes (1..8) boundaryMod $boundaryMod")
    val spark = assets.sparkSession
    import spark.implicits._
    val gear = gearTable // serialized once into the closure (2 KB)
    val ends = assets
      .select(col("asset_id").cast("long"),
        col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n = bytes.length
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
          if (n >= windowBytes) {
            var h = 0L
            var e = 0
            while (e < windowBytes) {
              h = (h << 1) + gear(bytes(e) & 0xff); e += 1
            }
            if (h % boundaryMod == 0) out += ((id, e))
            while (e < n) {
              h = ((h - (gear(bytes(e - windowBytes) & 0xff)
                << (windowBytes - 1))) << 1) + gear(bytes(e) & 0xff)
              e += 1
              if (h % boundaryMod == 0) out += ((id, e))
            }
          }
          if (n > 0 && (out.isEmpty || out.last._2 != n)) out += ((id, n))
          out.iterator
        }
      }
      .toDF("asset_id", "__e")
    assembleChunks(assets, ends, payloadCol)
  }

  /** Video frame sampling stub: treat the payload as fixed-size frames and
    * keep every `stride`-th — pure offset arithmetic on the binary column
    * (a real impl swaps substring for a demuxer; the explode shape stays). */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(octet_length(col("payload")) / frameBytes)
    assets
      // assets shorter than one full frame produce NO rows (an empty
      // sequence explodes to nothing) — never a phantom partial frame 0
      .withColumn("frame_idx",
        explode(when(nFrames > 0,
          sequence(lit(0L), nFrames - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("asset_id"), col("frame_idx"), col("frame"))
  }
}
