package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.asAssetTable(
    Seq((1L, "tiny payload"), (2L, "a much longer payload for frames"))
      .toDF("id", "data"),
    "id", "data", "image")

  test("asset table schema: binary payload + typed metadata struct") {
    val f = assets.schema("payload")
    assert(f.dataType.typeName === "binary")
    val meta = assets.select("meta.modality", "meta.n_bytes", "meta.format")
      .as[(String, Int, String)].collect().toList
    assert(meta === List(("image", 12, "raw"), ("image", 32, "raw")))
  }

  test("feature extraction: deterministic stub, stable across partitionings") {
    val one = Multimodal.extractFeatures(assets.coalesce(1), dim = 4)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val four = Multimodal.extractFeatures(assets.repartition(4), dim = 4)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(one === four)
    assert(one(1L).length === 4)
    assert(one(1L) !== one(2L))
  }

  test("features feed the kNN surface (array<float> handoff)") {
    val feats = Multimodal.extractFeatures(assets, dim = 4)
      .toDF().select(col("asset_id").as("id"),
        col("features").as("vector"), lit(false).as("deleted"))
    val q = feats.select(col("id").as("query_id"),
      col("vector").as("query_vec")).limit(1)
    val hits = graft.operators.KnnSearch.knnExact(feats, q, k = 1, minSim = -2.0)
    assert(hits.count() === 1) // self-match survives the full search path
  }

  test("decodeImage: real PNG bytes through the JDK codec, luminance features") {
    import java.awt.image.BufferedImage
    // left half pure white, right half pure black — luma 1.0 / 0.0
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xFFFFFF else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val feats = Multimodal.decodeImage(png, dim = 4) // 2×2 grid
    assert(feats.length === 4)
    // grid cols 0,1 of 2 → pixels x=0 (white) and x=8 (black)
    assert(feats(0) > 0.99f && feats(2) > 0.99f, feats.toSeq.toString)
    assert(feats(1) < 0.01f && feats(3) < 0.01f, feats.toSeq.toString)
    // full pipeline: PNG payloads through the asset table + mapPartitions
    val df = Seq((1L, png)).toDF("id", "payload")
    val out = Multimodal.extractFeatures(
        Multimodal.asAssetTable(df, "id", "payload", "image"),
        dim = 4, decoder = Multimodal.decodeImage)
      .collect()
    assert(out.length === 1)
    assert(out.head.features.toSeq === feats.toSeq)
    assert(out.head.n_bytes === png.length)
    // non-image payloads fall back to the deterministic stub, not a crash
    val junk = "not an image".getBytes("UTF-8")
    assert(Multimodal.decodeImage(junk, 4).toSeq ===
      Multimodal.decodeStub(junk, 4).toSeq)
  }

  test("decodeAudio: real WAV bytes through the JDK parser, RMS features") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit mono little-endian PCM, 800 frames: first half silence,
    // second half a full-rate ±8192 square wave → window RMS 0 and 0.25
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v: Int = if (i < n / 2) 0 else if (i % 2 == 0) 8192 else -8192
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val feats = Multimodal.decodeAudio(wav, dim = 2)
    assert(feats.length === 2)
    assert(feats(0) < 0.001f, feats.toSeq.toString)
    assert(math.abs(feats(1) - 0.25f) < 0.001f, feats.toSeq.toString)
    // full pipeline: WAV payloads through the asset table + mapPartitions
    val df = Seq((1L, wav)).toDF("id", "payload")
    val out = Multimodal.extractFeatures(
        Multimodal.asAssetTable(df, "id", "payload", "audio"),
        dim = 2, decoder = Multimodal.decodeAudio)
      .collect()
    assert(out.length === 1)
    assert(out.head.features.toSeq === feats.toSeq)
    assert(out.head.n_bytes === wav.length)
    // non-audio payloads fall back to the deterministic stub, not a crash
    val junk = "not a wav".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(junk, 4).toSeq ===
      Multimodal.decodeStub(junk, 4).toSeq)
  }

  test("cdcChunks: chunks tile each asset exactly; boundaries re-sync " +
      "after an insertion so shifted clones share tail chunks") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val assets = Seq(
      (1L, base),
      (2L, "inserted junk bytes " + base), // same content, shifted
      (3L, "completely different words here entirely")
    ).toDF("asset_id", "payload_text")
    val got = Multimodal.cdcChunks(assets, windowBytes = 8,
        boundaryMod = 32)
      .orderBy("asset_id", "chunk_idx")
      .select("asset_id", "chunk_idx", "start", "chunk_len", "chunk_md5")
      .as[(Long, Int, Int, Int, String)].collect()
    // chunks tile: starts are contiguous and lengths sum to the payload
    for (a <- Seq(1L, 2L, 3L)) {
      val cs = got.filter(_._1 == a).sortBy(_._2)
      assert(cs.head._3 === 1)
      for (Array(x, y) <- cs.sliding(2).map(_.toArray))
        assert(y._3 === x._3 + x._4, s"gap in asset $a")
      val text = assets.filter(col("asset_id") === a)
        .select("payload_text").as[String].head()
      assert(cs.map(_._4).sum === text.length)
    }
    // the CDC property: the shifted clone re-synchronizes — at least one
    // identical-content chunk md5 appears in both asset 1 and asset 2
    val md5s1 = got.filter(_._1 == 1L).map(_._5).toSet
    val md5s2 = got.filter(_._1 == 2L).map(_._5).toSet
    assert(md5s1.intersect(md5s2).nonEmpty,
      s"no shared chunks after shift: $md5s1 vs $md5s2")
    // and the unrelated asset shares nothing
    val md5s3 = got.filter(_._1 == 3L).map(_._5).toSet
    assert(md5s1.intersect(md5s3).isEmpty)
  }

  test("cdcChunks: segmented scan is invariant in segChars (bounded " +
      "per-row memory changes nothing semantically)") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val assets = Seq((1L, base), (2L, "tiny"), (3L, base.take(11)))
      .toDF("asset_id", "payload_text")
    def run(seg: Int) = Multimodal.cdcChunks(assets, windowBytes = 8,
        boundaryMod = 32, segChars = seg)
      .select("asset_id", "chunk_idx", "start", "chunk_len", "chunk_md5",
        "n_assets_sharing")
      .as[(Long, Int, Int, Int, String, Long)].collect().sorted
    // segChars 9 forces ~1-position segments; 16 several per asset; 1 << 20
    // a single segment — all must produce byte-identical chunkings
    val ref = run(1 << 20)
    assert(ref.nonEmpty && ref.exists(_._1 == 2L)) // short asset → 1 chunk
    assert(run(16) === ref)
    assert(run(9) === ref)
  }

  test("cdcChunksGear: rolling recurrence == per-position reference " +
      "mirror; chunks tile; insertion re-syncs; short assets") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, base),
      (2L, "inserted junk bytes " + base),
      (3L, "completely different words here entirely"),
      (4L, "tiny"),            // shorter than the window → 1 whole chunk
      (5L, "exactly8!"))       // window-and-a-byte edge
    val assets = rows.toDF("asset_id", "payload_text")
    val W = 8; val mod = 32
    val got = Multimodal.cdcChunksGear(assets, windowBytes = W,
        boundaryMod = mod)
      .orderBy("asset_id", "chunk_idx")
      .select("asset_id", "chunk_idx", "start", "chunk_len", "chunk_md5")
      .as[(Long, Int, Int, Int, String)].collect()
    // DRIVER MIRROR: boundary ends from the NON-rolling windowed-sum
    // formula (gearHashAt) — the rolling recurrence must agree at every
    // position of every asset
    for ((id, text) <- rows) {
      val bytes = text.getBytes("UTF-8")
      val expectEnds = ((W to bytes.length)
        .filter(e => Multimodal.gearHashAt(bytes, e, W) % mod == 0)
        .toSet + bytes.length).filter(_ > 0)
      val gotEnds = got.filter(_._1 == id)
        .map(c => c._3 + c._4 - 1).toSet
      assert(gotEnds === expectEnds, s"asset $id boundary mismatch")
    }
    // chunks tile each asset exactly
    for ((a, text) <- rows) {
      val cs = got.filter(_._1 == a).sortBy(_._2)
      assert(cs.head._3 === 1)
      for (Array(x, y) <- cs.sliding(2).map(_.toArray))
        assert(y._3 === x._3 + x._4, s"gap in asset $a")
      assert(cs.map(_._4).sum === text.length)
    }
    // the CDC property survives the rolling formulation: shifted clone
    // re-synchronizes, unrelated content shares nothing
    val m1 = got.filter(_._1 == 1L).map(_._5).toSet
    val m2 = got.filter(_._1 == 2L).map(_._5).toSet
    val m3 = got.filter(_._1 == 3L).map(_._5).toSet
    assert(m1.intersect(m2).nonEmpty, "no re-sync after insertion")
    assert(m1.intersect(m3).isEmpty)
  }

  test("frame sampling: every stride-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(
      assets.filter(col("asset_id") === 2L), frameBytes = 8, stride = 2)
      .as[(Long, Long, Array[Byte])].collect().toList
    // 32 bytes → 4 frames of 8; stride 2 keeps frames 0 and 2
    assert(frames.map(_._2) === List(0L, 2L))
    assert(frames.forall(_._3.length === 8))
    assert(new String(frames.head._3) === "a much l")
  }

  test("perceptual hashes: re-encoded/upscaled clones pair at small " +
      "Hamming distance, unrelated images don't; undecodable payloads " +
      "fall back without crashing") {
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // a diagonal luminance gradient — structured, crop/scale-stable
    def gradient(sz: Int): BufferedImage = {
      val img = new BufferedImage(sz, sz, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until sz; x <- 0 until sz) {
        val v = ((x + y) * 255) / (2 * sz - 2)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // checkerboard — structurally unlike the gradient
    def checker(sz: Int): BufferedImage = {
      val img = new BufferedImage(sz, sz, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until sz; x <- 0 until sz)
        img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) 0xFFFFFF else 0)
      img
    }
    val orig = png(gradient(64))
    val upscaled = png(gradient(128)) // same content, 2x the pixels
    val other = png(checker(64))
    def hd(a: Array[Byte], b: Array[Byte]): Int =
      java.lang.Long.bitCount(
        Multimodal.dHash64(a) ^ Multimodal.dHash64(b))
    assert(hd(orig, upscaled) <= 4,
      s"upscale moved dHash by ${hd(orig, upscaled)} bits")
    assert(hd(orig, other) > 10,
      s"unrelated images only ${hd(orig, other)} bits apart")
    // distributed pairing through the Hamming multi-index: only the
    // clone pair survives maxHd
    val assets = Seq((1L, orig), (2L, upscaled), (3L, other))
      .toDF("asset_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(assets, maxHd = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)))
    // aHash orders the same way (a smooth gradient sits AT the mean, so
    // aHash bits are less scale-stable than dHash gradients — assert the
    // relative ordering, which is the property near-dup thresholds use)
    def ahd(a: Array[Byte], b: Array[Byte]): Int =
      java.lang.Long.bitCount(
        Multimodal.aHash64(a) ^ Multimodal.aHash64(b))
    assert(ahd(orig, upscaled) < ahd(orig, other),
      s"aHash: clone ${ahd(orig, upscaled)} vs unrelated ${ahd(orig, other)}")
    // undecodable payloads hash via the stub and don't crash the stage
    val junk = Seq((9L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    assert(Multimodal.imageHashes(junk).count() === 1)
  }

  test("audio fingerprints: the same signal at a different sample rate " +
      "pairs near-exactly; an unrelated envelope doesn't") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(rate: Float, env: Int => Double, frames: Int): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val amp = (env(i * 1000 / frames) * 8192).toInt
        val v = if (i % 2 == 0) amp else -amp
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // a rising-then-falling loudness envelope, as a fn of time in 0..999
    val hill = (t: Int) => if (t < 500) t / 500.0 else (1000 - t) / 500.0
    val saw = (t: Int) => (t % 200) / 200.0 // unrelated periodic envelope
    val a = wav(8000f, hill, 4000)
    val b = wav(16000f, hill, 8000) // same contour, twice the rate
    val c = wav(8000f, saw, 4000)
    def hd(x: Array[Byte], y: Array[Byte]): Int =
      java.lang.Long.bitCount(
        Multimodal.audioHash64(x) ^ Multimodal.audioHash64(y))
    assert(hd(a, b) <= 4, s"resampled clone moved fp by ${hd(a, b)} bits")
    assert(hd(a, c) > 10, s"unrelated envelope only ${hd(a, c)} apart")
    val assets = Seq((1L, a), (2L, b), (3L, c)).toDF("asset_id", "payload")
    val pairs = Multimodal.audioNearDupPairs(assets, maxHd = 7)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
  }
}
