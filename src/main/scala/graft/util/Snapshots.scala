package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_extract}

/** Versioned parquet snapshot chains with an atomic pointer file — the
  * persistence layout [[graft.VectorStore]] and [[graft.CorpusStore]]
  * share (and [[graft.streaming.StreamingIngest]] pioneered): each
  * `persist` writes a complete `{prefix}_v{N}` directory, then atomically
  * flips the pointer (write-temp + rename-overwrite), so readers resolving
  * the pointer always see a complete snapshot and a crash mid-write leaves
  * the previous version live.
  *
  * Delta chains for streaming ingest: the pointer may carry a second
  * token — `"N"` means base version N, `"N K"` means base N overlaid by
  * deltas 1..K (`{prefix}_v{N}_delta_{k}` directories). [[appendDelta]]
  * writes one O(batch) delta and flips the pointer in ONE atomic rename
  * (base and delta count never disagree), so a micro-batch append costs
  * O(batch), not O(state); the caller compacts by re-[[persist]]ing the
  * overlaid view (the single-token pointer resets the delta count) and
  * deleting the superseded directories. Overlay SEMANTICS (latest-wins by
  * what key) belong to the caller — this layer only stores and counts. */
object Snapshots {

  /** Current base version number behind `pointer`, if any (the first
    * pointer token; delta counts don't change which base is live). */
  def current(spark: SparkSession, base: String, pointer: String)
      : Option[Long] =
    currentWithDeltas(spark, base, pointer).map(_._1)

  /** (base version, delta count) behind `pointer`, if any. */
  def currentWithDeltas(spark: SparkSession, base: String, pointer: String)
      : Option[(Long, Long)] =
    if (Fs.exists(spark, s"$base/$pointer")) {
      val parts = Fs.readString(spark, s"$base/$pointer").trim
        .split("\\s+")
      Some((parts(0).toLong, if (parts.length > 1) parts(1).toLong else 0L))
    } else None

  def versionPath(base: String, prefix: String, v: Long): String =
    s"$base/${prefix}_v$v"

  def deltaPath(base: String, prefix: String, v: Long, k: Long): String =
    s"${versionPath(base, prefix, v)}_delta_$k"

  /** Write `df` as the next version and flip the pointer (single-token —
    * any delta chain of the previous version is dereferenced). Old
    * versions are left in place (cheap, and a reader may still hold one);
    * callers that want aggressive cleanup use [[prune]] after the flip. */
  def persist(spark: SparkSession, base: String, prefix: String,
      pointer: String, df: DataFrame): Long = {
    val old = currentWithDeltas(spark, base, pointer)
    val v = old.map(_._1).getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(versionPath(base, prefix, v))
    // seal the superseded generation BEFORE the flip: record its
    // COMMITTED delta count so as-of reads never fold a crash-orphaned
    // delta dir the pointer never referenced (the dir listing would)
    old.foreach { case (ov, ok) => seal(spark, base, prefix, ov, ok) }
    Fs.writeStringAtomic(spark, s"$base/$pointer", v.toString)
    v
  }

  def sealedPath(base: String, prefix: String, v: Long): String =
    s"${versionPath(base, prefix, v)}_SEALED"

  /** Record generation `v`'s committed delta count at supersede time —
    * the authoritative bound for as-of overlays of superseded
    * generations (a crashed append can leave an orphan delta dir the
    * pointer never committed; the listing can't tell it apart). */
  def seal(spark: SparkSession, base: String, prefix: String, v: Long,
      k: Long): Unit =
    Fs.writeStringAtomic(spark, sealedPath(base, prefix, v), k.toString)

  /** The sealed delta count of superseded generation `v`, when its
    * supersede was recorded (stores written before sealing existed fall
    * back to [[deltasOnDisk]]). */
  def sealedDeltas(spark: SparkSession, base: String, prefix: String,
      v: Long): Option[Long] =
    if (Fs.exists(spark, sealedPath(base, prefix, v)))
      Some(Fs.readString(spark, sealedPath(base, prefix, v)).trim.toLong)
    else None

  /** Write `df` as delta K+1 of the current base and flip the pointer to
    * `"N K+1"`. O(batch) I/O; requires an existing base. A crash between
    * the directory write and the pointer flip leaves an orphan delta dir
    * that the next append simply overwrites. */
  def appendDelta(spark: SparkSession, base: String, prefix: String,
      pointer: String, df: DataFrame): (Long, Long) = {
    val (v, k) = currentWithDeltas(spark, base, pointer).getOrElse(
      throw new IllegalStateException(
        s"no base snapshot under $base/$pointer — persist one first"))
    df.write.mode("overwrite").parquet(deltaPath(base, prefix, v, k + 1))
    Fs.writeStringAtomic(spark, s"$base/$pointer", s"$v ${k + 1}")
    (v, k + 1)
  }

  /** Read a whole delta chain as ONE multi-path parquet scan, stamping each
    * row with its delta index (`__ds`) parsed from the file path — the
    * overlay plan stays FLAT in chain length (one scan feeding one
    * latest-wins window) instead of a k-branch union whose plan size, and
    * serve latency, grew linearly with pending deltas (ChainServeProbe
    * measured ~+0.5 s per delta on the k-branch shape). `marker` is a regex
    * whose group 1 is the delta index in the path; the leading greedy `.*`
    * keeps it anchored to the LAST occurrence, so store paths containing a
    * look-alike segment can't confuse it. mergeSchema tolerates chains
    * written across on-disk schema upgrades (missing columns null-fill —
    * the caller synthesizes legacy semantics). */
  def readChain(spark: SparkSession, paths: Seq[String], marker: String)
      : DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
      .withColumn("__ds",
        regexp_extract(col("_metadata.file_path"), marker, 1).cast("long"))

  /** Delete version `v`'s directory and every `v`-based delta directory
    * with index ≤ `deltas`. Best-effort cleanup for superseded versions —
    * call only AFTER the pointer has moved off `v`. */
  def prune(spark: SparkSession, base: String, prefix: String, v: Long,
      deltas: Long = 0L): Unit = {
    (1L to deltas).foreach(k =>
      Fs.deleteRecursive(spark, deltaPath(base, prefix, v, k)))
    Fs.deleteRecursive(spark, versionPath(base, prefix, v))
  }

  /** Retention-window prune: delete every `{prefix}_v{g}` base and its
    * `_delta_*` dirs (and `_SEALED` token) with g < `keepFrom`.
    * Listing-driven (not last-version-driven) so lowering a retention
    * window on an existing store also reclaims older leftovers.
    * Best-effort — call only after the pointer has moved past every
    * pruned generation. `grace` names ONE generation to spare even when
    * it falls outside the window: the caller passes the generation the
    * pointer just moved OFF, so lazy DataFrames resolved against the old
    * pointer (or a concurrent reader process) survive one flip cycle
    * instead of failing mid-job with FileNotFoundException; the graced
    * dirs die on the NEXT flip. */
  def pruneOlderThan(spark: SparkSession, base: String, prefix: String,
      keepFrom: Long, grace: Long = Long.MinValue): Unit = {
    val re = ("^" + java.util.regex.Pattern.quote(prefix) +
      "_v(\\d+)(_delta_\\d+|_SEALED)?$").r
    Fs.list(spark, base).foreach {
      case name @ re(g, _) if g.toLong < keepFrom && g.toLong != grace =>
        Fs.deleteRecursive(spark, s"$base/$name")
      case _ => ()
    }
  }

  /** Base versions of `prefix` still on disk, oldest first — the
    * generations an as-of read can serve. */
  def versions(spark: SparkSession, base: String, prefix: String)
      : Seq[Long] = {
    val re = ("^" + java.util.regex.Pattern.quote(prefix) + "_v(\\d+)$").r
    Fs.list(spark, base).collect { case re(g) => g.toLong }.sorted
  }

  /** Highest delta index present ON DISK for base `v` (0 when none) —
    * how far an as-of overlay of a SUPERSEDED generation can read (its
    * pointer tokens are gone; the dirs are the record). */
  def deltasOnDisk(spark: SparkSession, base: String, prefix: String,
      v: Long): Long = {
    val re = ("^" + java.util.regex.Pattern.quote(prefix) +
      "_v" + v + "_delta_(\\d+)$").r
    Fs.list(spark, base).collect { case re(k) => k.toLong }
      .foldLeft(0L)(math.max)
  }

  /** Read the snapshot behind `pointer`; `what` names it in the error. */
  def load(spark: SparkSession, base: String, prefix: String,
      pointer: String, what: String): DataFrame =
    current(spark, base, pointer) match {
      case Some(v) => spark.read.parquet(s"$base/${prefix}_v$v")
      case None => throw new IllegalStateException(
        s"no $what under $base — load them first")
    }
}
