package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet snapshot chains with an atomic pointer file — the
  * persistence layout [[graft.VectorStore]] and [[graft.CorpusStore]]
  * share (and [[graft.streaming.StreamingIngest]] pioneered): each
  * `persist` writes a complete `{prefix}_v{N}` directory, then atomically
  * flips the pointer (write-temp + rename-overwrite), so readers resolving
  * the pointer always see a complete snapshot and a crash mid-write leaves
  * the previous version live. */
object Snapshots {

  /** Current version number behind `pointer`, if any. */
  def current(spark: SparkSession, base: String, pointer: String)
      : Option[Long] =
    if (Fs.exists(spark, s"$base/$pointer"))
      Some(Fs.readString(spark, s"$base/$pointer").trim.toLong)
    else None

  /** Write `df` as the next version and flip the pointer. Old versions are
    * left in place (cheap, and a reader may still hold one); callers that
    * want aggressive cleanup delete `{prefix}_v{N-1}` after the flip. */
  def persist(spark: SparkSession, base: String, prefix: String,
      pointer: String, df: DataFrame): Long = {
    val v = current(spark, base, pointer).getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(s"$base/${prefix}_v$v")
    Fs.writeStringAtomic(spark, s"$base/$pointer", v.toString)
    v
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
