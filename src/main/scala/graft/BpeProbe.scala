package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale probe for BPE TRAINING at production merge counts: t29
  * hash-checks 8 merges, a real vocabulary is 32 k–50 k, and the
  * sequential trainer is one pair-count aggregation + one literal
  * replace per merge ([[graft.operators.TextFeaturizer.bpeTrain]]) —
  * O(nMerges) sequential Spark jobs whose per-merge wall at realistic
  * nMerges is the number this probe measures, together with the batched
  * trainer's (`batch` symbol-disjoint merges per count snapshot) at the
  * same totals. The word-TYPE table is the loop's whole working set, so
  * walls are corpus-size-insensitive past the one corpus scan.
  *
  * Usage: `sbt "runMain graft.BpeProbe /root/testdata/sf0.1 64,256,1024 1,32"`
  * (sf dir, comma-separated merge counts, comma-separated batch sizes).
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nms = (if (args.length > 1) args(1) else "64,256,1024")
      .split(",").map(_.toInt).toSeq
    val batches = (if (args.length > 2) args(2) else "1,32")
      .split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // `synthetic:N` instead of an sf dir: N word OCCURRENCES drawn from
    // a deep syllable vocabulary (~65 syllables, 3–6 per word, hash-
    // deterministic, zipf-ish counts via the id^2 skew) — the sf
    // fixtures' synthetic prose exhausts below ~90 merges, far short of
    // a production vocabulary; this fixture sustains thousands, so the
    // per-merge wall is measured where it matters.
    val docs = (if (dir.startsWith("synthetic:")) {
      val nw = dir.stripPrefix("synthetic:").toLong
      val syll = (for (a <- "bcdfgklmnprst"; v <- "aeiou")
        yield s"$a$v").toArray
      val sLit = typedLit(syll.toSeq)
      spark.range(nw).select(col("id").as("doc_id"),
        array_join(transform(
          sequence(lit(0), pmod(hash(col("id") * col("id")), lit(4)) + 2),
          i => element_at(sLit,
            (pmod(hash(pmod(col("id") * col("id"), lit(20011L)), i),
              lit(syll.length)) + 1).cast("int"))), "").as("text"))
    } else Tables.documents(spark, dir))
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()
    val runs = for (b <- batches; nm <- nms) yield {
      val ((got, tC), t) = timed {
        val m = graft.operators.TextFeaturizer
          .bpeTrain(docs, nMerges = nm, batch = b)
        (m.count(), 0.0)
      }
      val _ = tC
      s"""{"n_merges":$nm,"batch":$b,"merges_learned":$got,""" +
        s""""sec":$t,"sec_per_merge":${t / math.max(1L, got)}}"""
    }
    println(s"""{"docs":$nDocs,"dir":"$dir",""" +
      s""""bpe_ladder":[${runs.mkString(",")}]}""")
    spark.stop()
  }
}
