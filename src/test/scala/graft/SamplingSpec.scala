package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  test("split assignment is deterministic and partitioning-independent") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitAssign(docs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.splitAssign(docs.repartition(13), "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("adding rows never moves an existing row's split (stability)") {
    val w = Seq("train" -> 0.5, "test" -> 0.5)
    val half = docs.filter(col("doc_id") < 250)
    val before = Sampling.splitAssign(half, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val after = Sampling.splitAssign(docs, "doc_id", w)
      .filter(col("doc_id") < 250)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(before === after)
  }

  test("split and sample fractions land near their targets") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = Sampling.splitAssign(docs, "doc_id", w)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.08,
      s"train fraction off: $counts")
    val sampled = Sampling.hashSample(docs, "doc_id", 0.1).count()
    assert(math.abs(sampled / n - 0.1) < 0.05, s"sample fraction: $sampled/$n")
    // sample is a strict, stable subset
    val ids = Sampling.hashSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.hashSample(docs.repartition(7), "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === ids2)
  }

  test("weightedSample: selection matches a driver-side A-Res mirror, " +
      "is partitioning-invariant, and favors heavy rows") {
    val rows = Seq.tabulate(60) { i =>
      (i.toLong, if (i < 10) 50L else 1L) // 10 heavy rows, 50 light
    }.toDF("id", "w")
    val got = Sampling.weightedSample(rows, k = 15, keyCol = "id",
        weightCol = "w")
      .select("id").as[Long].collect().toSet
    // driver mirror of the documented rule: u from the salted hash,
    // micro-quantized ln, key = lnu_micro / w, top-15 desc (ties id asc)
    val hk = rows.select(col("id"),
        Sampling.hashKey(col("id"), "wsample").as("h"), col("w"))
      .as[(Long, Long, Long)].collect()
    val want = hk.map { case (id, h, w) =>
      val u = ((h % 1000000000L) + 1L).toDouble / 1000000001.0
      val lnu = math.floor(math.log(u) * 1000000.0 + 0.5)
      (id, lnu / w)
    }.sortBy { case (id, k) => (-k, id) }.take(15).map(_._1).toSet
    assert(got === want)
    // a 50x weight should dominate the sample: most heavy rows survive
    assert(got.count(_ < 10L) >= 7, s"heavy rows in sample: $got")
    val re = Sampling.weightedSample(rows.repartition(7), k = 15,
        keyCol = "id", weightCol = "w")
      .select("id").as[Long].collect().toSet
    assert(re === got)
    // non-positive weights are excluded, not sampled
    val withZero = rows.union(Seq((100L, 0L)).toDF("id", "w"))
    assert(!Sampling.weightedSample(withZero, k = 60, keyCol = "id",
      weightCol = "w").select("id").as[Long].collect().contains(100L))
  }

  test("negativeSample: k negatives per query, never the query itself, " +
      "deterministic and partitioning-independent") {
    val queries = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"))
    val got = Sampling.negativeSample(queries, docs, k = 4, buckets = 32)
      .orderBy("query_id", "slot")
      .as[(Long, Int, Option[Long], Long)].collect()
    val nQ = queries.count()
    // the grid contract: EVERY (query, slot) appears, filled or not
    assert(got.length === (nQ * 4).toInt)
    // 500 docs over 32 buckets → every bucket occupied → all slots fill
    assert(got.forall { case (_, _, n, c) => n.isDefined && c === 4L })
    assert(got.forall { case (q, _, n, _) => !n.contains(q) })
    // distinct slots of one query draw independently (not all identical)
    val perQuery = got.groupBy(_._1).values
    assert(perQuery.exists(_.flatMap(_._3).distinct.length > 1))
    // deterministic under a different partitioning
    val got2 = Sampling.negativeSample(queries.repartition(7),
        docs.repartition(13), k = 4, buckets = 32)
      .orderBy("query_id", "slot")
      .as[(Long, Int, Option[Long], Long)].collect()
    assert(got2.toSeq === got.toSeq)
  }

  test("negativeSample starvation contract: empty buckets surface as " +
      "NULL slots and n_negatives < k, never a silent short set") {
    // adversarial regime: 3 corpus docs spread over 64 buckets — most
    // slots hash to an empty bucket and CANNOT be filled
    val tiny = Seq(1L, 2L, 3L).toDF("doc_id")
    val queries = tiny.select(col("doc_id").as("query_id"))
    val got = Sampling.negativeSample(queries, tiny, k = 8, buckets = 64)
      .orderBy("query_id", "slot")
      .as[(Long, Int, Option[Long], Long)].collect()
    // the full grid is still emitted
    assert(got.length === 3 * 8)
    // starvation is visible: some slot is NULL, and every row's
    // n_negatives equals its query's filled-slot count
    assert(got.exists(_._3.isEmpty))
    val filled = got.groupBy(_._1).map { case (q, rs) =>
      q -> rs.count(_._3.isDefined).toLong
    }
    assert(got.forall { case (q, _, _, c) => c === filled(q) })
    assert(got.exists { case (_, _, _, c) => c < 8L })
  }

  test("hardNegativeBand: keeps exactly the [lo, hi] rank band minus the " +
      "query's own row, over any search arm's contract") {
    import graft.operators.KnnSearch
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf001)
    val vecs = graft.queries.VectorQueries.asVectorTable(emb)
    val q = graft.queries.VectorQueries.querySet(emb)
    val hits = KnnSearch.knnExact(vecs, q, k = 10, minSim = -2.0)
    val band = Sampling.hardNegativeBand(hits, lo = 2, hi = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(band.nonEmpty)
    assert(band.forall(r => r._4 >= 2 && r._4 <= 5))
    assert(band.forall(r => r._1 != r._2))
    // every query contributes at most hi-lo+1 negatives
    assert(band.groupBy(_._1).values.forall(_.length <= 4))
    intercept[IllegalArgumentException] {
      Sampling.hardNegativeBand(hits, lo = 0, hi = 5)
    }
  }

  test("DSIR: docs made of target-style tokens outweigh off-target docs; " +
      "weights are partitioning-invariant exact integers") {
    import graft.operators.ImportanceResampling
    // raw corpus: half "good"-vocab docs, half "junk"-vocab docs; the
    // target corpus speaks only the good vocab → importance weights must
    // rank every good doc above every junk doc
    val raw = (0 until 40).map { i =>
      val vocab = if (i % 2 == 0) Seq("alpha", "beta", "gamma")
        else Seq("zip", "zap", "zop")
      (i.toLong, (0 until 12).map(j => vocab(j % 3)).mkString(" "))
    }.toDF("doc_id", "text")
    val target = Seq((1000L, "alpha beta gamma alpha beta gamma"))
      .toDF("doc_id", "text")
    val w = ImportanceResampling.importanceWeights(raw, target)
      .as[(Long, Long, Long)].collect()
    val (good, junk) = w.partition(_._1 % 2 == 0)
    assert(good.map(_._3).min > junk.map(_._3).max,
      s"good docs must outweigh junk: ${w.toSeq.sortBy(_._1)}")
    // exact integers → identical at any parallelism
    val w2 = ImportanceResampling.importanceWeights(raw.repartition(7),
      target).as[(Long, Long, Long)].collect()
    assert(w.sortBy(_._1).toSeq === w2.sortBy(_._1).toSeq)
    // resample without noise = deterministic top-k by weight
    val top = ImportanceResampling.resample(raw, target, k = 20,
        noiseSalt = None)
      .select("doc_id").as[Long].collect().toSet
    assert(top === good.map(_._1).toSet)
  }

  test("weights must sum to <= 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 0.9, "b" -> 0.2))
    }
  }
}
