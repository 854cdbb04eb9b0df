package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Diversify, KnnSearch, Mutations}

/** Property-based checks (SURVEY §5.2): search against a scala-side
  * brute-force oracle on random vectors; mutation algebra invariants.
  * Raw ScalaCheck generators sampled from a fixed seed (the scalatest
  * bridge artifact isn't available offline) — deterministic cases, 5 per
  * property. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toSeq)
  private val tableGen: Gen[List[(Long, Seq[Float])]] = for {
    n <- Gen.choose(5, 30)
    vecs <- Gen.listOfN(n, vecGen)
  } yield vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def cases[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("knnExact equals the brute-force oracle on random tables") {
    for ((rows, qv) <- cases(Gen.zip(tableGen, vecGen))
         if qv.exists(_ != 0f)) {
      val nodes = rows.map { case (id, v) => (id, v, false) }
        .toDF("id", "vector", "deleted")
      val q = Seq((0L, qv)).toDF("query_id", "query_vec")
      val got = KnnSearch.knnExact(nodes, q, k = 3, minSim = 0.2)
        .select("id").as[Long].collect().toList
      val expected = rows
        .filter { case (_, v) => v.exists(_ != 0f) } // zero vec → NaN score
        .map { case (id, v) => (id, cosine(v, qv)) }
        .filter(_._2 > 0.2)
        .sortBy { case (id, s) => (-s, id) }
        .take(3).map(_._1)
      assert(got === expected, s"query=$qv")
    }
  }

  test("upsert is idempotent: applying the same delta twice = once") {
    for (rows <- cases(tableGen)) {
      val cur = rows.map { case (id, v) => (id, v, false) }
        .toDF("id", "vector", "deleted")
      val delta = rows.take(3).map { case (id, v) =>
        (id, v.map(_ * 2f), false) }.toDF("id", "vector", "deleted")
      val once = Mutations.upsert(cur, delta)
      val twice = Mutations.upsert(once, delta)
      assert(once.as[(Long, Seq[Float], Boolean)].collect().toSet ===
        twice.as[(Long, Seq[Float], Boolean)].collect().toSet)
    }
  }

  test("compaction preserves exactly the non-deleted set") {
    for ((rows, mod) <- cases(Gen.zip(tableGen, Gen.choose(2, 5)))) {
      val cur = rows.map { case (id, v) => (id, v, false) }
        .toDF("id", "vector", "deleted")
      val dels = rows.map(_._1).filter(_ % mod == 0).toDF("id")
      val out = Mutations.compact(Mutations.tombstone(cur, dels))
        .select("id").as[Long].collect().toSet
      assert(out === rows.map(_._1).filterNot(_ % mod == 0).toSet)
    }
  }

  test("deletion neighborhood finds EVERY random sym-diff ≤ 2 pair") {
    // random base token sets; each case derives one deletion variant and
    // one substitution variant — both must pair with their base (the
    // scheme's exactness guarantee, which MinHash banding can't give)
    val wordGen = Gen.listOfN(12,
      Gen.choose('a', 'z').map(_.toString)).map(_.distinct)
    for ((words, i) <- cases(wordGen, n = 5).zipWithIndex
         if words.size >= 4) {
      val base = words.mkString(" ")
      val delVariant = words.drop(1).mkString(" ")
      val subVariant = (words.drop(1) :+ s"zz$i").mkString(" ")
      val far = words.take(words.size / 2)
        .map(w => s"q$w").mkString(" ") // disjoint vocab
      val docs = Seq((1L, base), (2L, delVariant), (3L, subVariant),
        (4L, far)).toDF("doc_id", "text")
      val pairs = graft.operators.TextDedup.deletionNeighborhoodPairs(docs)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"deletion pair missed for: $base")
      assert(pairs.contains((1L, 3L)), s"substitution pair missed for: $base")
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
        s"disjoint doc paired: $pairs")
    }
  }

  test("dedupSelect invariants hold on random pair graphs") {
    // union-find ground truth for the expected partition
    def components(n: Int, edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) parent(find(a.toInt)) = find(b.toInt)
      // canonical label = min member id of the set
      (0 until n).groupBy(find).flatMap { case (_, members) =>
        val m = members.min.toLong; members.map(_.toLong -> m)
      }
    }
    val graphGen = for {
      n <- Gen.choose(4, 25)
      nEdges <- Gen.choose(0, 2 * n)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (n, edges.collect { case (a, b) if a != b => (a.toLong, b.toLong) })
    for ((n, edges) <- cases(graphGen)) {
      val docs = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("a_id", "b_id")
      val out = graft.operators.TextDedup.dedupSelect(docs, pairs)
        .as[(Long, Long, Long, Boolean)].collect()
      val truth = components(n, edges)
      assert(out.length === n, "every doc gets a row")
      for ((id, cid, sz, keep) <- out) {
        assert(cid === truth(id), s"doc $id cluster: got $cid want ${truth(id)}")
        assert(sz === truth.count(_._2 == truth(id)).toLong, s"doc $id size")
        assert(keep === (id == truth(id)), s"doc $id keep flag")
      }
      // exactly one keeper per cluster, and keepers cover every cluster
      val keepers = out.filter(_._4).map(_._2)
      assert(keepers.toSet.size === keepers.length)
      assert(keepers.toSet === truth.values.toSet)
    }
  }

  test("sq_l2 / hamming64 metric axioms on random code rows vs scala oracle") {
    import org.apache.spark.sql.functions.{col, expr}
    graft.functions.VectorFunctions.register(spark)
    val codeGen: Gen[Seq[Int]] =
      Gen.listOfN(16, Gen.choose(0, 255)).map(_.toSeq)
    val wordGen: Gen[Seq[Long]] =
      Gen.listOfN(3, Gen.choose(0L, 0xFFFFFFFFL)).map(_.toSeq)
    for ((as, bs) <- cases(Gen.zip(Gen.listOfN(8, codeGen),
        Gen.listOfN(8, wordGen)))) {
      val pairs = as.zip(as.reverse)
      val df = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("i", "a", "b")
        .select(col("i"), expr("sq_l2(a, b)").as("ab"),
          expr("sq_l2(b, a)").as("ba"), expr("sq_l2(a, a)").as("aa"))
        .as[(Int, Long, Long, Long)].collect()
      for ((i, ab, ba, aa) <- df) {
        val (a, b) = pairs(i)
        val want = a.zip(b).map { case (x, y) =>
          val d = (x - y).toLong; d * d }.sum
        assert(ab === want, s"sq_l2 oracle mismatch at $i")
        assert(ab === ba, "sq_l2 symmetric")
        assert(aa === 0L, "sq_l2 identity")
      }
      val wpairs = bs.zip(bs.reverse)
      val wdf = wpairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("i", "a", "b")
        .select(col("i"), expr("hamming64(a, b)").as("ab"),
          expr("hamming64(b, a)").as("ba"), expr("hamming64(a, a)").as("aa"))
        .as[(Int, Long, Long, Long)].collect()
      for ((i, ab, ba, aa) <- wdf) {
        val (a, b) = wpairs(i)
        val want = a.zip(b).map { case (x, y) =>
          java.lang.Long.bitCount(x ^ y).toLong }.sum
        assert(ab === want, s"hamming64 oracle mismatch at $i")
        assert(ab === ba, "hamming64 symmetric")
        assert(aa === 0L, "hamming64 identity")
        assert(ab <= 64L * a.length, "hamming64 bounded by bit width")
      }
    }
  }

  test("mmrTopK invariants vs a scala greedy oracle on random tables") {
    import org.apache.spark.sql.functions.{col, lit}
    graft.functions.VectorFunctions.register(spark)
    for ((rows, qv) <- cases(Gen.zip(tableGen, vecGen))
         if qv.exists(_ != 0f)) {
      val clean = rows.filter { case (_, v) => v.exists(_ != 0f) }
      if (clean.size >= 4) {
        val nodes = clean.map { case (id, v) => (id, v, false) }
          .toDF("id", "vector", "deleted")
        val q = Seq((0L, qv)).toDF("query_id", "query_vec")
        val k = 3; val s = math.min(8, clean.size); val lam = 600000L
        val got = Diversify.mmrTopK(nodes, q, k, shortlist = s,
            lambdaMicro = lam)
          .orderBy(col("rank"))
          .select(col("id"), col("mmr_micro"))
          .as[(Long, Long)].collect().toList
        // scala-side greedy oracle over the same micro quantization
        def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
        val short = clean.map { case (id, v) => (id, v, micro(cosine(v, qv))) }
          .sortBy { case (id, _, m) =>
            (-cosine(clean.find(_._1 == id).get._2, qv), id) }
          .take(s)
        var selected = List.empty[(Long, Seq[Float], Long)]
        var out = List.empty[(Long, Long)]
        for (rank <- 1 to math.min(k, short.size)) {
          val cands = short.filterNot(c => selected.exists(_._1 == c._1))
          val scoredC = cands.map { c =>
            val sc =
              if (rank == 1) lam * c._3
              else lam * c._3 - (1000000L - lam) *
                selected.map(sel => micro(cosine(c._2, sel._2))).max
            (c, sc)
          }
          val best = scoredC.minBy { case (c, sc) => (-sc, c._1) }
          selected ::= best._1
          out :+= (best._1._1,
            if (rank == 1) lam * best._1._3 else best._2)
        }
        assert(got === out, s"q=$qv n=${clean.size}")
      }
    }
  }
}
