package graft

import graft.operators.TextClassifier

/** Multinomial NB classifier ([[operators.TextClassifier]]): exact
  * hand-computed model weights on a tiny corpus (the Laplace + micro
  * quantization arithmetic), OOV handling, prior-only empty docs, and
  * the deterministic argmax tie-break. */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double): Long =
    math.floor(math.log(x) * 1e6 + 0.5).toLong

  private lazy val train = Seq(
    (1L, "a", "x x y"),
    (2L, "a", "x"),
    (3L, "b", "z z"),
    (4L, "b", "y z")).toDF("doc_id", "label", "text")
  private lazy val model = TextClassifier.trainNaiveBayes(train)

  test("training: complete V×C matrix with exact Laplace micro weights") {
    // V = {x,y,z}; tokens per class = 4 each; tf(a)=x:3,y:1,z:0;
    // tf(b)=z:3,y:1,x:0 — weights ln((cnt+1)/(4+3))
    val w = model.weights.as[(String, String, Long)].collect()
      .map { case (l, t, m) => ((l, t), m) }.toMap
    assert(w.size === 6) // complete matrix, zero-count pairs explicit
    assert(w(("a", "x")) === micro(4.0 / 7))
    assert(w(("a", "y")) === micro(2.0 / 7))
    assert(w(("a", "z")) === micro(1.0 / 7))
    assert(w(("b", "z")) === micro(4.0 / 7))
    assert(w(("b", "y")) === micro(2.0 / 7))
    assert(w(("b", "x")) === micro(1.0 / 7))
    val cs = model.classStats.as[(String, Long, Long)].collect()
      .map { case (l, p, d) => (l, (p, d)) }.toMap
    assert(cs("a") === ((micro(0.5), micro(1.0 / 7))))
    assert(cs("b") === ((micro(0.5), micro(1.0 / 7))))
  }

  test("scoring: in-vocab terms use the matrix, OOV terms the class " +
      "default; empty docs score the bare prior; argmax ties on label") {
    val test = Seq(
      (10L, "x x w"), // w is OOV — takes defw in BOTH classes
      (11L, "")       // no tokens — prior only, scores tie exactly
    ).toDF("doc_id", "text")
    val scores = TextClassifier.scoreNaiveBayes(test, model)
      .as[(Long, String, Long)].collect()
      .map { case (id, l, s) => ((id, l), s) }.toMap
    assert(scores.size === 4) // every (doc, class) pair scored
    assert(scores((10L, "a")) ===
      2 * micro(4.0 / 7) + micro(1.0 / 7) + micro(0.5))
    assert(scores((10L, "b")) ===
      2 * micro(1.0 / 7) + micro(1.0 / 7) + micro(0.5))
    assert(scores((11L, "a")) === micro(0.5))
    assert(scores((11L, "b")) === micro(0.5))
    val pred = TextClassifier.classify(test, model)
      .as[(Long, String, Long)].collect()
      .map { case (id, l, _) => (id, l) }.toMap
    assert(pred(10L) === "a")
    assert(pred(11L) === "a") // exact tie → label ascending
  }

  test("a separable corpus classifies its own held-out docs correctly") {
    // class-exclusive vocabularies with disjoint token sets — held-out
    // docs drawn from the same generator must classify to their class
    val docs = (0L until 40L).map { i =>
      val cls = if (i % 2 == 0) "even" else "odd"
      val toks = (0 until 5).map(j => s"$cls${(i + j) % 7}")
      (i, cls, toks.mkString(" "))
    }.toDF("doc_id", "label", "text")
    val m = TextClassifier.trainNaiveBayes(docs.filter($"doc_id" % 5 =!= 0))
    val held = docs.filter($"doc_id" % 5 === 0)
    val got = TextClassifier.classify(held, m)
      .join(held.select($"doc_id", $"label".as("truth")), Seq("doc_id"))
    assert(got.count() === held.count())
    assert(got.filter($"label" =!= $"truth").count() === 0)
  }

  test("knnClassify: majority vote with margin; vote ties break on label") {
    // 3 labeled "a" near (1,0), 2 labeled "b" near (0,1); a query near
    // (1,0) with k=5 sees all of them: votes a=3, b=2 → margin 1
    val labeled = Seq(
      (1L, Seq(1f, 0f), "a"), (2L, Seq(0.9f, 0.1f), "a"),
      (3L, Seq(0.95f, 0.05f), "a"),
      (4L, Seq(0f, 1f), "b"), (5L, Seq(0.1f, 0.9f), "b")
    ).toDF("id", "vector", "label")
    val qs = Seq((10L, Seq(1f, 0.1f))).toDF("query_id", "query_vec")
    val r = TextClassifier.knnClassify(labeled, qs, k = 5)
      .as[(Long, String, Long, Long)].collect()
    assert(r.toSeq === Seq((10L, "a", 3L, 1L)))
    // an exact 1–1 vote tie goes to the ascending label, margin 0
    val lab2 = Seq((1L, Seq(1f, 0f), "b"), (2L, Seq(0f, 1f), "a"))
      .toDF("id", "vector", "label")
    val q2 = Seq((20L, Seq(1f, 1f))).toDF("query_id", "query_vec")
    val r2 = TextClassifier.knnClassify(lab2, q2, k = 2)
      .as[(Long, String, Long, Long)].collect()
    assert(r2.toSeq === Seq((20L, "a", 1L, 0L)))
  }

  test("training on an empty corpus is a loud error") {
    val e = intercept[IllegalArgumentException] {
      TextClassifier.trainNaiveBayes(train.limit(0))
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
