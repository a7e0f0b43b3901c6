package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 additions: [[Curation.bloomDecontaminate]] — the
  * map-only Bloom-sketch twin of the exact decontamination join.
  * Contract mirrors the Misra-Gries/heavyHitters pairing: the sketch
  * may over-remove (bounded by fpp) but NEVER under-removes. */
class Round19Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def evalSet = {
    import spark.implicits._
    Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
  }

  /** docs 1-2 copy a 5-gram from the eval set (contaminated); docs
    * 3-5 share words but no 5-gram (clean). */
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "intro text then the quick brown fox jumps over everything"),
      (2L, "pack my box with five dozen liquor jugs said the clerk"),
      (3L, "the fox and the dog are friends in this story"),
      (4L, "a quick note about boxes and jugs of water"),
      (5L, "completely unrelated sentence about spark partitions"),
      // exactly ONE shared 5-gram: the neighbors break adjacent grams
      (6L, "zzz the quick brown fox jumps yyy")
    ).toDF("doc_id", "text")
  }

  test("bloomDecontaminate never under-removes vs the exact operator") {
    val exact = Curation.decontaminate(corpus, evalSet, "doc_id", "text", k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val bloom = Curation.bloomDecontaminate(corpus, evalSet, "doc_id", "text",
        k = 5, fpp = 0.001)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // no false negatives: everything the exact pass removed is gone here too
    assert(bloom.subsetOf(exact), s"bloom kept $bloom, exact kept $exact")
    // and the contaminated docs are definitely gone
    assert(!bloom(1L) && !bloom(2L))
  }

  test("bloomDecontaminate at tight fpp equals exact on the planted fixture") {
    val exact = Curation.decontaminate(corpus, evalSet, "doc_id", "text", k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val bloom = Curation.bloomDecontaminate(corpus, evalSet, "doc_id", "text",
        k = 5, fpp = 1e-6)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(bloom == exact)
  }

  test("bloomDecontaminate survival rate on disjoint corpora is ~1") {
    import spark.implicits._
    // 300 clean docs with gram spaces disjoint from the eval set
    val clean = (1L to 300L)
      .map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g"))
      .toDF("doc_id", "text")
    val kept = Curation.bloomDecontaminate(clean, evalSet, "doc_id", "text",
      k = 5, fpp = 0.001).count()
    // each doc probes 3 distinct 5-grams; expected false removals
    // ~300·3·0.001 ≈ 1 — allow a loose 10× margin
    assert(kept >= 290L, s"kept $kept/300 clean docs")
  }

  test("bloomDecontaminate minHits raises the removal threshold") {
    // doc 6 shares exactly ONE eval 5-gram: minHits=2 must keep it,
    // while doc 1 (two overlapping shared grams) stays removed
    val kept = Curation.bloomDecontaminate(corpus, evalSet, "doc_id", "text",
        k = 5, minHits = 2, fpp = 1e-6)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept(6L) && !kept(1L), s"kept=$kept")
  }

  test("bloomDecontaminate plan is a single map-only filter: no joins, no exchanges") {
    // parquet source, not a LocalRelation — ConvertToLocalRelation
    // would otherwise evaluate the whole filter at optimization time
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Curation.bloomDecontaminate(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 50),
        evalSet, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("bloom_hit_count"), plan)
  }

  test("IncrementalDsir: batched ingest fits exactly the union-corpus model") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val b1 = Seq((1L, "t", "the cat sat on the soft mat"),
        (10L, "r", "the cat sat on the soft rug"))
      .toDF("doc_id", "split", "text")
    val b2 = Seq((2L, "t", "a cat naps on the warm mat"),
        (12L, "r", "hydraulic pump torque valve spec sheet"))
      .toDF("doc_id", "split", "text")
    val b3 = Seq((3L, "t", "the cat chased the toy mouse"),
        (13L, "r", "compiler register allocation spill heuristics"))
      .toDF("doc_id", "split", "text")
    val union = b1.unionByName(b2).unionByName(b3)

    val inc = new graft.operators.IncrementalDsir(spark,
      graft.util.TempDirs.create("graft-incdsir-").toString)
    assert(inc.ingest(b1, "text", col("split") === "t", 1L))
    assert(inc.ingest(b2, "text", col("split") === "t", 2L))
    assert(inc.ingest(b3, "text", col("split") === "t", 3L))

    val incOut = inc.selectTopK(union, "doc_id", "text", topK = 6).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("sel_rank"))).toSet
    val batchOut = graft.operators.Selection
      .dsirSelect(union, "doc_id", "text", col("split") === "t", topK = 6)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("sel_rank"))).toSet
    assert(incOut == batchOut)

    // idempotence: re-running the last batch is a no-op
    assert(!inc.ingest(b3, "text", col("split") === "t", 3L))
    assert(inc.highWater.contains(3L))
    val again = inc.selectTopK(union, "doc_id", "text", topK = 6).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("sel_rank"))).toSet
    assert(again == batchOut)
  }

  test("NfcNormalize: composition, idempotence, astral passthrough") {
    import spark.implicits._
    import graft.functions.GraftExpressions.nfc_normalize
    import org.apache.spark.sql.functions.{col, length}
    val rows = Seq(
      (1L, "cafe\u0301"),         // decomposed e + COMBINING ACUTE
      (2L, "caf\u00e9"),           // already composed \u00e9
      (3L, "\u1e69"),              // s with dot below and above, composed
      (4L, "s\u0307\u0323"),       // decomposed, marks out of canonical order
      (5L, "plain ascii stays"),
      (6L, "astral \ud83d\ude42 ok") // surrogate-pair emoji
    ).toDF("id", "t")
    val out = rows.select(col("id"), nfc_normalize(col("t")).as("n"),
        length(nfc_normalize(col("t"))).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == out(2L)) // decomposed folds to composed
    assert(out(1L)._1 == "caf\u00e9" && out(1L)._2 == 4)
    assert(out(3L) == out(4L)) // multi-mark canonical ordering
    assert(out(5L)._1 == "plain ascii stays")
    assert(out(6L)._1 == "astral 🙂 ok")
    // idempotence: normalizing a normalized column is the identity
    val twice = rows.select(nfc_normalize(nfc_normalize(col("t"))).as("n"))
      .collect().map(_.getString(0)).toSeq
    val once = rows.select(nfc_normalize(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once)
  }

  test("repetitionFactors: Hamilton apportionment sums exactly to the budget") {
    import spark.implicits._
    val rows = Seq((1L, 3L), (2L, 1L), (3L, 1L), (4L, 2L)).toDF("id", "w")
    // W=7, B=10: quotas 30/7,10/7,10/7,20/7 -> base 4,1,1,2 (sum 8),
    // remainders 2,3,3,6 -> deficit 2 goes to id 4 (rem 6) then id 2
    // (rem 3, tie with id 3 broken by id asc)
    val out = Curation.repetitionFactors(rows, "id", "w", totalBudget = 10L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("reps")).toMap
    assert(out == Map(1L -> 4L, 2L -> 2L, 3L -> 1L, 4L -> 3L), out.toString)
    assert(out.values.sum == 10L)
  }

  test("repetitionFactors: proportionality and budget exactness at scale") {
    import spark.implicits._
    val rows = (1L to 777L).map(i => (i, i % 13 + 1)).toDF("id", "w")
    val out = Curation.repetitionFactors(rows, "id", "w", totalBudget = 123457L)
      .collect()
    assert(out.map(_.getAs[Long]("reps")).sum == 123457L)
    // each row's reps is its exact quota floor or floor+1
    val tw = (1L to 777L).map(i => i % 13 + 1).sum
    out.foreach { r =>
      val q = r.getAs[Long]("w") * 123457L / tw
      val reps = r.getAs[Long]("reps")
      assert(reps == q || reps == q + 1, s"id ${r.getAs[Long]("id")}: $reps vs $q")
    }
  }

  test("repetitionFactors argument guards") {
    import spark.implicits._
    val rows = Seq((1L, 0L), (2L, 0L)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Curation.repetitionFactors(rows, "id", "w", totalBudget = 10L) // all-zero
    }
    intercept[IllegalArgumentException] {
      Curation.repetitionFactors(Seq((1L, -1L), (2L, 5L)).toDF("id", "w"),
        "id", "w", totalBudget = 10L) // negative weight
    }
    intercept[IllegalArgumentException] {
      Curation.repetitionFactors(Seq((1L, 1L << 40)).toDF("id", "w"),
        "id", "w", totalBudget = 1L << 40) // quota overflow
    }
    // fractional weights would be silently truncated by the integer
    // quota math — rejected with a rescale hint instead
    val frac = intercept[IllegalArgumentException] {
      Curation.repetitionFactors(Seq((1L, 2.9), (2L, 0.4)).toDF("id", "w"),
        "id", "w", totalBudget = 10L)
    }
    assert(frac.getMessage.contains("integral"))
  }

  test("Pq: lossless codebooks reproduce the exact inner-product top-k") {
    import spark.implicits._
    import graft.operators.Pq
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.5f, 0.5f)), (2L, Seq(0.0f, 1.0f, 0.5f, 0.0f)),
      (3L, Seq(0.9f, 0.1f, 0.0f, 1.0f)), (4L, Seq(0.2f, 0.8f, 1.0f, 0.5f)),
      (5L, Seq(0.5f, 0.5f, 0.2f, 0.9f)), (6L, Seq(0.1f, 0.3f, 0.7f, 0.1f))
    )
    val df = vecs.toDF("vec_id", "embedding")
    // codesPerSub >= distinct subvectors -> every subvector is its own
    // code and ADC degenerates to the exact inner product
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, codesPerSub = 6)
    val enc = Pq.encode(df, "vec_id", "embedding", cb)
    val q = Array(0.7, 0.3, 0.4, 0.8)
    val got = Pq.adcTopK(enc, "vec_id", cb, q, k = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val want = vecs
      .map { case (id, v) => id -> v.zip(q).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
    assert(got == want, s"got $got want $want")
  }

  test("Pq: lossy codebooks keep cluster-level recall and training is deterministic") {
    import spark.implicits._
    import graft.operators.Pq
    // 3 tight clusters of 10 vectors each in dim 8
    val base = Seq(
      Array(1.0f, 1, 0, 0, 0, 0, 1, 1), Array(0.0f, 0, 1, 1, 1, 1, 0, 0),
      Array(1.0f, 0, 1, 0, 1, 0, 1, 0))
    val vecs = for (c <- 0 until 3; i <- 0 until 10) yield
      ((c * 10 + i).toLong, base(c).zipWithIndex
        .map { case (x, j) => x + 0.01f * ((i + j) % 5) }.toSeq)
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 4, codesPerSub = 3)
    val cb2 = Pq.train(df, "vec_id", "embedding", m = 4, codesPerSub = 3)
    assert(cb.codes.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.codes.map(_.map(_.toSeq).toSeq).toSeq) // deterministic training
    val enc = Pq.encode(df, "vec_id", "embedding", cb)
    // query at cluster 2's center: its 10 members must own the top-10
    val got = Pq.adcTopK(enc, "vec_id", cb, base(2).map(_.toDouble), k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got == (20L until 30L).toSet, got.toString)
  }

  test("Pq argument guards") {
    import spark.implicits._
    import graft.operators.Pq
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "embedding", m = 2, codesPerSub = 4) // 3 % 2 != 0
    }
    val cb = Pq.train(df, "vec_id", "embedding", m = 3, codesPerSub = 2)
    intercept[IllegalArgumentException] {
      Pq.adcTopK(Pq.encode(df, "vec_id", "embedding", cb), "vec_id", cb,
        Array(1.0, 2.0), k = 1) // wrong query dim
    }
  }

  test("knPerplexity matches the closed-form KN formula; model normalizes to 1") {
    import spark.implicits._
    import graft.operators.Selection
    val texts = Map(
      1L -> "a b a c a b",
      2L -> "b c b a",
      3L -> "c c a b a")
    val docs = texts.toSeq.toDF("doc_id", "text")
    // corpus bigram stats, replicated in plain Scala
    val bgs = texts.values.flatMap(t => t.split(" ").sliding(2).map(p => (p(0), p(1)))).toSeq
    val cVW = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cv = cVW.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1v = cVW.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1w = cVW.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val n1all = cVW.size.toLong
    def p(v: String, w: String): Double =
      (cVW((v, w)) - 0.75) / cv(v) + (0.75 * n1v(v) / cv(v)) * (n1w(w).toDouble / n1all)
    def lpMicro(v: String, w: String): Long = math.floor(math.log(p(v, w)) * 1e6).toLong
    val expect = texts.view.mapValues(t =>
      -t.split(" ").sliding(2).map(x => lpMicro(x(0), x(1))).sum).toMap
    val out = Selection.knPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("surprisal_micro")).toMap
    assert(out == expect, s"$out vs $expect")
    // interpolated KN normalizes: for each context v, Σ_w p(w|v) over
    // the continuation vocabulary is exactly 1
    val vocabW = n1w.keySet
    for (v <- cv.keySet) {
      val mass = vocabW.toSeq.map { w =>
        val disc = cVW.get((v, w)).map(c => (c - 0.75) / cv(v)).getOrElse(0.0)
        disc + (0.75 * n1v(v) / cv(v)) * (n1w(w).toDouble / n1all)
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $v mass $mass")
    }
  }

  test("knPerplexity: formulaic docs score lower than rare-bigram docs; short docs omitted") {
    import spark.implicits._
    import graft.operators.Selection
    val docs = (Seq((100L, "x")) ++ // 1 token: no bigrams, must be absent
      (1L to 8L).map(i => (i, "the cat sat on the mat")) ++
      Seq((50L, "zebra quark flux onto violet prism")))
      .toDF("doc_id", "text")
    val out = Selection.knPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl_token")).toMap
    assert(!out.contains(100L))
    assert(out(1L) < out(50L), out.toString)
  }

  test("WordShingleStrings parity with the HOF formulation (both variants, adversarial text)") {
    import spark.implicits._
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions.col
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf('é', '中', '.', '-'))).map(_.mkString),
      Gen.const("🙂"))
    val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = Gen.listOfN(150, doc)
      .apply(Gen.Parameters.default, Seed(19L)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (k <- Seq(1, 2, 5)) {
      val nd = docs.select(col("doc_id"), TextFunctions.wordShingles(col("text"), k).as("g"))
      val hd = docs.select(col("doc_id"), TextFunctions.wordShinglesHof(col("text"), k).as("g"))
      assert(nd.exceptAll(hd).isEmpty && hd.exceptAll(nd).isEmpty, s"distinct k=$k")
      val na = docs.select(col("doc_id"), TextFunctions.wordShinglesAll(col("text"), k).as("g"))
      val ha = docs.select(col("doc_id"), TextFunctions.wordShinglesAllHof(col("text"), k).as("g"))
      assert(na.exceptAll(ha).isEmpty && ha.exceptAll(na).isEmpty, s"all k=$k")
    }
  }

  test("IvfPq: full probe + lossless codebooks equals exact; partial probe prunes") {
    import graft.operators.{IvfPq, Pq}
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = embs.count().toInt
    val path = graft.util.TempDirs.create("graft-ivfpq-").toString
    val cb = IvfPq.build(embs, "vec_id", "embedding", nLists = 4,
      m = 2, codesPerSub = n + 8, path = path)
    assert(IvfPq.codebooks(spark, path).codes.map(_.length).toSeq ==
      cb.codes.map(_.length).toSeq)

    val all = embs.orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    val q = all.head._2
    // exact scores computed the ADC way (per-subspace partial sums)
    def exact(v: Array[Double]): Double = {
      val sub = cb.subDim
      (0 until cb.m).map { s =>
        var d = 0.0; var j = 0
        while (j < sub) { d += q(s * sub + j) * v(s * sub + j); j += 1 }
        d
      }.sum
    }
    val want = all.map { case (id, v) => (id, exact(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val full = IvfPq.topK(spark, path, cb, q, k = 5, nProbe = 4)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(full == want, s"got $full want $want")

    // partial probe: the codes scan reads only probed list directories
    val partial = IvfPq.topK(spark, path, cb, q, k = 5, nProbe = 1)
    // selectedPartitions is the PRUNED set (location.inputFiles lists
    // the whole unpruned index)
    val scanned = partial.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("pq_codes")) =>
        s.selectedPartitions.partitionCount
    }.headOption
    assert(scanned.contains(1),
      s"expected one probed list partition, scanned $scanned")
  }

  test("stripMarkup: tags, entities, decode order, whitespace collapse") {
    import spark.implicits._
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "a &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;&amp;done"),
      // &amp;lt; must decode to the LITERAL &lt;, never to <
      (3L, "&amp;lt;not-a-tag&amp;gt;"),
      (4L, "  spaced\tout\n\ntext  "),
      (5L, "<div class=\"x\" data-y='1'>attr soup</div>"),
      (6L, "no markup at all")
    ).toDF("id", "t")
    val out = rows.select(col("id"), TextFunctions.stripMarkup(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "a <b> \"q\" 's' &done")
    assert(out(3L) == "&lt;not-a-tag&gt;")
    assert(out(4L) == "spaced out text")
    assert(out(5L) == "attr soup")
    assert(out(6L) == "no markup at all")
  }

  test("bloomDecontaminate argument guards") {
    intercept[IllegalArgumentException] {
      Curation.bloomDecontaminate(corpus, evalSet, "doc_id", "text", minHits = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.bloomDecontaminate(corpus, evalSet, "doc_id", "text", fpp = 0.0)
    }
  }
}
