package graft

import graft.operators.Selection
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 additions: [[Selection.dsirSelect]] (hashed n-gram
  * importance resampling, Xie et al. 2023) and
  * [[Selection.perplexityBuckets]] (CCNet-style head/middle/tail
  * split, Wenzek et al. 2020). */
class Round18Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  /** 4 target docs about cats, 4 raw docs: two cat-like, two about
    * unrelated machinery — the cat-like raw docs must outrank. */
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "t", "the cat sat on the soft mat"),
      (2L, "t", "a cat naps on the warm mat"),
      (3L, "t", "the cat chased the toy mouse"),
      (4L, "t", "my cat purrs on the soft rug"),
      (10L, "r", "the cat sat on the soft rug"),
      (11L, "r", "a cat naps near the toy mouse"),
      (12L, "r", "hydraulic pump torque valve spec sheet"),
      (13L, "r", "compiler register allocation spill heuristics")
    ).toDF("doc_id", "split", "text")
  }

  test("dsirSelect ranks target-like raw docs above unrelated ones") {
    val out = Selection.dsirSelect(corpus, "doc_id", "text",
        targetPred = col("split") === "t", numBuckets = 256, topK = 8)
      .collect().sortBy(_.getAs[Long]("sel_rank"))
    assert(out.length == 8)
    val rankOf = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sel_rank")).toMap
    // both cat-like raw docs outrank both machinery docs
    for (catty <- Seq(10L, 11L); machine <- Seq(12L, 13L))
      assert(rankOf(catty) < rankOf(machine),
        s"doc $catty should outrank $machine: $rankOf")
    // ranks are 1..k, dense, deterministically tie-broken
    assert(out.map(_.getAs[Long]("sel_rank")).toSeq == (1L to 8L))
    // scores descend with rank
    val scores = out.map(_.getAs[Long]("score_micro")).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
  }

  test("dsirSelect n_terms counts unigrams plus adjacent bigrams") {
    val out = Selection.dsirSelect(corpus, "doc_id", "text",
        targetPred = col("split") === "t", topK = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_terms")).toMap
    // every fixture doc has 6 or 7 tokens -> 2n-1 terms
    assert(out(1L) == 13L) // 7 tokens
    assert(out(12L) == 11L) // 6 tokens
  }

  test("dsirSelect single-token docs have no bigrams and still score") {
    import spark.implicits._
    val tiny = Seq((1L, true, "cat"), (2L, false, "cat"), (3L, false, "valve"))
      .toDF("doc_id", "is_t", "text")
    val out = Selection.dsirSelect(tiny, "doc_id", "text", col("is_t"), topK = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("sel_rank"))).toMap
    assert(out(2L)._1 == 1L)
    // the raw doc sharing the target's only term outranks the other
    assert(out(2L)._2 < out(3L)._2)
  }

  test("TermBuckets native expression is parity-exact with the HOF formulation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val native = docs.select(col("doc_id"),
      graft.functions.GraftExpressions.term_buckets(col("text"), 256).as("b"))
    val hof = docs.select(col("doc_id"),
      Selection.termBucketsHof(col("text"), 256).as("b"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("dsirSelect argument guards") {
    intercept[IllegalArgumentException] {
      Selection.dsirSelect(corpus, "doc_id", "text", lit(true), numBuckets = 1 << 17)
    }
    intercept[IllegalArgumentException] {
      Selection.dsirSelect(corpus, "doc_id", "text", lit(true), topK = 0)
    }
  }

  test("perplexityBuckets: fluent docs head, rare-word docs tail, equal depth") {
    import spark.implicits._
    // 6 docs over a shared vocab; doc 5/6 are rare-word soup
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "the cat ran to the dog"),
      (4L, "a cat and a dog sat"),
      (5L, "zyx qwv plk mnb vcx jhg"),
      (6L, "qqq www eee rrr ttt yyy")
    ).toDF("doc_id", "text")
    val out = Selection.perplexityBuckets(docs, "doc_id", "text", numBuckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ppl_bucket"), r.getAs[Double]("ppl_proxy"))).toMap
    // equal-depth: each bucket holds exactly 2 of the 6 docs
    val sizes = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map(1L -> 2, 2L -> 2, 3L -> 2), sizes.toString)
    // the two rare-word docs are the tail bucket
    assert(out(5L)._1 == 3L && out(6L)._1 == 3L, out.toString)
    // proxy ordering respects bucket ordering
    val maxHead = out.values.filter(_._1 == 1L).map(_._2).max
    val minTail = out.values.filter(_._1 == 3L).map(_._2).min
    assert(maxHead < minTail)
  }

  test("perplexityBuckets surprisal identity: micro numerator is exact") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1; N=5, V=3 -> lnNV = ln(8)
    val lp = (c: Long) => math.floor(math.log(c + 1.0) * 1e6).toLong
    val lnNV = math.floor(math.log(8.0) * 1e6).toLong
    val expect = Map(
      1L -> (3L * lnNV - (2 * lp(2) + lp(2))),
      2L -> (2L * lnNV - (lp(2) + lp(1))))
    val out = Selection.perplexityBuckets(docs, "doc_id", "text", numBuckets = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("surprisal_micro")).toMap
    assert(out == expect)
  }

  test("bm25TopK: tf, coverage, and length normalization order as BM25 says") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat dog"),          // high tf for cat
      (2L, "cat dog bird fish"),        // covers both query terms once
      (3L, "cat"),                      // short doc, one term
      (4L, "lizard newt frog toad"),    // no query terms -> absent
      (5L, "dog dog dog dog dog dog dog dog")
    ).toDF("doc_id", "text")
    val qs = Seq((7L, "cat dog")).toDF("qid", "qtext")
    val out = Selection.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 10)
      .collect()
    // doc 4 shares no term: absent entirely
    assert(!out.exists(_.getAs[Long]("doc_id") == 4L))
    assert(out.forall(_.getAs[Long]("qid") == 7L))
    val rank = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bm_rank")).toMap
    // both-term docs beat the single-term short doc
    assert(rank(1L) < rank(3L) && rank(2L) < rank(3L), rank.toString)
    // ranks dense from 1
    assert(rank.values.toSeq.sorted == (1L to rank.size))
  }

  test("bm25TopK score matches the closed-form formula exactly") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a a c"), (3L, "c d")).toDF("doc_id", "text")
    val qs = Seq((1L, "a")).toDF("qid", "qtext")
    // N=3, Σdl=7, df(a)=2; idf_micro = floor(1e6·ln(1+(3-2+0.5)/2.5))
    val idf = math.floor(math.log(1.0 + (3.0 - 2.0 + 0.5) / 2.5) * 1e6)
    def contrib(tf: Long, dl: Long): Long =
      math.floor(idf * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dl * 3.0 / 7.0)))).toLong
    val out = Selection.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(out == Map(1L -> contrib(1, 2), 2L -> contrib(2, 3)))
  }

  test("bm25TopK caps at k per query independently") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"common w$i")).toDF("doc_id", "text")
    val qs = Seq((1L, "common"), (2L, "w3 w4")).toDF("qid", "qtext")
    val out = Selection.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .collect().groupBy(_.getAs[Long]("qid")).view.mapValues(_.length).toMap
    assert(out(1L) == 3 && out(2L) == 2, out.toString)
  }

  test("weightedSample matches the ES closed form and excludes w<=0") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 500L), (3L, 40L), (4L, 0L), (5L, -3L), (6L, 7L))
      .toDF("doc_id", "w")
    val out = graft.operators.Curation.weightedSample(rows, "doc_id", "w", m = 3)
      .collect()
    // w<=0 rows can never appear
    assert(!out.exists(r => Set(4L, 5L)(r.getAs[Long]("doc_id"))))
    // exact priority replication: u from first 48 md5 bits of the id string
    def pr(id: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 281474976710656.0
      math.floor(math.log(u) / w * 1e9).toLong
    }
    val expect = Seq(1L -> 10L, 2L -> 500L, 3L -> 40L, 6L -> 7L)
      .map { case (id, w) => (id, pr(id, w)) }
      .sortBy { case (id, p) => (-p, id) }.take(3)
    val got = out.sortBy(_.getAs[Long]("samp_rank"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pr_micro"))).toSeq
    assert(got == expect)
  }

  test("weightedSample inclusion odds grow with weight") {
    import spark.implicits._
    // 200 light rows (w=1) + 200 heavy rows (w=20): heavies should
    // dominate a 100-row sample under any reasonable hash
    val rows = ((1L to 200L).map(i => (i, 1L)) ++ (201L to 400L).map(i => (i, 20L)))
      .toDF("doc_id", "w")
    val picked = graft.operators.Curation.weightedSample(rows, "doc_id", "w", m = 100)
      .collect().map(_.getAs[Long]("doc_id"))
    val heavies = picked.count(_ > 200L)
    assert(heavies > 70, s"heavy rows picked: $heavies/100")
    // deterministic: a second run returns the identical set
    val again = graft.operators.Curation.weightedSample(rows, "doc_id", "w", m = 100)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(picked.toSeq == again.toSeq)
  }

  test("dsirSelect scoring plan: broadcast join, no extra corpus exchange") {
    val plan = Selection.dsirSelect(corpus, "doc_id", "text",
        targetPred = col("split") === "t", topK = 8)
      .queryExecution.executedPlan.toString()
    // the B-row ratio table joins broadcast, never shuffled
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // top-k is TakeOrdered, not a global Sort+Exchange
    assert(plan.contains("TakeOrdered"), plan)
  }

  test("bm25TopK plan: query set and stats broadcast, no sort-merge joins") {
    import spark.implicits._
    val qs = Seq((1L, "cat dog")).toDF("qid", "qtext")
    val plan = Selection.bm25TopK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("weightedSample plan: map-only projection + TakeOrdered, zero shuffles") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("doc_id", "w")
    val plan = graft.operators.Curation.weightedSample(rows, "doc_id", "w", m = 10)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrdered"), plan)
    // the only exchange is the k-row SinglePartition under the final
    // rank window — the corpus itself is never hash-shuffled
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("selection outputs are partition-invariant (100 TB determinism property)") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val sel = Selection.dsirSelect(df, "doc_id", "text",
          col("lang") === "en", topK = 20)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("sel_rank"))).toSet
      val ppl = Selection.perplexityBuckets(df, "doc_id", "text")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("surprisal_micro"),
          r.getAs[Long]("ppl_bucket"))).toSet
      val samp = graft.operators.Curation.weightedSample(df
          .select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", m = 25)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pr_micro"),
          r.getAs[Long]("samp_rank"))).toSet
      (sel, ppl, samp)
    }
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("TermBuckets parity holds on adversarial text (seeded random strings)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // words over ascii, unicode (CJK, accents, emoji), digits, and
    // punctuation; docs join them with single spaces (the operator's
    // tokenizer contract) but may be empty or single-token
    val word = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf('é', 'ß', '中', '文', '.', ',', '\'', '-')))
        .map(_.mkString),
      Gen.const("🙂"), // astral codepoint (surrogate pair in UTF-16)
      Gen.const("a🙂中"))
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = Gen.listOfN(120, doc)
      .apply(Gen.Parameters.default, Seed(20260815L)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
      graft.functions.GraftExpressions.term_buckets(col("text"), 256).as("b"))
    val hof = df.select(col("doc_id"),
      Selection.termBucketsHof(col("text"), 256).as("b"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("perplexityBuckets argument guard") {
    intercept[IllegalArgumentException] {
      Selection.perplexityBuckets(corpus, "doc_id", "text", numBuckets = 0)
    }
  }
}
