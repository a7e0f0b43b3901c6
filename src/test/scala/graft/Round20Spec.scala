package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 additions: the [[graft.functions.OovCount]] plan-resident
  * hash-set expression replacing oovRate's interpreted literal-array
  * HOF — parity-asserted against the HOF formulation it replaced on
  * adversarial tokenization shapes. */
class Round20Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  test("OovCount parity with the array_contains HOF it replaced") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),
      (3L, "unseen words only here"),
      (4L, ""),                       // split -> [""], "" not in vocab
      (5L, "double  space"),          // empty token between spaces
      (6L, " leading and trailing "), // empty first/last tokens
      (7L, "naïve café 北京 mixed"),    // non-ASCII equality
      (8L, "the")
    ).toDF("doc_id", "text")
    val vocab = Array("the", "quick", "fox", "café", "")
    val vocabArr = array(vocab.toIndexedSeq.map(lit): _*)
    val ws = split(col("text"), " ")
    val hof = docs.select(col("doc_id"),
      size(filter(ws, w => !array_contains(vocabArr, w))).cast("long").as("oov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(vocab)
    val native = docs.select(col("doc_id"),
      graft.functions.GraftExpressions.oov_count(col("text"), bc).as("oov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof, s"native=$native hof=$hof")
    // spot-check absolutes: "" IS in this vocab, so the empty-string
    // tokens of docs 4-6 are in-vocabulary, not OOV
    assert(native(4L) == 0L)
    assert(native(2L) == 0L)
    assert(native(8L) == 0L)
    assert(native(5L) == 2L) // "double","","space": "" in vocab, other two OOV
    assert(native(3L) == 4L)
  }

  test("canonicalizeUrls edge shapes: bare host, ports, params, case") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTP://WWW.Foo.COM"),                      // bare host, no path
      (2L, "https://foo.com:443"),                     // default port, https
      (3L, "http://foo.com:8080/a/"),                  // kept port, slash
      (4L, "https://foo.com/A/B?x=1&utm_source=s"),    // path CASE preserved
      (5L, "http://foo.com/?utm_a=1&utm_b=2"),         // query all-tracking
      (6L, "https://sub.foo.com/p?b=2&a=1#frag"),      // param order kept
      (7L, "http://foo.com:80/x?gclid=g&keep=1")
    ).toDF("id", "url")
    val out = graft.operators.Curation.canonicalizeUrls(urls, "url")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("canonical_url"), r.getAs[String]("domain"))).toMap
    assert(out(1L) == (("http://foo.com/", "foo.com")))
    assert(out(2L) == (("https://foo.com/", "foo.com")))
    assert(out(3L) == (("http://foo.com:8080/a", "foo.com")))
    assert(out(4L) == (("https://foo.com/A/B?x=1", "foo.com")))
    assert(out(5L) == (("http://foo.com/", "foo.com")))
    assert(out(6L) == (("https://sub.foo.com/p?b=2&a=1", "sub.foo.com")))
    assert(out(7L) == (("http://foo.com/x?keep=1", "foo.com")))
  }

  test("domainCap keeps at most N per domain, deterministic rank") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, s"http://d${i % 2}.com/p$i", 100L - i)).toDF("id", "url", "score")
    val out = graft.operators.Curation.domainCap(docs, "url", "id", "score", 3)
      .select("domain", "id", "domain_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // per domain the 3 HIGHEST scores = the 3 lowest ids of that parity
    assert(out == Set(
      ("d1.com", 1L, 1L), ("d1.com", 3L, 2L), ("d1.com", 5L, 3L),
      ("d0.com", 2L, 1L), ("d0.com", 4L, 2L), ("d0.com", 6L, 3L)), out.toString)
  }

  test("oovRate end-to-end uses the native expression and keeps values") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"), (2L, "b c d e"), (3L, "a b a b")
    ).toDF("doc_id", "text")
    // corpus freq: a=5 b=4 c=1 d=1 e=1 -> top-2 vocab {a, b}
    val byId = Curation.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Double]("oov_frac"))).toMap
    assert(byId(1L) == ((4, 0.0)))
    assert(byId(2L) == ((4, 0.75)))
    assert(byId(3L) == ((4, 0.0)))
  }
}
