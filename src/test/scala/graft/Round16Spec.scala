package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 additions: [[Curation.oovRate]] as a real parameterized
  * operator (vocabulary size V was previously hardcoded in the p35
  * gate body). */
class Round16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "quantum flux capacitors hum"),
      (4L, "the the the cat cat dog")
    ).toDF("doc_id", "text")
  }

  // corpus occurrence counts: the=8, cat=3, sat=2, on=2, dog=2,
  // mat=1, rug=1, quantum=1, flux=1, capacitors=1, hum=1
  // rank order (freq DESC, word ASC): the, cat, dog, on, sat, ...

  test("oovRate: V=1 vocabulary is {the}") {
    val byId = Curation.oovRate(docs, "doc_id", "text", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(byId(1L) == ((6, 4.0 / 6)))  // "the" twice in 6 tokens
    assert(byId(3L) == ((4, 1.0)))      // nothing in vocab
    assert(byId(4L) == ((6, 3.0 / 6)))  // three "the"
  }

  test("oovRate: V=5 vocabulary is {the,cat,dog,on,sat} (freq desc, word asc ties)") {
    val byId = Curation.oovRate(docs, "doc_id", "text", vocabSize = 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(byId(1L) == ((6, 1.0 / 6)))  // only "mat" OOV
    assert(byId(2L) == ((6, 1.0 / 6)))  // only "rug" OOV
    assert(byId(3L) == ((4, 1.0)))
    assert(byId(4L) == ((6, 0.0)))      // all tokens in vocab
  }

  test("oovRate: V larger than the vocabulary covers everything") {
    val fracs = Curation.oovRate(docs, "doc_id", "text", vocabSize = 1000)
      .collect().map(_.getDouble(2))
    assert(fracs.forall(_ == 0.0))
  }

  test("oovRate: rejects nonpositive and driver-hostile V") {
    intercept[IllegalArgumentException] {
      Curation.oovRate(docs, "doc_id", "text", vocabSize = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.oovRate(docs, "doc_id", "text", vocabSize = 100 * 1024 * 1024)
    }
  }
}
