package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 surface: streaming-sink gate equivalence. */
class Round8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private val sf = "/root/testdata/sf0.001"

  test("BPE merges follow max-count with lexicographic tie-break") {
    import spark.implicits._
    // the classic Sennrich fixture: freqs low=5 lower=2 newest=3 widest=1
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest",
      "widest").toDF("text")
    val got = graft.operators.Bpe.mergeStats(docs, "text", 6)
      .as[(Int, String, String, Long)].collect().toSeq
    // hand-derived: ties at 7 (l,o)/(o,w); at 4 (e,s)/(s,t); at 3 the
    // lexicographic order picks (e,w) then (ew,est)
    assert(got == Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "e", "s", 4L),
      (4, "es", "t", 4L),
      (5, "e", "w", 3L),
      (6, "ew", "est", 3L)))
  }

  test("BPE stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("a b a b").toDF("text")
    // single-char words have no adjacent pairs at all
    assert(graft.operators.Bpe.mergeStats(docs, "text", 4).count() == 0)
  }

  test("l17 stream-sink snapshot equals l1 batch upsert (shared oracle)") {
    // l17's oracle IS cowUpsertSql — the streaming source→sink round
    // trip must converge to exactly the batch insert+upsert snapshot
    val viaStream = LakehouseQueries.qStreamSink(spark, sf)
    val viaBatch = LakehouseQueries.qCowUpsertSnapshot(spark, sf)
    assert(viaStream.schema.fieldNames.toSeq ==
      viaBatch.schema.fieldNames.toSeq)
    val a = viaStream.collect().map(_.toSeq)
    val b = viaBatch.collect().map(_.toSeq)
    assert(a.length == b.length && a.length > 0)
    assert(a.toSeq == b.toSeq)
  }
}
