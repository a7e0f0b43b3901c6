package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 surface: streaming-sink gate equivalence. */
class Round8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private val sf = "/root/testdata/sf0.001"

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
