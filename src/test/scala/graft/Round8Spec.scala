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

  test("CDC ingest -> streaming source -> incremental dedup, end to end") {
    import graft.core.{GraftTable, TableConfig}
    import graft.ingest.Debezium
    import graft.operators.{Dedup, IncrementalDedup}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    // the training-data ingest story in one pipe: Debezium change
    // events land in a graft table, the table streams its commits out
    // (l16 source), and each micro-batch dedups incrementally against
    // everything ingested before it
    val root = graft.util.TempDirs.create("graft-r8-cdc-").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val rowSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val t = GraftTable.create(spark, s"$root/docs", TableConfig(
      name = "cdc_docs", keyField = "doc_id", orderingField = "_cdc_ts",
      numBuckets = 2))
    // Debezium 'c' envelopes built from the real corpus (JSON-escaped
    // via to_json); ts_ms = doc_id keeps ordering deterministic
    def wave(pred: org.apache.spark.sql.Column) = Debezium.parse(
      docs.filter(pred).select(concat(
        lit("""{"before":null,"after":"""),
        to_json(struct($"doc_id", $"text")),
        lit(""","op":"c","ts_ms":"""), $"doc_id", lit("}")).as("json")),
      "json", rowSchema)
    val inc = new IncrementalDedup(spark, s"$root/dedup")
    val collected = scala.collection.mutable.Set.empty[(Long, Long)]
    Debezium.apply(t, wave($"doc_id" % 2 === 0))
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$root/docs").load()
      .select("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          collected ++= inc.dedupBatch(batch, "doc_id", "text", id + 1)
            .select("doc_a", "doc_b").as[(Long, Long)].collect()
          ()
        }
      }
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable()
      Debezium.apply(t, wave($"doc_id" % 2 === 1))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
    } finally q.stop()
    // union of per-batch outputs == the batch operator over the final
    // snapshot (IncrementalDedup's equivalence contract, via CDC+stream)
    val batchAnswer = Dedup.minhashLsh(t.read().select("doc_id", "text"),
        "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(collected.toSet == batchAnswer && batchAnswer.nonEmpty)
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
