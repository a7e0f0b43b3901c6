package graft.streaming

import graft.Session
import graft.functions.{GraftExpressions, TextFunctions}
import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Stream-native curation: the map-only members of the curation
  * family (lang-id, quality metrics, token counting, Bloom
  * decontamination, deterministic sampling) are all stateless
  * per-row expressions, so the SAME operator code runs unchanged
  * under Structured Streaming — micro-batch outputs union to exactly
  * the batch pipeline's answer. This is the ingest-time deployment
  * shape: filter-at-the-edge before anything corpus-wide (dedup,
  * selection) runs downstream on the curated table. */
class StreamingCurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def tmp(): String = graft.util.TempDirs.create("graft-cur-").toString

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeJson(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes("UTF-8"))

  private def evalSet = {
    import spark.implicits._
    Seq((900L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
  }

  /** The pipeline under test, applied identically to a batch or
    * streaming frame: per-row quality/lang/token expressions, a
    * deterministic md5 sample, and the Bloom contamination probe. */
  private def curate(docs: DataFrame): DataFrame = {
    val quality = TextFunctions.qualityMetrics(col("text"))
      .filter { case (n, _) => n == "stopword_ratio" }
    val scored = docs
      .withColumn("lang", GraftExpressions.lang_id(col("text")))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("stopword_ratio", quality.head._2)
    Curation.bloomDecontaminate(
      Curation.deterministicSample(scored, "doc_id", 0.9),
      evalSet, "doc_id", "text", k = 5, fpp = 1e-6)
  }

  test("streaming curation equals the batch pipeline on identical rows") {
    val in = tmp()
    val docs = Seq(
      """{"doc_id":1,"text":"the cat sat on the mat and then it slept"}""",
      """{"doc_id":2,"text":"contaminated copy the quick brown fox jumps over the lazy dog here"}""",
      """{"doc_id":3,"text":"spark streams compose with curation expressions"}""",
      """{"doc_id":4,"text":"a dog and a cat share the house by the sea"}""")
    writeJson(in, "b1.json", docs.take(2): _*)
    writeJson(in, "b2.json", docs.drop(2): _*)

    val stream = curate(spark.readStream.schema(schema).json(in))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("cur_out").start()
    val streamed =
      try { q.processAllAvailable(); spark.table("cur_out").collect() }
      finally q.stop()

    val batch = curate(spark.read.schema(schema).json(in)).collect()

    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Int]("n_tokens"), r.getAs[Double]("stopword_ratio"))).toSet
    assert(key(streamed) == key(batch))
    // and the pipeline did real work: doc 2 (contaminated) is gone,
    // the survivors carry their curation columns
    val ids = streamed.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids(2L) && ids(1L))
  }

  test("curation columns stay inside one streaming micro-batch projection (no stateful ops)") {
    val in = tmp()
    writeJson(in, "b1.json", """{"doc_id":1,"text":"a tiny doc"}""")
    val stream = curate(spark.readStream.schema(schema).json(in))
    // a stateful/aggregating plan would reject append mode without
    // watermark at ANALYSIS time; starting cleanly proves the whole
    // pipeline is stateless per-row work
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("cur_stateless").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("cur_stateless").count() >= 0L)
  }

  test("gopherRules runs unchanged under streaming (map-only decision " +
      "surface) and equals the batch verdicts") {
    val in = tmp()
    writeJson(in, "b1.json",
      s"""{"doc_id":1,"text":"${("the of and " * 20).trim}"}""",
      """{"doc_id":2,"text":"too short"}""")
    writeJson(in, "b2.json",
      s"""{"doc_id":3,"text":"${("# ## " * 40).trim}"}""")
    def rules(df: DataFrame) = Curation.gopherRules(df, "doc_id", "text")
    val q = rules(spark.readStream.schema(schema).json(in))
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_stream").start()
    val streamed =
      try { q.processAllAvailable(); spark.table("gopher_stream").collect() }
      finally q.stop()
    val batch = rules(spark.read.schema(schema).json(in)).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.toSeq).toSet
    assert(streamed.length == 3 && key(streamed) == key(batch))
  }

  test("unigram encode runs unchanged under streaming with a FROZEN " +
      "vocabulary, broadcast reused across epochs") {
    import graft.operators.Unigram
    val in = tmp()
    writeJson(in, "b1.json",
      """{"doc_id":1,"text":"the cat sat on the mat"}""",
      """{"doc_id":2,"text":"a dog and a cat by the sea"}""")
    writeJson(in, "b2.json",
      """{"doc_id":3,"text":"streams of cats and dogs compose"}""",
      // a char the frozen vocab never saw (digits-only "words" vanish
      // under [a-z]+; 'zqxj' letters DO appear in no training doc) —
      // those words must be EXCLUDED, not crash the stream
      """{"doc_id":4,"text":"zqxj zqxj the cat"}""",
      """{"doc_id":5,"text":"123 456"}""")
    val trainCorpus = spark.read.schema(schema).json(s"$in/b1.json")
    val learned = Unigram.learn(trainCorpus, "text", vocabSize = 32,
      emRounds = 1).cache()
    learned.count()
    def enc(df: DataFrame) =
      Unigram.encodeStatsFrozen(df, "doc_id", "text", learned)
    // maxFilesPerTrigger=1 forces TWO epochs — the broadcast must
    // survive past epoch 1 (the encodeStats eager-destroy pattern
    // would kill it)
    val q = enc(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(in))
      .writeStream.outputMode("append")
      .format("memory").queryName("unigram_stream").start()
    val streamed =
      try { q.processAllAvailable(); spark.table("unigram_stream").collect() }
      finally q.stop()
    val batch = enc(spark.read.schema(schema).json(in)).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(_.toSeq).toSet
    assert(key(streamed) == key(batch),
      "micro-batch union must equal the batch answer")
    val byId = streamed.map(r => r.getLong(0) -> r.toSeq).toMap
    // doc 4: the OOV-letter words are excluded, the known words count
    assert(byId(4L)(1) == 2L, s"doc 4 must count only known words: ${byId(4L)}")
    // doc 5 has no countable word — omitted entirely
    assert(!byId.contains(5L))
    // and the frozen apply matches the self-learned batch path where
    // they are defined to agree: segmentABILITY (n_words) is cost-
    // independent, so per-doc word counts line up with encodeStats
    // over the training corpus
    val selfLearned = Unigram.encodeStats(trainCorpus, "doc_id", "text",
        topK = 32).select("doc_id", "n_words")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    val frozenTrain = enc(trainCorpus).select("doc_id", "n_words")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    assert(frozenTrain == selfLearned)
    learned.unpersist()
    ()
  }
}
