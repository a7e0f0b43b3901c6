package graft

import graft.core.{GraftTable, TableConfig}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 guard/robustness cases: LSH bucket-size cap, streaming-path
  * MOR delta guards, stream-provider option validation. */
class Round7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(prefix: String): String =
    graft.util.TempDirs.create(prefix).toString

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("LSH bucket over maxBucketSize fails with an actionable error") {
    // five near-identical docs share every band signature → bucket of 5
    val docs = (1 to 5)
      .map(i => (i.toLong, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    withConf("spark.graft.lsh.maxBucketSize", "3") {
      val e = intercept[Exception] {
        Dedup.minhashLsh(docs, "doc_id", "text").collect()
      }
      val msg = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msg.contains("maxBucketSize"))
      assert(msg.contains("Dedup.exact"))
    }
    // under the cap the same corpus dedups fine (all 10 pairs verified)
    assert(Dedup.minhashLsh(docs, "doc_id", "text").count() == 10L)
  }

  test("chunked bucket expansion emits the exact pair set") {
    // mixed bucket sizes: 3 identical + 2 identical + 1 unique doc
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight nine"),
      (5L, "one two three four five six seven eight nine"),
      (6L, "completely different words with no overlap at all whatsoever"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("streaming MOR read honors the delta-bytes guard conf") {
    val root = tmp("graft-r7-sguard-")
    val t = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "sguard", keyField = "k", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 1))
    t.insert(Seq(("a", 1L, 10.0)).toDF("k", "ts", "v"))
    t.upsert(Seq(("a", 2L, 11.0)).toDF("k", "ts", "v")) // delta file
    require(t.log.liveFiles().exists(_.delta))
    withConf("spark.graft.mor.maxDeltaBytesPerGroup", "1") {
      val q = spark.readStream.format("graft-stream")
        .option("path", s"$root/t").load()
        .writeStream.format("memory").queryName("sguard_out").start()
      try {
        val e = intercept[Exception] { q.processAllAvailable() }
        val msg = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
        assert(msg.contains("maxDeltaBytesPerGroup"))
        assert(msg.contains("compact"))
      } finally q.stop()
    }
  }

  test("stream provider resolves the path option case-insensitively") {
    // inferSchema always read via CaseInsensitiveStringMap, but getTable
    // used properties.get("path") raw — .option("PATH", ...) built a
    // graft_stream(null) table. Both must resolve the same way.
    val root = tmp("graft-r7-cis-")
    val t = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "cis", keyField = "k", orderingField = "ts", numBuckets = 1))
    t.insert(Seq(("a", 1L, 10.0)).toDF("k", "ts", "v"))
    val q = spark.readStream.format("graft-stream")
      .option("PATH", s"$root/t").load()
      .writeStream.format("memory").queryName("cis_out").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select k from cis_out").as[String].collect().toSeq
        == Seq("a"))
    } finally q.stop()
  }

  test("stream provider without a path fails with the actionable require") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-stream").load()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg.contains("option(\"path\""))
  }
}
