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

  test("incremental dedup equals batch with clustering + pruned scans") {
    import graft.operators.{Dedup, IncrementalDedup}
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val inc = new IncrementalDedup(spark, tmp("graft-r7-incd-"))
    val outs = (0 until 3).map { i =>
      val out = inc.dedupBatch(docs.filter(col("doc_id") % 3 === i),
        "doc_id", "text", i + 1L)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // tiny target forces a multi-file bsig layout per band — the
      // shape the stats prune needs; correctness must be unaffected
      inc.compactStores(targetFileBytes = 64 * 1024)
      out
    }
    val batch = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(outs.reduce(_ ++ _) == batch)

    // the band-index scan must actually SKIP files: a single-bsig probe
    // against the clustered index touches fewer files than a full read
    val total = inc.bandIndex.read().inputFiles.length
    val oneSig = inc.bandIndex.readWhereIn("bsig", Nil,
      Some(Map("0" -> Seq("0")))).inputFiles.length
    assert(total > 2, s"expected a multi-file index, got $total files")
    assert(oneSig < total,
      s"bsig point probe read $oneSig of $total files — no skipping")
    // same for the id-clustered hash store
    val hTotal = inc.hashStore.read().inputFiles.length
    val hOne = inc.hashStore.readWhereIn("id", Seq("1")).inputFiles.length
    assert(hTotal > 1 && hOne < hTotal,
      s"id point probe read $hOne of $hTotal hash-store files — no skipping")
  }

  test("incremental dedup publish is idempotent and crash-recoverable") {
    import graft.functions.TextFunctions._
    import graft.operators.{Dedup, IncrementalDedup}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = (i: Int) => docs.filter(col("doc_id") % 3 === i)
    val inc = new IncrementalDedup(spark, tmp("graft-r7-incd2-"))
    val out1 = inc.dedupBatch(b(0), "doc_id", "text", 1L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val out2 = inc.dedupBatch(b(1), "doc_id", "text", 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // full re-run of the LATEST batch (recovery): same pairs, and the
    // stores must NOT double-insert
    val hRows = inc.hashStore.read().count()
    val bRows = inc.bandIndex.read().count()
    val out2Again = inc.dedupBatch(b(1), "doc_id", "text", 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out2Again == out2)
    assert(inc.hashStore.read().count() == hRows)
    assert(inc.bandIndex.read().count() == bRows)
    // an out-of-order batch number is rejected loudly
    val e = intercept[IllegalArgumentException] {
      inc.dedupBatch(b(0), "doc_id", "text", 1L)
    }
    assert(e.getMessage.contains("monotone"))
    // crash between the two commits: bands of batch 3 land, hashes do
    // not (replicated via the store's own wire format), then the batch
    // re-runs — it must repair (hashes inserted, bands not doubled) and
    // the union must still equal the batch operator
    val sigs3 = b(2).select(col("doc_id").as("id"),
        shingleHashes(col("text"), 5).as("hashes"))
      .withColumn("sig", minhashSignature(col("hashes"), 128))
      .withColumn("band", explode(lshBands(col("sig"), 32, 4)))
      .select(col("id"), col("band.band").as("band"), col("band.sig").as("bsig"))
      .withColumn("_b", lit(3L))
    inc.bandIndex.bulkInsert(sigs3)
    val bandRowsAfterCrash = inc.bandIndex.read().count()
    val out3 = inc.dedupBatch(b(2), "doc_id", "text", 3L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(inc.bandIndex.read().count() == bandRowsAfterCrash) // no re-insert
    assert(inc.hashStore.read().select("id").distinct().count()
      == docs.count()) // repaired: every doc's hashes present exactly once
    val batch = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert((out1 ++ out2 ++ out3) == batch)
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
