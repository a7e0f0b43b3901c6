package graft

import graft.ingest.OrcDirSource
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-6 surface additions: analytic windows (q19), keep-best
  * canonical dedup (p23), ORC interchange (l15 + OrcDirSource). */
class Round6SurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    graft.util.TempDirs.create(prefix).toString

  // ---- q19 analytic windows ------------------------------------------

  test("q19: lag/lead/rank/running-sum agree with a hand-computed fixture") {
    val orders = Seq(
      // custkey, orderkey, totalprice, orderdate
      (1L, 10L, 100.0, "2020-01-01"),
      (1L, 11L, 300.0, "2020-02-01"),
      (1L, 12L, 200.0, "2020-03-01"),
      (2L, 20L, 50.0, "2020-01-15"))
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1")) // schema parity filler
    val dir = tmp("graft-q19-")
    orders.write.parquet(s"$dir/orders.parquet")
    val out = Queries.q19WindowAnalytics(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(4)), r.getLong(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      (1L, 10L, 100.0, None, Some(300.0), 3L, 100.0),
      (1L, 11L, 300.0, Some(100.0), Some(200.0), 1L, 400.0),
      (1L, 12L, 200.0, Some(300.0), None, 2L, 600.0),
      (2L, 20L, 50.0, None, None, 1L, 50.0)))
  }

  test("q19: one exchange feeds both window sorts") {
    val plan = Queries.q19WindowAnalytics(spark, sf)
      .queryExecution.executedPlan.toString
    // hash exchange on o_custkey appears once (both windows reuse it);
    // the only other exchange is the final presentation orderBy's range
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  // ---- p23 keep-best canonical dedup ---------------------------------

  test("keepBest keeps the longest doc per cluster, singletons intact") {
    // docs 1-2-3 form one near-dup cluster (shared shingles), 9 is alone
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$base one"),
      (2L, s"$base one two three"), // longest → keeper
      (3L, s"$base one two"),
      (9L, "completely different words nothing shared here at all today ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", k = 5,
      threshold = 0.5)
    val out = Dedup.keepBest(docs, "doc_id", "text", pairs)
      .orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 13L, 3L), // cluster 1: keep doc 2 (13 tokens), 3 members
      (9L, 9L, 10L, 1L))) // singleton keeps itself
  }

  test("keepBest ties go to the smallest doc id") {
    val base = "one two three four five six seven eight nine ten"
    val docs = Seq((5L, s"$base x"), (7L, s"$base x")) // identical length
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", k = 5,
      threshold = 0.5)
    val out = Dedup.keepBest(docs, "doc_id", "text", pairs).collect()
    assert(out.length == 1 && out(0).getLong(1) == 5L)
  }

  test("keepBest invariants on the real corpus: partition + representativeness") {
    val docs = Tables.load(spark, sf, "documents")
    val out = graft.PipelineQueries.dKeepBest(spark, sf).cache()
    // clusters partition the corpus: member counts sum to corpus size
    assert(out.agg(sum("n_members")).head.getLong(0) == docs.count())
    // every keeper's token count is the max over its cluster — join the
    // keepers back to the scored+labeled docs and look for violations
    val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
      k = 5, threshold = 0.7)
    val clusters = graft.operators.Dedup.connectedComponents(pairs)
    val labeled = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val violations = labeled.join(out, Seq("cluster_id"))
      .filter(col("n_tokens") > col("keep_tokens"))
      .count()
    assert(violations == 0L)
    out.unpersist()
  }

  test("repetition metrics: bounds and exact values on a fixture") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "a a a a"),         // top word = 4/4, bigrams: [a a]×3 → dup 2/3
      (2L, "a b c d"),         // top 1/4, all bigrams distinct → dup 0
      (3L, "x"))               // single word: top 1/1, bigram list = [x]
      .toDF("doc_id", "text")
    val m = TextFunctions.repetitionMetrics(col("text"))
    val out = docs.select(col("doc_id") +: m.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out(0) == ((1L, 1.0, 1.0 - 1.0 / 3.0)))
    assert(out(1) == ((2L, 0.25, 0.0)))
    assert(out(2) == ((3L, 1.0, 0.0)))
    // bounds on the real corpus: both ratios in [0, 1]
    val bad = Tables.load(spark, sf, "documents")
      .select(m.map { case (n, c) => c.as(n) }: _*)
      .filter(col("top_word_ratio") < 0 || col("top_word_ratio") > 1 ||
        col("dup_bigram_ratio") < 0 || col("dup_bigram_ratio") > 1)
      .count()
    assert(bad == 0L)
  }

  test("pivot matches conditional aggregation on a fixture") {
    val orders = Seq(
      ("1-URGENT", "F"), ("1-URGENT", "F"), ("1-URGENT", "O"),
      ("2-HIGH", "P"))
      .toDF("o_orderpriority", "o_orderstatus")
    val dir = tmp("graft-q21-")
    orders.write.parquet(s"$dir/orders.parquet")
    val out = Queries.q21Pivot(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("1-URGENT", 2L, 1L, 0L),
      ("2-HIGH", 0L, 0L, 1L)))
  }

  // ---- approximate aggregates (the 100 TB cardinality staples) --------

  test("approx_count_distinct lands within its error bound of exact") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val (approx, exact) = ev.agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .as[(Long, Long)].head()
    // rsd 0.02 → allow 3 sigma
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"approx=$approx exact=$exact")
  }

  test("approx percentile brackets the exact median") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val apx = ev.agg(percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // exact p45/p55 must bracket an approximation this accurate
    val Array(lo, hi) = ev.stat.approxQuantile("value", Array(0.45, 0.55), 0.0)
    assert(apx >= lo && apx <= hi, s"median approx $apx outside [$lo, $hi]")
  }

  // ---- incremental dedup ----------------------------------------------

  test("incremental dedup over three batches equals the batch operator") {
    import graft.operators.{Dedup, IncrementalDedup}
    val docs = Tables.load(spark, sf, "documents")
    val inc = new IncrementalDedup(spark, tmp("graft-incdedup-"))
    val incPairs = (0 to 2).map { i =>
        val p = inc.dedupBatch(docs.filter(col("doc_id") % 3 === i),
          "doc_id", "text", batchNo = i + 1L)
        // periodic store maintenance between batches must never change
        // results (clustering is layout, not semantics)
        if (i == 1) inc.compactStores()
        p
      }.reduce(_ unionByName _).cache()
    val batchPairs = Dedup.minhashLsh(docs, "doc_id", "text",
      k = 5, threshold = 0.7).cache()
    // exact set equality, jaccard values included (identical arithmetic
    // on identical hash arrays → identical doubles)
    assert(incPairs.count() == batchPairs.count())
    assert(incPairs.exceptAll(batchPairs).count() == 0)
    assert(batchPairs.exceptAll(incPairs).count() == 0)
    // the stores accumulated the whole corpus
    assert(inc.hashStore.read().count() == docs.count())
    incPairs.unpersist(); batchPairs.unpersist()
  }

  test("incremental dedup catches cross-batch and in-batch pairs") {
    import graft.operators.IncrementalDedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val inc = new IncrementalDedup(spark, tmp("graft-incdedup2-"))
    // batch 1: two near-dups of each other
    val b1 = Seq((1L, s"$base one"), (2L, s"$base one two"))
      .toDF("doc_id", "text")
    // batch 2: one near-dup of batch 1, one unrelated doc
    val b2 = Seq((3L, s"$base one three"),
      (9L, "totally different content with no shared shingles here at all"))
      .toDF("doc_id", "text")
    val p1 = inc.dedupBatch(b1, "doc_id", "text", 1L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 2L))) // in-batch pair
    val p2 = inc.dedupBatch(b2, "doc_id", "text", 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p2 == Set((1L, 3L), (2L, 3L))) // cross-batch pairs only
  }

  // ---- l15 ORC interchange -------------------------------------------

  test("ORC round trip preserves lineitem aggregates exactly") {
    val viaParquet = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"),
        sum("l_quantity").as("s"))
      .orderBy("l_returnflag").collect().toSeq
    val dir = tmp("graft-orc-")
    Tables.load(spark, sf, "lineitem").write.mode("overwrite").orc(dir)
    val viaOrc = spark.read.orc(dir)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"),
        sum("l_quantity").as("s"))
      .orderBy("l_returnflag").collect().toSeq
    assert(viaOrc == viaParquet)
  }

  /** Write one .orc file into `dst` (staging keeps _SUCCESS markers and
    * CRCs out of the watched directory — arrivals are bare data files,
    * the way a connector drops them). */
  private def dropOrcFile(rows: Seq[(Long, String)], dst: String): Unit = {
    val staging = tmp("graft-orcstage-")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").orc(staging)
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(staging)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".orc")).foreach { p =>
        Files.copy(p, java.nio.file.Paths.get(dst).resolve(p.getFileName))
      }
  }

  test("OrcDirSource streams micro-batches incrementally with checkpoint") {
    val srcDir = tmp("graft-orcsrc-")
    val ckpt = s"${tmp("graft-orcsrc-ck-")}/checkpoint"
    val src = new OrcDirSource(spark, srcDir, ckpt)

    // empty dir → no batch
    assert(src.next()._1.isEmpty)

    dropOrcFile(Seq((1L, "a"), (2L, "b")), srcDir)
    val (b1, tok1) = src.next()
    assert(b1.get.count() == 2)
    src.commitCheckpoint(tok1)

    // no new files → no batch
    assert(src.next()._1.isEmpty)

    dropOrcFile(Seq((3L, "c")), srcDir)
    val (b2, _) = src.next()
    assert(b2.get.select("id").as[Long].collect().toSet == Set(3L))
  }
}
