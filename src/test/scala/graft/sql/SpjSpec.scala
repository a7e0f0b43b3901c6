package graft.sql

import graft.Session
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned join: two co-bucketed graft tables joined with
  * zero shuffle exchanges (the scan reports KeyGroupedPartitioning,
  * the catalog serves the bucket function, Spark zips file groups).
  */
class SpjSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = Session.local(4)

  private def freshCat(): (String, String) = {
    val wh = graft.util.TempDirs.create("graft-spj-wh-").toString
    val cat = s"gcat_spj_${SpjSpec.seq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "user_id", orderingField = "ts",
    partitionField = Some("event_type"), tableType = TableConfig.Mor,
    numBuckets = 4)

  private def rows(n: Int, mul: Double): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong % 40, s"et${i % 3}", i.toLong * 1000, i * mul, i.toLong)
    }.toDF("user_id", "event_type", "ts", "value", "event_id")
  }

  /** Build a MOR table with live deltas under the warehouse. */
  private def mk(wh: String, name: String, df: DataFrame): GraftTable = {
    val t = GraftTable.create(spark, s"$wh/$name", cfg(name))
    t.insert(df.filter(col("event_id") % 2 === 0))
    t.upsert(df.filter(col("event_id") % 2 === 1))
    assert(t.log.liveFiles().exists(_.delta), "needs live deltas")
    t
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }.size
  }

  test("co-bucketed MOR join plans zero shuffle exchanges and matches") {
    val (cat, wh) = freshCat()
    mk(wh, "a", rows(200, 1.0))
    mk(wh, "b", rows(200, 2.0))
    val joined = spark.sql(
      s"""SELECT a.event_type, a.user_id, a.value + b.value AS v
         |FROM $cat.a a JOIN $cat.b b
         |  ON a.event_type = b.event_type AND a.user_id = b.user_id""".stripMargin)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(shuffles(joined) == 0, "SPJ join must not shuffle either side")
    }
    // correctness vs the API-level merged views joined the naive way
    val a = GraftTable.load(spark, s"$wh/a").readRealtime()
    val b = GraftTable.load(spark, s"$wh/b").readRealtime()
    val expect = a.as("a").join(b.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.user_id") === col("b.user_id"))
      .select(col("a.event_type"), col("a.user_id"),
        (col("a.value") + col("b.value")).as("v"))
    assert(joined.collect().toSet == expect.collect().toSet)
    assert(joined.count() == a.count()) // keys unique per (et, user): 1:1 join
  }

  test("groupScan conf: COW tables join shuffle-free too") {
    val (cat, wh) = freshCat()
    def mkCow(name: String, mul: Double): Unit = {
      val t = GraftTable.create(spark, s"$wh/$name",
        cfg(name).copy(tableType = TableConfig.Cow))
      t.insert(rows(200, mul)) // insert-only: no deltas ever
    }
    mkCow("ca", 1.0); mkCow("cb", 2.0)
    val sql =
      s"""SELECT a.event_type, a.user_id, a.value + b.value AS v
         |FROM $cat.ca a JOIN $cat.cb b
         |  ON a.event_type = b.event_type AND a.user_id = b.user_id""".stripMargin
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.read.groupScan" -> "true") {
      assert(shuffles(spark.sql(sql)) == 0,
        "COW group-scan join must not shuffle")
    }
    // conf off: parquet path (exchanges return), same answer
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = spark.sql(sql)
      assert(shuffles(plain) > 0)
      val grouped = withSQLConf("spark.graft.read.groupScan" -> "true") {
        spark.sql(sql).collect().toSet
      }
      assert(plain.collect().toSet == grouped)
    }
  }

  test("bucket function matches the write path's routing hash") {
    import spark.implicits._
    val n = 8
    val viaWritePath = spark.range(1000)
      .select(col("id"), pmod(xxhash64(col("id")), lit(n)).cast("int").as("b"))
      .as[(Long, Int)].collect()
    val bound = GraftBucketFunction.bind(org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    viaWritePath.foreach { case (k, b) =>
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, k))
      assert(bound.produceResult(row) == b, s"key $k")
    }
  }

  test("pruning the clustering columns degrades gracefully (no SPJ, still correct)") {
    val (cat, wh) = freshCat()
    mk(wh, "c", rows(100, 1.0))
    // count(*) prunes user_id/event_type out of the scan output: the
    // scan must fall back to UnknownPartitioning, not fail resolution
    // 100 ids: (i%40, i%3) is injective below lcm(40,3)=120 → 100 keys
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.c").collect()
      .head.getLong(0) == 100)
    // and a bare aggregate over one side still answers
    assert(spark.sql(s"SELECT sum(value) FROM $cat.c").collect().nonEmpty)
  }

  /** Minimal withSQLConf (test-only): set, run, restore. */
  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

object SpjSpec {
  val seq = new java.util.concurrent.atomic.AtomicInteger(0)
}
