package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 surface: fixture-generation resilience.
  *
  * The driver re-provisioned the events fixture mid-run with
  * `ts: TIMESTAMP(MICROS)` where earlier generations carried
  * TIMESTAMP(NANOS) (surfaced as epoch-nanos LongType via
  * `nanosAsLong`). Every ts-arithmetic query assumes epoch-nanos long;
  * [[Tables.normalizeTs]] makes both generations identical at load.
  */
class Round10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  test("normalizeTs yields identical frames for micros-timestamp and nanos-long fixtures") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-tsnorm-").toString
    // same three instants written both ways
    val micros = Seq(0L, 1_700_000_000_123_456L, 1_800_000_000_000_001L)
    Seq(micros.map(u => (1L, u)))
      .flatMap(identity)
      .toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$dir/as_timestamp")
    micros.map(u => (1L, u * 1000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/as_long")

    val a = Tables.normalizeTs(spark.read.parquet(s"$dir/as_timestamp"))
    val b = Tables.normalizeTs(spark.read.parquet(s"$dir/as_long"))
    assert(a.schema("ts").dataType == LongType)
    assert(b.schema("ts").dataType == LongType)
    assert(a.select("ts").as[Long].collect().sorted.toSeq ==
      b.select("ts").as[Long].collect().sorted.toSeq)
    assert(a.select("ts").as[Long].collect().sorted.toSeq ==
      micros.map(_ * 1000L).sorted)
  }

  test("inline compaction fires exactly at the delta-commit threshold") {
    import graft.core.{GraftTable, TableConfig, TableServices}
    val root = graft.util.TempDirs.create("graft-inline-").toString
    val t = GraftTable.create(spark, root, TableConfig(
      name = "ic", keyField = "k", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 2))
    import spark.implicits._
    t.insert(Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("k", "ts", "v"))
    assert(TableServices.deltaCommitsSinceCompaction(t) == 0) // base files only
    t.upsert(Seq(("a", 2L, 1.5)).toDF("k", "ts", "v"))
    assert(TableServices.compactInline(t, maxDeltaCommits = 2).isEmpty,
      "fired below the threshold")
    t.upsert(Seq(("b", 2L, 2.5)).toDF("k", "ts", "v"))
    assert(TableServices.compactInline(t, maxDeltaCommits = 2).nonEmpty,
      "did not fire at the threshold")
    assert(TableServices.deltaCommitsSinceCompaction(t) == 0)
    // post-compaction convergence: read-optimized == realtime
    val ro = t.readOptimized().select("k", "ts", "v")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val rt = t.readRealtime().select("k", "ts", "v")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(ro == rt && ro == Seq(("a", 2L, 1.5), ("b", 2L, 2.5)))
    // one fresh delta after the compaction: below threshold again
    t.upsert(Seq(("a", 3L, 1.7)).toDF("k", "ts", "v"))
    assert(TableServices.compactInline(t, maxDeltaCommits = 2).isEmpty)
  }

  test("scheduled compaction: plan parks on the timeline, run executes exactly it") {
    import graft.core.{GraftTable, TableConfig, TableServices}
    import spark.implicits._
    val root = graft.util.TempDirs.create("graft-sched-").toString
    val t = GraftTable.create(spark, root, TableConfig(
      name = "sc", keyField = "k", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 2))
    t.insert(Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("k", "ts", "v"))
    t.upsert(Seq(("a", 2L, 1.5)).toDF("k", "ts", "v"))
    val req = TableServices.scheduleCompaction(t)
    assert(req.nonEmpty)
    // the request is timeline-neutral: realtime read unchanged, and a
    // delta landing AFTER the schedule is outside the plan
    t.upsert(Seq(("b", 2L, 2.9)).toDF("k", "ts", "v"))
    val exec = TableServices.runCompaction(t, req.get)
    // post-schedule delta survives the planned fold and still wins
    val rt = t.readRealtime().select("k", "ts", "v")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rt == Seq(("a", 2L, 1.5), ("b", 2L, 2.9)))
    // idempotent: re-running the same plan returns the same instant
    assert(TableServices.runCompaction(t, req.get) == exec)
    // unknown instant is an actionable error
    val e = intercept[IllegalArgumentException] {
      TableServices.runCompaction(t, "0000000000")
    }
    assert(e.getMessage.contains("no compaction request"))
  }

  test("round-10 aggregate gates shuffle once, with map-side partial aggregation") {
    val dir = "/root/testdata/sf0.001"
    for ((name, df) <- Seq(
        "q23_percentiles" -> Queries.q23Percentiles(spark, dir),
        "q24_corr_moments" -> Queries.q24CorrMoments(spark, dir),
        "q26_json_extract" -> Queries.q26JsonExtract(spark, dir))) {
      val plan = df.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n == 1, s"$name: expected exactly 1 hash exchange, got $n\n$plan")
      assert(plan.contains("partial"),
        s"$name: no map-side partial aggregation before the shuffle\n$plan")
    }
  }

  test("q26 scan reads only the two referenced columns") {
    // the ts-normalization projection must not defeat column pruning:
    // a JSON-extract aggregate over (event_type, props) should leave
    // ts (and everything else) out of the parquet ReadSchema.
    val plan = Queries.q26JsonExtract(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("struct<event_type:string,props:string>"),
      s"scan not pruned to (event_type, props):\n$plan")
  }

  test("approx_count_distinct tracks exact distinct within its rsd bound") {
    // the HLL++ sketch is the 100 TB path for q7-style distincts:
    // fixed memory, mergeable across partitions, one pass. Gate its
    // accuracy contract against the exact answer on real data.
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val exact = ev.select(countDistinct(col("user_id"))).first().getLong(0)
    val rsd = 0.02
    val approx = ev.select(approx_count_distinct(col("user_id"), rsd))
      .first().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 3 * rsd, s"HLL rel err $relErr > ${3 * rsd} (exact=$exact approx=$approx)")
  }

  test("approx_percentile lands within the exact inter-quantile neighborhood") {
    // the sketch twin of q23's exact percentile: rank error ≤ 1/accuracy.
    // With accuracy 10000 on 600k rows the rank slack is ±60 rows ≈
    // ±0.0001 quantile — assert the approx median sits between the
    // exact 49.9% and 50.1% points (a 10× looser band than the bound).
    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val r = li.select(
      expr("percentile(l_extendedprice, 0.499)").as("lo"),
      expr("percentile(l_extendedprice, 0.501)").as("hi"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"))
      .first()
    val (lo, hi, ap) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(ap >= lo && ap <= hi, s"approx median $ap outside [$lo, $hi]")
  }

  test("Tables.load surfaces events.ts as epoch-nanos long on the current fixture") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == LongType)
    // sanity: values are nanos-scale (year-2000+ instants are >= 9.4e17)
    val sample = ev.select(min(col("ts")), max(col("ts"))).head()
    assert(sample.getLong(0) > 900_000_000_000_000_000L,
      s"ts min ${sample.getLong(0)} is not epoch-nanos scale")
  }
}
