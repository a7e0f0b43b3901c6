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
