package graft

import graft.core.{TableConfig, TableServices, Validation}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's repeated-round DAG soak
  * (hudi-spark-minio-trino/demo/config/test-suite/complex-dag-mor.yaml:16-84
  * — insert×3 → hive-sync → validate → upsert → schedule-compact →
  * delete → hive-sync → validate; `dag_rounds: 6` in
  * multi-writer-1-ds.yaml:17) as one ScalaTest loop over the engine's
  * own DSL, run ≥ 3 rounds on BOTH table types.
  *
  * The test driver mirrors every node into an expected-state map
  * (latest-wins by ordering field, deletes removed), and after the
  * sync of each validate node asserts the ValidateDatasetNode
  * invariants: content equality against the accumulated input, key
  * uniqueness (A3), exact row count, and the SQL views serving the
  * same snapshot. The orderings are deliberately adversarial the way
  * the async suite is: the compaction PLAN is scheduled before the
  * round's delete and executed after it, so tombstones that land
  * post-schedule must stay live through the plan-scoped fold
  * (TableServices.runCompaction's contract).
  */
class DagSoakSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-dagsoak-$tag-").toString

  private def runDag(tableType: String, rounds: Int): Unit = {
    val catalog = new graft.sql.GraftCatalog(spark, tmp(tableType))
    val name = s"dagsoak_$tableType"
    val t = catalog.createTable(TableConfig(name = name, keyField = "k",
      orderingField = "ts", tableType = tableType, numBuckets = 2))
    // the ValidateDatasetNode's accumulated expected input:
    // k -> (ts, v), latest-wins on ts — exactly the upsert contract
    var expected = Map.empty[Long, (Long, Double)]
    var ts = 0L
    def df(rows: Seq[(Long, Long, Double)]) = rows.toDF("k", "ts", "v")
    def fold(rows: Seq[(Long, Long, Double)]): Unit = rows.foreach {
      case (k, t2, v) =>
        if (!expected.get(k).exists(_._1 > t2)) expected += k -> ((t2, v))
    }
    def validate(round: Int, stage: String): Unit = {
      val exp = df(expected.toSeq.map { case (k, (t2, v)) => (k, t2, v) })
      assert(Validation.validateAgainstInput(t, exp),
        s"round $round/$stage: snapshot diverged from accumulated input")
      assert(Validation.duplicateKeys(t).isEmpty,
        s"round $round/$stage: duplicate keys in snapshot")
      assert(t.read().count() == expected.size,
        s"round $round/$stage: row count")
      // hive-sync node: the registered views serve the same snapshot
      catalog.syncViews()
      assert(spark.sql(s"SELECT count(*) FROM $name")
        .as[Long].head() == expected.size,
        s"round $round/$stage: bare view count")
      if (t.config.isMor)
        assert(spark.sql(s"SELECT count(*) FROM ${name}_rt")
          .as[Long].head() == expected.size,
          s"round $round/$stage: _rt view count")
    }
    (1 to rounds).foreach { r =>
      val base = r * 100000L
      // insert×3 (100 / 1000 / 300 rows — the yaml's node sizes)
      Seq(100, 1000, 300).zipWithIndex.foreach { case (n, i) =>
        ts += 1
        val rows = (0 until n).map(j =>
          (base + i * 10000L + j, ts, (i * 10000L + j) * 1.0))
        t.insert(df(rows))
        fold(rows)
      }
      validate(r, "first_validate")
      // upsert 100 keys — half churned from PREVIOUS rounds when they
      // exist (cross-round rewrites are where COW merge and MOR delta
      // routing historically break), half from this round
      ts += 1
      val prior = expected.keys.filter(_ < base).toSeq.sorted.take(50)
      val fresh = expected.keys.filter(_ >= base).toSeq.sorted
        .take(100 - prior.size)
      val ups = (prior ++ fresh).map(k => (k, ts, -k * 1.0))
      t.upsert(df(ups))
      fold(ups)
      // schedule-compact BEFORE the delete, execute AFTER it (the
      // async-suite interleaving): post-schedule tombstones must
      // survive the plan-scoped fold
      val plan = TableServices.scheduleCompaction(t)
      // MOR upserts appended deltas → a plan parks; COW rewrote in
      // place → nothing to schedule
      assert(plan.nonEmpty == t.config.isMor,
        s"round $r: compaction plan presence must track table type")
      ts += 1
      val dels = expected.keys.toSeq.sorted.take(500)
      t.deleteWhere(col("k").isin(dels: _*))
      expected --= dels
      plan.foreach(i => TableServices.runCompaction(t, i))
      validate(r, "second_validate")
    }
    // after the soak the table keeps working: one more write round-trips
    ts += 1
    t.upsert(df(Seq((999999L, ts, 9.9))))
    fold(Seq((999999L, ts, 9.9)))
    validate(rounds + 1, "post_soak")
  }

  test("complex DAG soak, 3 rounds, COW: invariants hold every round") {
    runDag(TableConfig.Cow, rounds = 3)
  }

  test("complex DAG soak, 3 rounds, MOR: invariants hold every round " +
      "with the plan-scoped compaction interleaved across the delete") {
    runDag(TableConfig.Mor, rounds = 3)
  }
}
