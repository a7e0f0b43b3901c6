package graft.core

import graft.Session
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Row fixture for the property workloads (top level — Spark encoders
  * can't reach class-nested case classes). */
case class R(key: String, ts: Long, p: String, v: Long)

/** The invariants from SURVEY.md §5: upsert idempotence, latest-wins
  * model equivalence, RT == RO after compaction, incremental(0) ==
  * snapshot. Seeded ScalaCheck generators drive small random
  * workloads (the reference's YAML-DAG vocabulary, shrunk).
  */
class PropertiesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-prop-").toString

  private def cfg(name: String, tpe: String = TableConfig.Cow) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = Some("p"), tableType = tpe, numBuckets = 2)

  private val genBatch: Gen[List[R]] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 4).map(i => s"k$i")
      ts <- Gen.choose(1L, 9L)
      p <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 99L)
    } yield R(k, ts, p, v))
  } yield rows

  private def sample(seed: Long): List[R] =
    genBatch.apply(Gen.Parameters.default, Seed(seed)).get

  private def df(rows: Seq[R]): DataFrame = rows.toDF()

  private def snapshot(t: GraftTable): Set[(String, String, Long, Long)] =
    t.read().select("key", "p", "ts", "v")
      .as[(String, String, Long, Long)].collect().toSet

  test("property: upsert is idempotent (re-upserting a batch changes nothing)") {
    (1L to 4L).foreach { seed =>
      val rows = sample(seed)
      val t = GraftTable.create(spark, tmp(), cfg("idem"))
      t.upsert(df(rows))
      val s1 = snapshot(t)
      t.upsert(df(rows))
      assert(snapshot(t) == s1, s"seed=$seed")
    }
  }

  test("property: RT == RO after compaction, for any two batches") {
    (10L to 13L).foreach { seed =>
      val (b1, b2) = (sample(seed), sample(seed + 100))
      val t = GraftTable.create(spark, tmp(), cfg("conv", TableConfig.Mor))
      t.insert(df(b1))
      t.upsert(df(b2))
      TableServices.compact(t)
      val ro = t.readOptimized().select("key", "p", "ts", "v")
        .as[(String, String, Long, Long)].collect().toSet
      val rt = t.readRealtime().select("key", "p", "ts", "v")
        .as[(String, String, Long, Long)].collect().toSet
      assert(ro == rt, s"seed=$seed")
    }
  }

  test("property: snapshot equals per-(p,key) max-(ts, arrival) model") {
    (20L to 23L).foreach { seed =>
      val (b1, b2) = (sample(seed), sample(seed + 100))
      val t = GraftTable.create(spark, tmp(), cfg("model"))
      t.upsert(df(b1))
      t.upsert(df(b2))
      // reference model: later batch wins at equal ts; within a batch
      // ties are unordered → compare the deterministic (key,p,ts) part
      val model = (b1.map((_, 1)) ++ b2.map((_, 2)))
        .groupBy(x => (x._1.key, x._1.p))
        .map { case (kp, vs) =>
          val best = vs.maxBy(x => (x._1.ts, x._2))
          (kp._1, kp._2, best._1.ts)
        }.toSet
      val got = t.read().select("key", "p", "ts")
        .as[(String, String, Long)].collect().toSet
      assert(got == model, s"seed=$seed")
    }
  }

  test("property: incremental(0) == snapshot for any workload") {
    (30L to 33L).foreach { seed =>
      val (b1, b2) = (sample(seed), sample(seed + 100))
      val t = GraftTable.create(spark, tmp(), cfg("incr"))
      t.upsert(df(b1))
      t.upsert(df(b2))
      val snap = snapshot(t)
      val inc = t.readIncremental("0").select("key", "p", "ts", "v")
        .as[(String, String, Long, Long)].collect().toSet
      assert(inc == snap, s"seed=$seed")
    }
  }
}
