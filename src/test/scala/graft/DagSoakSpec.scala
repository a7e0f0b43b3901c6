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

  private def centroidBytes(path: String): Seq[(String, Long)] =
    graft.util.Fs.list(java.nio.file.Paths.get(path, "centroids.parquet"))(
      _.filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.size(p)).toSeq).sortBy(_._1)

  private def runDag(tableType: String, rounds: Int): Unit = {
    val catalog = new graft.sql.GraftCatalog(spark, tmp(tableType))
    val gsql = new graft.sql.GraftSql(catalog)
    val name = s"dagsoak_$tableType"
    val t = catalog.createTable(TableConfig(name = name, keyField = "k",
      orderingField = "ts", tableType = tableType, numBuckets = 2))
    // the ValidateDatasetNode's accumulated expected input:
    // k -> (ts, v), latest-wins on ts — exactly the upsert contract.
    // txt/emb are DERIVED columns (txt from v, emb from k), so the
    // expected map needs no extra state: the same derivation runs on
    // the expected side in validate().
    var expected = Map.empty[Long, (Long, Double)]
    var ts = 0L
    var centsAfterBuild: Seq[(String, Long)] = Nil
    def df(rows: Seq[(Long, Long, Double)]) = rows.toDF("k", "ts", "v")
      .withColumn("txt", col("v").cast("string"))
      .withColumn("emb",
        expr("transform(sequence(0, 5), j -> sin(k * 6 + j) + 2.0d)")
          .cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = true)))
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
        // v = k so txt (derived from v) is globally unique except the
        // deliberate duplicates the dedup stage below plants
        val rows = (0 until n).map(j =>
          (base + i * 10000L + j, ts, (base + i * 10000L + j) * 1.0))
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
      // vector_search rides the SAME timeline (the reference's DAG adds
      // a service per round): round 1 builds the index; every later
      // round's commits maintain it INCREMENTALLY — frozen centroids,
      // svc-journaled CDC append — and the full-probe search must equal
      // brute force over the live snapshot (round's inserts present,
      // deletes absent)
      val qk = ups.head._1
      val viaSql = gsql.sql(s"CALL vector_search(table => '$name', " +
          s"id_col => 'k', vec_col => 'emb', k => 3, n_lists => 4, " +
          s"query_where => 'k = $qk')")
        .select("neighbor_id").as[Long].collect().toSet
      val brute = graft.operators.Similarity.bruteForceTopK(
        t.read().select("k", "emb"),
        t.read().filter(col("k") === qk).select("k", "emb"),
        "k", "emb", k = 3)
        .select("neighbor_id").as[Long].collect().toSet
      assert(viaSql == brute,
        s"round $r: indexed search diverged from brute force")
      assert(viaSql.intersect(dels.toSet).isEmpty,
        s"round $r: a deleted key was served as a neighbor")
      val idxPath = TableServices.vectorIndexPath(t, "emb")
      if (r == 1) centsAfterBuild = centroidBytes(idxPath)
      else {
        assert(centroidBytes(idxPath) == centsAfterBuild,
          s"round $r: index maintenance retrained the frozen centroids")
        assert(graft.util.Fs.list(
            java.nio.file.Paths.get(idxPath, "_appends"))(
            _.exists(p => p.getFileName.toString.startsWith("svc-") &&
              p.getFileName.toString.endsWith(".done"))),
          s"round $r: no svc append journal — maintenance was not the " +
          "incremental path")
      }
      // the stats row rides every round: the index reports the
      // maintained stamp and the action the round actually took
      val srow = gsql.sql(s"CALL vector_index_stats(table => '$name', " +
          "vec_col => 'emb')").collect().head
      assert(srow.getAs[String]("stamp_instant") == t.log.lastInstant().get,
        s"round $r: stats stamp must be the maintained instant")
      assert(srow.getAs[String]("last_action") ==
          (if (r == 1) "rebuild" else "incremental"),
        s"round $r: unexpected last_action " +
          srow.getAs[String]("last_action"))
      val sFrac = srow.getAs[Double]("tombstone_fraction")
      assert(sFrac >= 0.0 && sFrac <= 1.0, s"round $r: fraction $sFrac")
      // dedup curation service on the same timeline: 5 duplicate-text
      // rows land (same v as live keys → same derived txt), CALL
      // dedup_table removes exactly them (keep-best = lowest key), and
      // the invariants hold again
      ts += 1
      val dupSrc = expected.keys.toSeq.sorted.take(5)
      val dupRows = dupSrc.map(k => (k + 77777777L, ts, expected(k)._2))
      t.insert(df(dupRows))
      fold(dupRows)
      val removed = gsql.sql(s"CALL dedup_table(table => '$name', " +
          "column => 'txt')")
        .collect().head.getLong(0)
      assert(removed == 5L, s"round $r: dedup removed $removed, wanted 5")
      expected --= dupRows.map(_._1)
      validate(r, "post_dedup")
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
