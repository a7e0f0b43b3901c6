package graft

import graft.operators.{Bpe, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimization-round 19 invariants: every fused/fast path must return
  * results identical to the path it replaces. */
class OptimizationR19Spec extends AnyFunSuite {

  private lazy val spark = Session.local(4)
  import spark.implicits._

  // ---- fused COW full-sync MERGE (GraftTable.fullSyncCow) ------------

  private def syncFixture(name: String, tpe: String):
      (graft.sql.GraftSql, core.GraftTable) = {
    val wh = graft.util.TempDirs.create(s"graft-$name-").toString
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(core.TableConfig(
      name = name, keyField = "id", orderingField = "ts",
      partitionField = None, tableType = tpe, numBuckets = 2))
    t.insert(Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L),
      (4L, "d", 10L)).toDF("id", "name", "ts"))
    // second commit so multiple file-group versions exist pre-merge
    t.upsert(Seq((2L, "b1", 11L), (5L, "e", 11L)).toDF("id", "name", "ts"))
    (gsql, t)
  }

  private val fullSyncMerge =
    // id 1: newer src ts -> src wins; id 2: src ts OLDER than stored
    // (11) -> stored row must win (latest-wins preserved through the
    // fused path); id 9: unmatched source key -> must NOT insert;
    // ids 3,4,5: absent from source -> deleted
    """MERGE INTO %s USING (
      |  SELECT 1 AS id, 'a2' AS name, 20 AS ts
      |  UNION ALL SELECT 2, 'bX', 5
      |  UNION ALL SELECT 9, 'nope', 99) AS s
      |ON s.id = %s.id
      |WHEN MATCHED THEN UPDATE SET *
      |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin

  test("fused COW full-sync MERGE == the MOR two-step path, exactly") {
    val (gc, tc) = syncFixture("fsync_cow", core.TableConfig.Cow)
    val (gm, tm) = syncFixture("fsync_mor", core.TableConfig.Mor)
    gc.sql(fullSyncMerge.format("fsync_cow", "fsync_cow"))
    gm.sql(fullSyncMerge.format("fsync_mor", "fsync_mor"))
    def state(t: core.GraftTable) = t.read()
      .select("id", "name", "ts").as[(Long, String, Long)]
      .collect().toSet
    val cow = state(tc)
    assert(cow == state(tm))
    assert(cow == Set((1L, "a2", 20L), (2L, "b1", 11L)))
  }

  test("fused COW full-sync MERGE lands as ONE commit") {
    val (gsql, t) = syncFixture("fsync_one", core.TableConfig.Cow)
    val before = t.log.commits().length
    gsql.sql(fullSyncMerge.format("fsync_one", "fsync_one"))
    val commits = t.log.commits()
    assert(commits.length == before + 1) // was upsert + delete = 2
    assert(commits.last.operation == "full_sync")
  }

  test("fused full-sync drops non-overlapping file groups without reading them") {
    // source keys all land in one bucket's key range; the other
    // groups' files must be REMOVED by the commit (their keys are
    // absent from the source) — pure metadata, same final state
    val (gsql, t) = syncFixture("fsync_drop", core.TableConfig.Cow)
    gsql.sql(
      """MERGE INTO fsync_drop USING (SELECT 1 AS id, 'only' AS name, 99 AS ts) AS s
        |ON s.id = fsync_drop.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(t.read().select("id", "name").as[(Long, String)]
      .collect().toSeq == Seq((1L, "only")))
  }

  // ---- BPE driver tie-break is UTF-8 byte order -----------------------

  test("bpe utf8Cmp orders by UTF-8 bytes where UTF-16 disagrees") {
    // U+1F600 (4-byte UTF-8: F0 9F 98 80; UTF-16 surrogate D83D DE00)
    // vs U+FFFD (3-byte UTF-8: EF BF BD). Java Strings order the
    // surrogate BELOW �; UTF-8 bytes order it ABOVE.
    val emoji = new String(Character.toChars(0x1F600))
    val repl = "�"
    assert(emoji.compareTo(repl) < 0) // UTF-16 order
    assert(Bpe.utf8Cmp(emoji, repl) > 0) // UTF-8 byte order
    // ASCII agreement: the orders coincide on mergeStats' own alphabet
    for (a <- Seq("a", "ab", "b", "zz"); b <- Seq("a", "ab", "b", "zz"))
      assert(Integer.signum(Bpe.utf8Cmp(a, b)) ==
        Integer.signum(a.compareTo(b)))
  }

  // ---- PQ k >= n seeding shortcut --------------------------------------

  test("pq lossless ADC stays exact with duplicate points and k >= n") {
    // duplicates make the farthest-point traversal exhaust early (the
    // pre-shortcut path seeded only DISTINCT points); the shortcut
    // seeds all points in sample order instead — decoded values are
    // identical either way, so ADC must still equal brute force
    val base = Seq(
      Array(1.0f, 0f, 0f, 0f), Array(0f, 1.0f, 0f, 0f),
      Array(0f, 1.0f, 0f, 0f), // exact duplicate of vec 1
      Array(0f, 0f, 1.0f, 0f), Array(0.5f, 0.5f, 0f, 0f))
    val df = base.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, codesPerSub = 16)
    val enc = Pq.encode(df, "vec_id", "embedding", cb)
    val q = Array(1.0, 0.0, 0.0, 0.0)
    val got = Pq.adcTopK(enc, "vec_id", cb, q, k = 5)
      .orderBy(col("adc_score").desc, col("vec_id").asc)
      .select("vec_id").as[Long].collect().toSeq
    // exact inner products: 1.0, 0.5, then 0.0 ties by id
    assert(got == Seq(0L, 4L, 1L, 2L, 3L))
  }

  // ---- Par.spread static width probe -----------------------------------

  test("spread widens a narrow checkpointed input without executing it") {
    val one = spark.range(0, 100, 1, 1).selectExpr("id", "cast(id as string) s")
      .localCheckpoint()
    val spreadDf = graft.util.Par.spread(one)
    assert(spreadDf.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spread passes shuffled (derived) inputs through untouched") {
    val derived = spark.range(0, 100, 1, 1)
      .groupBy((col("id") % 7).as("k")).agg(count(lit(1)).as("c"))
    val out = graft.util.Par.spread(derived)
    assert(out eq derived) // same frame: no exchange added on top
  }

  // ---- IVF driver-side Lloyd determinism -------------------------------

  test("ivf build yields bit-identical centroids across builds") {
    val embs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 13).toFloat))
    }.toDF("vec_id", "embedding")
    def centroids(path: String): Array[Array[Double]] = {
      operators.IvfIndex.build(embs, "vec_id", "embedding", 4, path)
      spark.read.parquet(s"$path/centroids.parquet").orderBy("list")
        .select(col("centroid").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
    }
    val a = centroids(graft.util.TempDirs.create("graft-ivfdet-a-").toString)
    val b = centroids(graft.util.TempDirs.create("graft-ivfdet-b-").toString)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x, y)) }
  }
}
