package graft.sql

import graft.Session
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The demo-transcript SQL surface end to end through GraftSql:
  * DDL/CTAS, INSERT VALUES/SELECT, UPDATE, DELETE, SHOW, and plain
  * SELECT fall-through over synced views (SURVEY.md §2.6).
  */
class SqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  lazy val catalog = new GraftCatalog(spark,
    graft.util.TempDirs.create("graft-wh-").toString)
  lazy val gsql = new GraftSql(catalog)
  import spark.implicits._

  test("CREATE TABLE + INSERT VALUES + SELECT round trip") {
    gsql.sql("""CREATE TABLE people (id BIGINT, name STRING, city STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts', partition='city')""")
    assert(catalog.listTables().contains("people"))
    gsql.sql("INSERT INTO people VALUES (1, 'ann', 'berlin', 100), (2, 'bob', 'paris', 100)")
    val rows = gsql.sql("SELECT id, name FROM people ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "ann"), (2L, "bob")))
  }

  test("UPDATE and DELETE (SparkSqlUpdateNode / SparkSqlDeleteNode analogs)") {
    gsql.sql("UPDATE people SET name = 'anna' WHERE id = 1")
    assert(gsql.sql("SELECT name FROM people WHERE id = 1").as[String].head() == "anna")
    gsql.sql("DELETE FROM people WHERE id = 2")
    assert(gsql.sql("SELECT count(*) AS c FROM people").as[Long].head() == 1L)
  }

  test("SHOW TABLES / SHOW PARTITIONS") {
    val tables = gsql.sql("SHOW TABLES").as[String].collect()
    assert(tables.contains("people"))
    val parts = gsql.sql("SHOW PARTITIONS people").as[String].collect()
    assert(parts.contains("berlin"))
  }

  test("CTAS from a SELECT over testdata (use_ctas analog)") {
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .createOrReplaceTempView("raw_events")
    gsql.sql("""CREATE TABLE ev USING GRAFT
      OPTIONS (primaryKey='user_id', precombine='ts', partition='event_type', type='mor')
      AS SELECT * FROM raw_events""")
    val n = gsql.sql("SELECT count(*) AS c FROM ev_rt").as[Long].head()
    assert(n > 0)
    // key-uniqueness invariant (A3) holds on the snapshot
    val dups = gsql.sql(
      """SELECT event_type, user_id FROM ev
         GROUP BY event_type, user_id HAVING count(*) > 1""").count()
    assert(dups == 0)
  }

  test("MERGE INTO: upsert and delete forms (Hudi-SQL merge statement)") {
    gsql.sql("""CREATE TABLE mrg (id BIGINT, name STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO mrg VALUES (1, 'ann', 100), (2, 'bob', 100)")
    // update an existing key + insert a new one, from an inline SELECT
    gsql.sql("""MERGE INTO mrg USING (
        SELECT 1 AS id, 'anna' AS name, 200 AS ts
        UNION ALL SELECT 3, 'cyd', 200) AS s
      ON mrg.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = gsql.sql("SELECT id, name FROM mrg ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "anna"), (2L, "bob"), (3L, "cyd")))
    // delete form: matched keys are removed
    gsql.sql("""MERGE INTO mrg USING (SELECT 2 AS id, 'x' AS name, 300 AS ts) AS s
      ON mrg.id = s.id
      WHEN MATCHED THEN DELETE""")
    assert(gsql.sql("SELECT id FROM mrg ORDER BY id").as[Long].collect().toSeq
      == Seq(1L, 3L))
    // the record-key merge contract is enforced
    val ex = intercept[IllegalArgumentException] {
      gsql.sql("""MERGE INTO mrg USING (SELECT 1 AS id, 'y' AS name, 1 AS ts) AS s
        ON mrg.name = s.name WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(ex.getMessage.contains("record key"))
    // ...and not by substring: a compound condition or a column merely
    // CONTAINING the key name must be rejected, not silently narrowed
    val ex2 = intercept[IllegalArgumentException] {
      gsql.sql("""MERGE INTO mrg USING (SELECT 1 AS id, 'y' AS name, 1 AS ts) AS s
        ON mrg.id = s.id AND mrg.name = s.name WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(ex2.getMessage.contains("record key"))
    val ex3 = intercept[IllegalArgumentException] {
      gsql.sql("""MERGE INTO mrg USING (SELECT 1 AS id, 1 AS other_id, 'y' AS name, 1 AS ts) AS s
        ON mrg.id = s.other_id WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(ex3.getMessage.contains("record key"))
  }

  test("MERGE INTO: insert-only leaves matched rows untouched; source may contain JOIN ... ON") {
    gsql.sql("""CREATE TABLE mrg2 (id BIGINT, name STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO mrg2 VALUES (1, 'ann', 100)")
    // insert-only: id=1 exists and must NOT be updated; id=2 is new.
    // The source is a parenthesized SELECT with an inner JOIN ... ON —
    // the statement's ON must be found at paren depth 0.
    gsql.sql("""MERGE INTO mrg2 USING (
        SELECT a.id, a.name, a.ts FROM
          (SELECT 1 AS id, 'HIJACK' AS name, 999 AS ts
           UNION ALL SELECT 2, 'new', 999) a
          JOIN (SELECT 1 AS id UNION ALL SELECT 2) b ON a.id = b.id) AS s
      ON mrg2.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = gsql.sql("SELECT id, name FROM mrg2 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "ann"), (2L, "new"))) // 1 untouched, 2 inserted
    // delete + insert combination
    gsql.sql("""MERGE INTO mrg2 USING (
        SELECT 1 AS id, 'x' AS name, 1000 AS ts
        UNION ALL SELECT 3, 'cyd', 1000) AS s
      ON mrg2.id = s.id
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT *""")
    assert(gsql.sql("SELECT id, name FROM mrg2 ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((2L, "new"), (3L, "cyd")))
  }

  test("MERGE key probe is stats-pruned to the source's key range") {
    gsql.sql("""CREATE TABLE mrgprobe (id BIGINT, name STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts', buckets='1')""")
    val t = catalog.table("mrgprobe")
    t.insert((1L to 4000L).map(i => (i, s"n$i", 1L)).toDF("id", "name", "ts"))
    // range-cluster so files carry disjoint key slices
    val bytes = t.log.liveFiles().map(_.bytes).sum
    graft.core.TableServices.cluster(t, targetFileBytes = bytes / 4)
    val live = t.log.liveFiles().size
    assert(live >= 3, s"need several files, got $live")
    val narrow = (2L to 5L).map(i => (i, s"m$i", 2L)).toDF("id", "name", "ts")
    val probe = GraftSql.mergeKeyProbe(t, narrow)
    assert(probe.inputFiles.length < live,
      s"narrow-key probe read ${probe.inputFiles.length} of $live files")
    // and the pruned probe keeps MERGE semantics: matched-only update
    narrow.createOrReplaceTempView("mrg_src")
    gsql.sql("""MERGE INTO mrgprobe USING (SELECT * FROM mrg_src) AS s
      ON mrgprobe.id = s.id WHEN MATCHED THEN UPDATE SET *""")
    assert(gsql.sql("SELECT name FROM mrgprobe WHERE id = 3").as[String].head() == "m3")
    assert(gsql.sql("SELECT count(*) AS c FROM mrgprobe").as[Long].head() == 4000L)
  }

  test("CALL procedures: compaction, z-order clustering, rollback, observability") {
    gsql.sql("""CREATE TABLE svc (id BIGINT, name STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts', type='mor')""")
    gsql.sql("INSERT INTO svc VALUES (1, 'a', 100), (2, 'b', 100)")
    gsql.sql("""MERGE INTO svc USING (SELECT 1 AS id, 'a2' AS name, 200 AS ts) AS s
      ON svc.id = s.id WHEN MATCHED THEN UPDATE SET *""")
    // the MOR upsert appended a delta — CALL run_compaction folds it
    val inst = gsql.sql("CALL run_compaction(table => 'svc')")
    assert(inst.columns.sameElements(Array("instant")) && inst.count() == 1)
    assert(gsql.sql("CALL show_commits('svc')")
      .filter($"action" === "compact").count() == 1)
    // ≥2 columns → z-order layout; content is unchanged
    assert(gsql.sql("CALL run_clustering(table => 'svc', columns => 'ts,id')").count() == 1)
    assert(gsql.sql("SELECT id, name FROM svc ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a2"), (2L, "b")))
    // rollback the newest ROW commit (the merge) — service commits skipped
    assert(gsql.sql("CALL rollback_last_commit(table => 'svc')").count() == 1)
    assert(gsql.sql("SELECT id, name FROM svc ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException](gsql.sql("CALL bogus('svc')"))
  }

  test("CALL dedup_table: exact-dup curation through the SQL surface") {
    gsql.sql("""CREATE TABLE corp (id BIGINT, body STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO corp VALUES (1, 'aa', 1), (2, 'bb', 1), " +
      "(3, 'aa', 1), (4, 'aa', 1), (5, 'cc', 1)")
    val deleted = gsql.sql("CALL dedup_table(table => 'corp', column => 'body')")
    assert(deleted.columns.sameElements(Array("deleted")))
    assert(deleted.as[Long].head() == 2L)
    assert(gsql.sql("SELECT id FROM corp ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 5L))
    // second pass: nothing left to remove
    assert(gsql.sql("CALL dedup_table('corp', 'body')").as[Long].head() == 0L)
    // missing column argument is loud; so is a bogus mode
    intercept[IllegalArgumentException](
      gsql.sql("CALL dedup_table(table => 'corp')"))
    intercept[IllegalArgumentException](
      gsql.sql("CALL dedup_table('corp', 'body', 'bogus')"))
    // fuzzy mode: the surviving texts are mutually dissimilar two-char
    // strings (Jaccard 0 across shingles) — fuzzy removes nothing more
    assert(gsql.sql(
      "CALL dedup_table(table => 'corp', column => 'body', mode => 'fuzzy')")
      .as[Long].head() == 0L)
  }

  test("DROP TABLE and TRUNCATE TABLE statements") {
    gsql.sql("""CREATE TABLE dt (id BIGINT, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO dt VALUES (1, 100), (2, 100)")
    // truncate keeps the table (and its history) but empties the content
    gsql.sql("TRUNCATE TABLE dt")
    assert(gsql.sql("SELECT * FROM dt").count() == 0)
    gsql.sql("INSERT INTO dt VALUES (3, 200)")
    assert(gsql.sql("SELECT id FROM dt").as[Long].collect().toSeq == Seq(3L))
    gsql.sql("DROP TABLE dt")
    assert(!gsql.sql("SHOW TABLES").as[String].collect().contains("dt"))
    // idempotent form succeeds, bare form errors
    gsql.sql("DROP TABLE IF EXISTS dt")
    intercept[IllegalArgumentException](gsql.sql("DROP TABLE dt"))
  }

  test("MERGE partial UPDATE SET: assigned columns change, the rest carry through") {
    gsql.sql("""CREATE TABLE pm (id BIGINT, name STRING, score BIGINT, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO pm VALUES (1, 'a', 10, 100), (2, 'b', 20, 100)")
    // bump score from the source, leave name/ts untouched; insert new keys
    gsql.sql("""MERGE INTO pm USING (
        SELECT 1 AS id, 'ignored' AS name, 99 AS score, 200 AS ts
        UNION ALL SELECT 3, 'c', 30, 200) AS s
      ON pm.id = s.id
      WHEN MATCHED THEN UPDATE SET score = s.score + 1
      WHEN NOT MATCHED THEN INSERT *""")
    val got = gsql.sql("SELECT id, name, score FROM pm ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 100L), (2L, "b", 20L), (3L, "c", 30L)))
    // assigning the record key is refused
    val e = intercept[IllegalArgumentException] {
      gsql.sql("""MERGE INTO pm USING (SELECT 1 AS id, 0 AS score) AS s
        ON pm.id = s.id WHEN MATCHED THEN UPDATE SET id = s.score""")
    }
    assert(e.getMessage.contains("record key"))
  }

  test("CALL schedule_compaction parks a plan; run_compaction(instant) executes it") {
    gsql.sql("""CREATE TABLE svc2 (id BIGINT, name STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts', type='mor')""")
    gsql.sql("INSERT INTO svc2 VALUES (1, 'a', 100), (2, 'b', 100)")
    gsql.sql("""MERGE INTO svc2 USING (SELECT 1 AS id, 'a2' AS name, 200 AS ts) AS s
      ON svc2.id = s.id WHEN MATCHED THEN UPDATE SET *""")
    val req = gsql.sql("CALL schedule_compaction(table => 'svc2')")
      .as[String].collect()
    assert(req.length == 1)
    // the request is visible on the timeline but moves no files
    assert(gsql.sql("CALL show_commits('svc2')")
      .filter($"action" === "compact_requested").count() == 1)
    val ran = gsql.sql(
      s"CALL run_compaction(table => 'svc2', instant => '${req.head}')")
      .as[String].collect()
    assert(ran.length == 1)
    assert(gsql.sql("CALL show_commits('svc2')")
      .filter($"action" === "compact").count() == 1)
    assert(gsql.sql("SELECT id, name FROM svc2 ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a2"), (2L, "b")))
  }

  test("INSERT OVERWRITE replaces a partition") {
    gsql.sql("INSERT INTO people VALUES (3, 'cid', 'tokyo', 100)")
    gsql.sql("INSERT OVERWRITE people VALUES (9, 'zoe', 'tokyo', 200)")
    val tokyo = gsql.sql("SELECT id FROM people WHERE city = 'tokyo'")
      .as[Long].collect().toSet
    assert(tokyo == Set(9L))
    // berlin untouched
    assert(gsql.sql("SELECT count(*) AS c FROM people WHERE city='berlin'").as[Long].head() == 1L)
  }

  test("observability: commits/files/partition stats from the log only") {
    val t = catalog.table("people")
    assert(Observability.commits(t).count() >= 3)
    assert(Observability.files(t).filter($"rows" > 0).count() > 0)
    val stats = Observability.partitionStats(t)
    assert(stats.filter($"partition" === "berlin").count() == 1)
  }

  test("ALTER TABLE ADD COLUMNS widens the schema; old rows read null") {
    gsql.sql("""CREATE TABLE alt_sql (id BIGINT, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO alt_sql VALUES (1, 100)")
    gsql.sql("ALTER TABLE alt_sql ADD COLUMNS (score DOUBLE, tag STRING)")
    val t = catalog.table("alt_sql")
    assert(t.schema.fieldNames.toSet.intersect(Set("score", "tag")).size == 2)
    // pre-evolution row surfaces nulls for the new columns
    val row = gsql.sql("SELECT id, score, tag FROM alt_sql").collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(1) && row.isNullAt(2))
    // new writes fill them
    gsql.sql("INSERT INTO alt_sql VALUES (2, 100, 0.5, 'x')")
    assert(gsql.sql("SELECT count(*) FROM alt_sql WHERE tag = 'x'")
      .collect().head.getLong(0) == 1L)
    // duplicate column refused
    intercept[IllegalArgumentException] {
      gsql.sql("ALTER TABLE alt_sql ADD COLUMNS (score DOUBLE)") }
  }

  test("DESCRIBE TABLE lists user columns and table properties") {
    gsql.sql("""CREATE TABLE desc_t (id BIGINT, name STRING, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    val rows = gsql.sql("DESCRIBE TABLE desc_t")
      .as[(String, String, String)].collect().toSeq
    val cols = rows.takeWhile(_._1.nonEmpty).map(r => (r._1, r._2))
    assert(cols == Seq(("id", "bigint"), ("name", "string"), ("ts", "bigint")))
    val props = rows.filter(_._1.startsWith("#"))
      .map { case (k, v, _) => k -> v }.toMap
    assert(props("# Record Key") == "id")
    assert(props("# Precombine") == "ts")
    assert(props("# Partition") == "<none>")
    // engine metadata columns are elided
    assert(!rows.exists(_._1 == graft.core.TableConfig.CommitTimeCol))
    // short form parses too
    assert(gsql.sql("DESC desc_t").count() == rows.length)
  }

  test("SHOW CREATE TABLE round-trips: emitted DDL reproduces the table") {
    gsql.sql("""CREATE TABLE sct (id BIGINT, city STRING, v DOUBLE, ts BIGINT)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts',
      partition='city', type='mor', buckets='3')""")
    val stmt = gsql.sql("SHOW CREATE TABLE sct").collect().head.getString(0)
    assert(stmt.contains("USING GRAFT") && stmt.contains("partition='city'"))
    // execute the emitted statement in a FRESH warehouse: config and
    // declared schema must match the original exactly
    val catalog2 = new GraftCatalog(spark,
      graft.util.TempDirs.create("graft-wh2-").toString)
    new GraftSql(catalog2).sql(stmt)
    val (a, b) = (catalog.table("sct"), catalog2.table("sct"))
    assert(b.config == a.config.copy(indexes = b.config.indexes))
    assert(b.schema == a.schema)
  }

  test("CALL sync_xtable emits Delta + Iceberg metadata incrementally (demo.md:87)") {
    gsql.sql("""CREATE TABLE xts (id BIGINT, ts BIGINT, v STRING)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    gsql.sql("INSERT INTO xts VALUES (1, 1, 'a'), (2, 1, 'b')")
    // delta: one version per graft commit (CREATE's initial commit +
    // the INSERT); iceberg: one snapshot per sync, versions from 0
    val first = gsql.sql("CALL sync_xtable(table => 'xts', format => 'all')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(first == Seq("delta" -> 0L, "delta" -> 1L, "iceberg" -> 0L),
      first.toString)
    val root = java.nio.file.Paths.get(catalog.warehouseDir, "xts")
    assert(java.nio.file.Files.exists(root.resolve("_delta_log")))
    assert(java.nio.file.Files.exists(root.resolve("metadata/v0.metadata.json")))
    // nothing new committed: the incremental cursor makes sync a no-op
    assert(gsql.sql("CALL sync_xtable(table => 'xts')").count() == 0)
    // a new commit re-arms it; single-format selection works
    gsql.sql("INSERT INTO xts VALUES (3, 1, 'c')")
    val inc = gsql.sql("CALL sync_xtable(table => 'xts', format => 'iceberg')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(inc == Seq("iceberg" -> 1L), inc.toString)
    assert(java.nio.file.Files.exists(root.resolve("metadata/v1.metadata.json")))
  }

  test("CALL register_table adopts an existing graft table by path (demo.md:223-229)") {
    // a table living OUTSIDE the warehouse (e.g. an exported/foreign
    // location), with history worth keeping
    val ext = graft.util.TempDirs.create("graft-ext-").toString + "/people_ext"
    val t = graft.core.GraftTable.create(spark, ext, graft.core.TableConfig(
      name = "people_ext", keyField = "id", orderingField = "ts", numBuckets = 2))
    t.insert(Seq((1L, 10L, "x"), (2L, 10L, "y")).toDF("id", "ts", "v"))
    t.upsert(Seq((2L, 20L, "y2")).toDF("id", "ts", "v"))

    val out = gsql.sql(
      s"CALL register_table(table => 'adopted', metadata_path => '$ext')")
      .collect().head
    assert(out.getString(2) == "registered")
    // registered table answers SQL with the source's current rows
    val rows = gsql.sql("SELECT id, v FROM adopted ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x"), (2L, "y2")))
    // full timeline came with it: incremental/history surfaces work
    assert(catalog.table("adopted").log.snapshot().commits.size == 2)
    // DROP un-registers without touching the linked table's files
    gsql.sql("DROP TABLE adopted")
    assert(!catalog.tableExists("adopted"))
    assert(graft.core.GraftTable.exists(ext))
    assert(graft.core.GraftTable.load(spark, ext).read().count() == 2)
    // a DANGLING registration (target deleted out from under the
    // catalog) must stay droppable and re-registrable
    catalog.registerTable("adopted", ext)
    graft.util.TempDirs.deleteRecursively(java.nio.file.Paths.get(ext))
    gsql.sql("DROP TABLE adopted") // dangling symlink: un-register works
    assert(!catalog.tableExists("adopted"))
    val ext2 = graft.util.TempDirs.create("graft-ext2-").toString + "/t2"
    val t2 = graft.core.GraftTable.create(spark, ext2, graft.core.TableConfig(
      name = "t2", keyField = "id", orderingField = "ts", numBuckets = 1))
    t2.insert(Seq((9L, 1L, "z")).toDF("id", "ts", "v"))
    catalog.registerTable("adopted", ext2) // name reusable after the drop
    assert(gsql.sql("SELECT v FROM adopted").as[String].head() == "z")
    // and replacing a dangling link directly also works
    graft.util.TempDirs.deleteRecursively(java.nio.file.Paths.get(ext2))
    val ext3 = graft.util.TempDirs.create("graft-ext3-").toString + "/t3"
    val t3 = graft.core.GraftTable.create(spark, ext3, graft.core.TableConfig(
      name = "t3", keyField = "id", orderingField = "ts", numBuckets = 1))
    t3.insert(Seq((7L, 1L, "w")).toDF("id", "ts", "v"))
    catalog.registerTable("adopted", ext3)
    assert(gsql.sql("SELECT v FROM adopted").as[String].head() == "w")
  }

  test("CALL register_table adopts a Delta table by LIVE-set replay (xtable_delta.yaml)") {
    val root = graft.util.TempDirs.create("graft-deltasrc-").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "_delta_log"))
    def writeFile(name: String, rows: Seq[(Long, Long, String)]): Long = {
      val tmp = s"$root/.tmp"
      rows.toDF("id", "ts", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = graft.util.Fs.list(java.nio.file.Paths.get(tmp))(_
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
      java.nio.file.Files.move(part, java.nio.file.Paths.get(root, name))
      graft.util.TempDirs.deleteRecursively(java.nio.file.Paths.get(tmp))
      java.nio.file.Files.size(java.nio.file.Paths.get(root, name))
    }
    val schema = Seq((1L, 1L, "x")).toDF("id", "ts", "v").schema.json
    val meta = graft.core.CommitLog.mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0", "format" -> Map("provider" -> "parquet"),
        "schemaString" -> schema, "partitionColumns" -> Seq.empty)))
    val s0 = writeFile("stale.parquet", Seq((1L, 1L, "OLD"), (2L, 1L, "OLD")))
    val s1 = writeFile("live.parquet", Seq((1L, 2L, "x"), (2L, 2L, "y")))
    def w(ver: Long, actions: Seq[String]): Unit = java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_delta_log", f"$ver%020d.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    w(0L, Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
      s"""{"add":{"path":"stale.parquet","partitionValues":{},"size":$s0,"modificationTime":1,"dataChange":true}}"""))
    w(1L, Seq(
      """{"remove":{"path":"stale.parquet","dataChange":true,"deletionTimestamp":2}}""",
      s"""{"add":{"path":"live.parquet","partitionValues":{},"size":$s1,"modificationTime":2,"dataChange":true}}"""))
    gsql.sql("""CREATE TABLE fromdelta (id BIGINT, ts BIGINT, v STRING)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    val out = gsql.sql(
      s"CALL register_table(table => 'fromdelta', metadata_path => '$root')")
      .collect().head
    assert(out.getString(2).startsWith("delta_adopted@"))
    // the stale version sits on disk but the log replay excluded it
    val rows = gsql.sql("SELECT id, v FROM fromdelta ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x"), (2L, "y")))
  }

  test("CALL register_table adopts an Iceberg table by metadata_file (demo.md:223-229)") {
    val src = graft.util.TempDirs.create("graft-icesrc-").toString + "/t"
    val t = graft.core.GraftTable.create(spark, src, graft.core.TableConfig(
      name = "ice_src", keyField = "id", orderingField = "ts", numBuckets = 1))
    t.insert(Seq((1L, 1L, 5.0), (2L, 1L, 6.0)).toDF("id", "ts", "score"))
    graft.interop.XTableSync.syncIceberg(t) // v0 — superseded below
    t.upsert(Seq((2L, 2L, 9.0), (3L, 2L, 7.0)).toDF("id", "ts", "score"))
    graft.interop.XTableSync.syncIceberg(t) // v1 — current
    val metaFile = graft.interop.XTableSync
      .latestIcebergMetadataFile(src).toString
    assert(metaFile.endsWith("v1.metadata.json"))
    gsql.sql("""CREATE TABLE fromice (id BIGINT, ts BIGINT, score DOUBLE)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    val out = gsql.sql(
      s"CALL register_table(table => 'fromice', metadata_file => '$metaFile')")
      .collect().head
    assert(out.getString(2).startsWith("iceberg_adopted@"))
    val rows = gsql.sql("SELECT id, score FROM fromice ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 5.0), (2L, 9.0), (3L, 7.0)))
  }

  test("CALL register_table bootstraps foreign parquet into a created table") {
    val dir = graft.util.TempDirs.create("graft-fp-").toString
    Seq((1L, 1L, 5.0), (2L, 1L, 7.5)).toDF("id", "ts", "score")
      .repartition(1).write.parquet(s"$dir/raw")
    gsql.sql("""CREATE TABLE adopted2 (id BIGINT, ts BIGINT, score DOUBLE)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    val out = gsql.sql(
      s"CALL register_table(table => 'adopted2', metadata_path => '$dir/raw')")
      .collect().head
    assert(out.getString(2).startsWith("bootstrapped@"))
    val rows = gsql.sql("SELECT id, score FROM adopted2 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 5.0), (2L, 7.5)))
  }
}
