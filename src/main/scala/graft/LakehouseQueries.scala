package graft

import graft.core.{GraftTable, TableConfig, TableServices}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The lakehouse write/read operators (SURVEY.md §2.1 S7-S9, §2.6,
  * §2.7, §2.9) exposed through the driver's oracle gate.
  *
  * Each query builds a fresh graft table from the `events` parquet —
  * split into batch₁ (even event_id, the initial insert) and batch₂
  * (odd event_id, the update wave) — then reads a view whose contents
  * DuckDB can reproduce with a window query over the same parquet.
  * Key = user_id, partition = event_type, ordering = ts: a later batch
  * wins per key the way the stock-ticks demo's batch 2 updates batch 1
  * (hudi-spark-minio-trino/README.md:134-139).
  *
  * `(event_type, user_id, ts)` is duplicate-free at every SF (checked),
  * so latest-wins is deterministic; the `(event_id % 2)` tie-breaker in
  * the oracle mirrors commit order without referencing wall-clock
  * commit instants.
  */
object LakehouseQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events") // ts: LongType (epoch nanos)

  private def cfg(name: String, tpe: String) = TableConfig(
    name = name, keyField = "user_id", orderingField = "ts",
    partitionField = Some("event_type"), tableType = tpe, numBuckets = 4)

  private def freshRoot(name: String): String =
    graft.util.TempDirs.create(s"graft-$name-").toString

  /** insert(batch₁) then upsert(batch₂). */
  private def build(spark: SparkSession, dir: String, name: String,
      tpe: String): GraftTable = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot(name), cfg(name, tpe))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    t
  }

  private val outCols = Seq("event_type", "user_id", "event_id", "ts_us", "value")

  // DuckDB truncates parquet ns-timestamps to µs on read, so both
  // sides compare at µs: integer division (exact), not double math.
  private def out(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts DIV 1000"))
      .select(outCols.map(col): _*)
      .orderBy("event_type", "user_id")

  /** DuckDB window-dedup over a subset of events. */
  private def oracleMerge(where: String, tieBreak: Boolean): String = {
    val tb = if (tieBreak) ", (event_id % 2) DESC" else ""
    s"""SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY event_type, user_id ORDER BY ts DESC$tb) AS rn
       |      FROM events$where)
       |WHERE rn = 1 ORDER BY event_type, user_id""".stripMargin
  }

  // ---- S9 upsert + S7 snapshot scan (COW) ---------------------------

  def qCowUpsertSnapshot(spark: SparkSession, dir: String): DataFrame =
    out(build(spark, dir, "ev_cow", TableConfig.Cow).read())

  private val cowUpsertSql = oracleMerge("", tieBreak = true)

  // ---- S8 MOR read-optimized vs realtime ----------------------------

  /** `_ro` after a delta-only upsert: still batch₁'s state
    * (README.md:728-730 staleness semantics). */
  def qMorReadOptimized(spark: SparkSession, dir: String): DataFrame =
    out(build(spark, dir, "ev_mor_ro", TableConfig.Mor).readOptimized())

  private val morRoSql = oracleMerge(" WHERE event_id % 2 = 0", tieBreak = false)

  /** `_rt` merges base + delta on the fly → same content as the COW
    * snapshot. */
  def qMorRealtime(spark: SparkSession, dir: String): DataFrame =
    out(build(spark, dir, "ev_mor_rt", TableConfig.Mor).readRealtime())

  // ---- T1 compaction: after compact, `_ro` converges to `_rt` -------

  def qMorCompacted(spark: SparkSession, dir: String): DataFrame = {
    val t = build(spark, dir, "ev_mor_c", TableConfig.Mor)
    TableServices.compact(t)
    out(t.readOptimized())
  }

  // ---- Q3 incremental read (README.md:966-984) ----------------------

  /** Changes since commit 1 = exactly batch₂'s rows (deduped). */
  def qIncremental(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_incr"),
      cfg("ev_incr", TableConfig.Cow))
    val c1 = t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    out(t.readIncremental(fromExclusive = c1))
  }

  /** Incremental = snapshot rows whose winning version came from
    * batch₂. An upsert whose ordering value is older than the existing
    * row loses the merge (ordering-respecting payload) and therefore
    * does not surface as a change. */
  private val incrSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_id % 2 = 1
      |ORDER BY event_type, user_id""".stripMargin

  // ---- D5 delete-by-predicate (COW rewrite) -------------------------

  def qDelete(spark: SparkSession, dir: String): DataFrame = {
    val t = build(spark, dir, "ev_del", TableConfig.Cow)
    t.deleteWhere(col("event_type") === "click")
    out(t.read())
  }

  private val deleteSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'click'
      |ORDER BY event_type, user_id""".stripMargin

  // ---- D6/D8 insert-overwrite + delete-partition --------------------

  /** Overwrite the `view` partition with only its high-value rows, then
    * drop the `error` partition entirely. */
  def qOverwriteAndDropPartition(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_ovw"),
      cfg("ev_ovw", TableConfig.Cow))
    t.insert(ev)
    t.insertOverwrite(ev.filter(col("event_type") === "view" && col("value") > 100.0))
    t.deletePartitions(Seq("error"))
    out(t.read())
  }

  private val overwriteSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC) AS rn
      |      FROM events
      |      WHERE event_type NOT IN ('view', 'error')
      |         OR (event_type = 'view' AND value > 100.0))
      |WHERE rn = 1 ORDER BY event_type, user_id""".stripMargin

  // ---- T7/§4 stats-based file skipping ------------------------------

  /** Data skipping on commit-log column stats: two bulk-insert commits
    * split at value=100 give files whose [min,max] value ranges are
    * disjoint; `readWhereBetween` lists only files that can contain
    * the range (the Delta-stats skipping analog, SURVEY.md §4) and the
    * residual filter applies on top. Output = raw events with
    * value ≥ 100. */
  def qStatsSkipping(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_skip"), TableConfig(
      name = "ev_skip", keyField = "user_id", orderingField = "ts",
      partitionField = Some("event_type"), numBuckets = 4,
      statsColumns = Seq("value")))
    t.bulkInsert(ev.filter(col("value") < 100.0))
    t.bulkInsert(ev.filter(col("value") >= 100.0))
    t.readWhereBetween("value", lo = Some("100.0"), hi = None)
      .filter(col("value") >= 100.0)
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("event_type", "user_id", "event_id", "ts_us", "value")
      .orderBy("event_id")
  }

  private val statsSkipSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |FROM events WHERE value >= 100.0 ORDER BY event_id""".stripMargin

  // ---- schema evolution through the write path ----------------------

  /** Batch₁ arrives WITHOUT `value`; batch₂ arrives with `value` plus a
    * brand-new derived column. The snapshot reads batch₁-winning rows
    * with nulls in both evolved columns — old parquet files read
    * through the evolved schema, new columns appended additively. */
  def qSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_evo"),
      cfg("ev_evo", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0).drop("value"))
    t.upsert(ev.filter(col("event_id") % 2 === 1)
      .withColumn("vx2", col("value") * 2))
    t.read()
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("event_type", "user_id", "event_id", "ts_us", "value", "vx2")
      .orderBy("event_type", "user_id")
  }

  private val schemaEvoSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us,
      |       CASE WHEN event_id % 2 = 1 THEN value END AS value,
      |       CASE WHEN event_id % 2 = 1 THEN value * 2 END AS vx2
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY event_type, user_id""".stripMargin

  // ---- CDC-format incremental read ----------------------------------

  /** Net row-level changes after the initial insert: batch₂'s winning
    * updates (`u`), its brand-new keys (`i`), and the click partition
    * deleted afterwards (`d`, before-image). An update that loses the
    * latest-wins merge is NOT a change. */
  def qCdc(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_cdc"),
      cfg("ev_cdc", TableConfig.Cow))
    val c1 = t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    t.deleteWhere(col("event_type") === "click")
    t.readCdc(fromExclusive = c1)
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("_change_type", "event_type", "user_id", "event_id", "ts_us", "value")
      .orderBy("event_type", "user_id")
  }

  private val cdcSql =
    """WITH s1 AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (
      |      PARTITION BY event_type, user_id ORDER BY ts DESC) AS rn
      |    FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
      |s2 AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (
      |      PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |    FROM events) WHERE rn = 1 AND event_type <> 'click')
      |SELECT CASE WHEN s1.user_id IS NULL THEN 'i'
      |            WHEN s2.user_id IS NULL THEN 'd'
      |            ELSE 'u' END AS _change_type,
      |       coalesce(s1.event_type, s2.event_type) AS event_type,
      |       coalesce(s1.user_id, s2.user_id) AS user_id,
      |       CASE WHEN s2.user_id IS NULL THEN s1.event_id ELSE s2.event_id END AS event_id,
      |       CASE WHEN s2.user_id IS NULL THEN epoch_us(s1.ts) ELSE epoch_us(s2.ts) END AS ts_us,
      |       CASE WHEN s2.user_id IS NULL THEN s1.value ELSE s2.value END AS value
      |FROM s1 FULL JOIN s2
      |  ON s1.event_type = s2.event_type AND s1.user_id = s2.user_id
      |WHERE s1.user_id IS NULL OR s2.user_id IS NULL OR s1.event_id <> s2.event_id
      |ORDER BY event_type, user_id""".stripMargin

  // ---- T2+ z-order clustering: rewrite preserves content ------------

  /** Z-order the table on (value, ts) after the usual build; the
    * snapshot must be bit-identical to the un-clustered l1 result —
    * clustering is layout, never semantics. (Round3CoreSpec asserts
    * the layout property itself: per-file stats tighten on BOTH
    * z columns.) */
  def qZOrder(spark: SparkSession, dir: String): DataFrame = {
    val t = build(spark, dir, "ev_zorder", TableConfig.Cow)
    TableServices.clusterZOrder(t, Seq("value", "ts"))
    out(t.read())
  }

  // ---- metadata-only bootstrap + progressive conversion -------------

  /** Adopt the raw events parquet metadata-only (no rewrite), then
    * upsert doubled values for every 100th event — the overlapping
    * bootstrap files fold into hash-routed groups and the upserts win
    * the merge (bootstrap rows carry null commit time, ties go to the
    * new write). */
  def qBootstrap(spark: SparkSession, dir: String): DataFrame = {
    // Bootstrap adopts foreign files verbatim (no rewrite), so the
    // adopted files must already carry the table schema — in particular
    // ts as epoch-nanos long, not whichever timestamp encoding this
    // fixture generation used (TESTDATA drift: NANOS-as-long vs MICROS).
    // Materialize the normalized view once and adopt that.
    val srcDir = freshRoot("ev_boot_src")
    events(spark, dir).repartition(4).write.mode("overwrite").parquet(srcDir)
    val t = GraftTable.create(spark, freshRoot("ev_boot"), TableConfig(
      name = "ev_boot", keyField = "event_id", orderingField = "ts",
      partitionField = None, numBuckets = 4))
    t.bootstrapFrom(srcDir)
    val ev = events(spark, dir)
    t.upsert(ev.filter(col("event_id") % 100 === 0)
      .withColumn("value", col("value") * 2))
    t.read()
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("event_type", "user_id", "event_id", "ts_us", "value")
      .orderBy("event_id")
  }

  private val bootstrapSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us,
      |       CASE WHEN event_id % 100 = 0 THEN value * 2 ELSE value END AS value
      |FROM events ORDER BY event_id""".stripMargin

  // ---- S7 time travel: snapshot as-of an earlier instant ------------

  /** VERSION AS OF the first commit: the upsert wave is invisible and
    * the snapshot equals batch₁'s latest-wins state (Hudi's
    * `as.of.instant` read; the catalog twin serves the same view via
    * `VERSION AS OF '<instant>'`). Timeline filtering is metadata-only
    * — the scan plans exactly the files live at that instant, no data
    * read of later commits. */
  def qTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_tt"),
      cfg("ev_tt", TableConfig.Cow))
    val c1 = t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    out(t.read(asOf = Some(c1)))
  }

  private val timeTravelSql = oracleMerge(" WHERE event_id % 2 = 0", tieBreak = false)

  // ---- S8 through the DSv2 catalog: bare-name merged MOR snapshot ---

  /** The MOR table read through a catalog-qualified bare name while
    * delta files are live — served by the file-group merge scan
    * (GraftMorScan: one InputPartition per file group, local
    * latest-wins, no shuffle) and must equal the COW snapshot, like
    * l3's API-level realtime view. */
  private val catalogSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def qMorCatalogSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshRoot("ev_mor_cat_wh")
    // Spark caches catalog instances by name after first resolution —
    // a fresh name per invocation keeps the fresh warehouse visible
    val cat = s"gcat_l14_${catalogSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, s"$wh/ev_mor_cat",
      cfg("ev_mor_cat", TableConfig.Mor))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1)) // live delta files
    require(t.log.liveFiles().exists(_.delta), "gate needs live deltas")
    spark.sql(
      s"""SELECT event_type, user_id, event_id, ts DIV 1000 AS ts_us, value
         |FROM $cat.ev_mor_cat
         |ORDER BY event_type, user_id""".stripMargin)
  }

  // ---- S4+ columnar interchange: ORC round-trip ----------------------

  /** ORC source/sink round trip (Spark-native ORC, a second columnar
    * interchange format beside parquet): write lineitem as ORC, read it
    * back, aggregate. The oracle aggregates the ORIGINAL parquet — the
    * gate passes only if doubles, strings AND timestamps survive the
    * format conversion bit-exactly. Timestamps compare at second
    * granularity via strftime (parquet ns → µs truncation is engine-
    * shared; min/max are computed at full precision first). */
  def qOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val dec = DecimalType(18, 2)
    val tmp = freshRoot("orc_rt")
    Tables.load(spark, dir, "lineitem").write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("min_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("max_ship"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val orcRoundtripSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
      |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- §2.9+ graft table as a streaming SOURCE -----------------------

  /** `readStream.format("graft-stream")` over a live table: the stream
    * starts after commit 1 (micro-batch 1 = batch₁'s snapshot), then an
    * upsert lands WHILE it runs (micro-batch 2 = that commit's changes
    * and nothing else — the incremental-read semantics, l5, through the
    * streaming offset API). The accumulated memory sink therefore holds
    * batch₁'s winners plus the merge-winning rows of batch₂ — keys
    * updated in batch₂ appear twice, once per surfaced version. */
  def qStreamSource(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_stream"),
      cfg("ev_stream", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    val sink = s"l16_sink_${catalogSeq.incrementAndGet()}"
    val q = spark.readStream.format("graft-stream").option("path", t.root)
      .load()
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .start()
    try {
      q.processAllAvailable()
      t.upsert(ev.filter(col("event_id") % 2 === 1))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink)
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select(outCols.map(col): _*)
      .orderBy("event_type", "user_id", "event_id")
  }

  private val streamSourceSql =
    """WITH b1 AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (
      |      PARTITION BY event_type, user_id ORDER BY ts DESC) AS rn
      |    FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
      |b2 AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (
      |      PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |    FROM events) WHERE rn = 1 AND event_id % 2 = 1)
      |SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value FROM b1
      |UNION ALL
      |SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value FROM b2
      |ORDER BY event_type, user_id, event_id""".stripMargin

  // ---- §2.9+ graft table as a streaming SINK ------------------------

  /** Table-to-table streaming ETL entirely inside the engine:
    * `readStream.format("graft-stream")` over a live source table,
    * `writeStream.format("graft-stream")` into a second graft table —
    * the DSv2 STREAMING_WRITE path with per-epoch exactly-once upsert
    * commits ([[graft.sql.GraftStreamingWrite]]), no foreachBatch.
    * Batch₁ is inserted before the stream starts (epoch 1), batch₂
    * lands while it runs (epoch 2 = that commit's changes only); each
    * epoch upserts into the sink, so the sink's final snapshot is the
    * latest-wins merge over ALL events — the l1 oracle shape. */
  def qStreamSink(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val src = GraftTable.create(spark, freshRoot("ev_ssrc"),
      cfg("ev_ssrc", TableConfig.Cow))
    val dst = GraftTable.create(spark, freshRoot("ev_sdst"),
      cfg("ev_sdst", TableConfig.Cow))
    src.insert(ev.filter(col("event_id") % 2 === 0))
    val q = spark.readStream.format("graft-stream").option("path", src.root)
      .load()
      .writeStream.outputMode("append").format("graft-stream")
      .option("path", dst.root)
      .option("checkpointLocation", freshRoot("ev_sck"))
      .start()
    try {
      q.processAllAvailable()
      src.upsert(ev.filter(col("event_id") % 2 === 1))
      q.processAllAvailable()
    } finally q.stop()
    out(dst.read())
  }

  // ---- J3+ storage-partitioned join of two MOR snapshots ------------

  /** Two co-bucketed MOR tables (same key type, bucket count and
    * partition layout) joined through the DSv2 catalog: each side's
    * realtime scan reports its file-group layout as
    * `KeyGroupedPartitioning(identity(event_type), bucket(4, user_id))`
    * (GraftMorScan.outputPartitioning), so Catalyst zips file groups
    * pairwise — the fact⋈fact join runs with ZERO shuffle exchanges
    * below the final ORDER BY, while both sides ALSO do their
    * per-group base+delta merge inside the readers. At 100 TB this is
    * the difference between moving two tables over the network and
    * moving nothing. Shuffle-free shape asserted in Round10Spec. */
  def qSpjJoin(spark: SparkSession, dir: String): DataFrame = {
    val wh = freshRoot("ev_spj_wh")
    val cat = s"gcat_l19_${catalogSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val ev = events(spark, dir)
    def mk(name: String, df: DataFrame): Unit = {
      val t = GraftTable.create(spark, s"$wh/$name", cfg(name, TableConfig.Mor))
      t.insert(df.filter(col("event_id") % 2 === 0))
      t.upsert(df.filter(col("event_id") % 2 === 1)) // live delta files
      require(t.log.liveFiles().exists(_.delta), "gate needs live deltas")
    }
    mk("ev_spj_a", ev)
    mk("ev_spj_b", ev.withColumn("value", col("value") * 2))
    spark.sql(
      s"""SELECT a.event_type, a.user_id, a.event_id, a.ts DIV 1000 AS ts_us,
         |       a.value + b.value AS v3
         |FROM $cat.ev_spj_a a JOIN $cat.ev_spj_b b
         |  ON a.event_type = b.event_type AND a.user_id = b.user_id
         |ORDER BY a.event_type, a.user_id""".stripMargin)
  }

  private val spjJoinSql =
    """WITH w AS (
      |  SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY event_type, user_id
      |          ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |        FROM events) WHERE rn = 1)
      |SELECT a.event_type, a.user_id, a.event_id, a.ts_us,
      |       a.value + 2 * b.value AS v3
      |FROM w a JOIN w b
      |  ON a.event_type = b.event_type AND a.user_id = b.user_id
      |ORDER BY a.event_type, a.user_id""".stripMargin

  // ---- §2.9+ incremental materialized-view maintenance --------------

  /** An aggregate MV (count + exact decimal sum per event_type) over
    * the events table, maintained INCREMENTALLY: full compute at the
    * first commit, then each refresh consumes only that range's
    * pre-image CDC rows (`readCdc(withPreimages = true)`) — +after
    * −before — and upserts the touched groups into the MV's own graft
    * table. The base table is never rescanned after the first build;
    * the upsert wave AND a partition-wide delete flow through as
    * retractions (the deleted partition's MV row disappears). Oracle =
    * DuckDB recomputing the aggregate from scratch over the final
    * state — incremental maintenance must be bit-identical. */
  def qIncrementalMv(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalMv
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_mv_base"),
      cfg("ev_mv_base", TableConfig.Cow))
    val mv = GraftTable.create(spark, freshRoot("ev_mv"), TableConfig(
      name = "ev_mv", keyField = "event_type", orderingField = "_refreshed",
      partitionField = None, tableType = TableConfig.Cow, numBuckets = 2))
    val c1 = t.insert(ev.filter(col("event_id") % 2 === 0))
    mv.insert(IncrementalMv.fullAggregate(t.read(), "event_type", "value")
      .withColumn("_refreshed", lit(0L)))
    // refresh 1: the upsert wave (updates + inserts)
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    val c2 = t.log.snapshot().commits.last.instant
    IncrementalMv.refresh(spark, mv,
      t.readCdc(c1, withPreimages = true), "event_type", "value")
    // refresh 2: a partition-wide delete retracts the whole group
    t.deleteWhere(col("event_type") === "click")
    IncrementalMv.refresh(spark, mv,
      t.readCdc(c2, withPreimages = true), "event_type", "value")
    mv.read()
      .select(col("event_type"), col("cnt"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  private val incrementalMvSql =
    """WITH w AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (
      |      PARTITION BY event_type, user_id
      |      ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |    FROM events) WHERE rn = 1)
      |SELECT event_type, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w WHERE event_type <> 'click'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- T3+ restore to a savepoint -----------------------------------

  /** Hudi savepoint/restore: after the upsert wave, restore the table
    * to its first-commit snapshot. The restore is ONE new replace
    * commit (history never rewritten — time travel across it keeps
    * working), so the live read afterwards equals batch₁'s
    * latest-wins state; the oracle is the same window dedup l2/l18
    * use. Incremental consumers refuse to cross the restore
    * (cursor-reset contract, spec'd in core). */
  def qRestore(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_restore"),
      cfg("ev_restore", TableConfig.Cow))
    val c1 = t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    graft.core.TableServices.restore(t, c1)
    out(t.read())
  }

  private val restoreSql = oracleMerge(" WHERE event_id % 2 = 0", tieBreak = false)

  // ---- §3.1+ Streamer with a chained SQL transformer ----------------

  /** The reference's custom-transformation surface (onehouse-pov
    * "ETL/ELT Transformations" — the Streamer `--transformer-class`
    * family) end to end: a parquet directory source drained through
    * `Transformers.chain(normalizeTs, sql("… value * 2 …"))` into a
    * graft table. The SQL transformer is plan-to-plan (`<SRC>` = the
    * micro-batch), so Catalyst optimizes transformer + source read +
    * write routing as ONE plan. Oracle = latest-wins over events with
    * the doubled value. */
  def qStreamerTransform(spark: SparkSession, dir: String): DataFrame = {
    import graft.ingest.{ParquetDirSource, Streamer, Transformers}
    val srcDir = freshRoot("ev_tsrc")
    val dst = java.nio.file.Paths.get(srcDir, "events.parquet")
    try java.nio.file.Files.createLink(dst, java.nio.file.Paths.get(dir, "events.parquet"))
    catch { case _: java.io.IOException =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"), dst); () }
    val t = GraftTable.create(spark, freshRoot("ev_tx"),
      cfg("ev_tx", TableConfig.Cow))
    val source = new ParquetDirSource(spark, srcDir,
      s"${freshRoot("ev_tckpt")}/ckpt")
    Streamer.runUntilCaughtUp(t, source, transform = Transformers.chain(
      Tables.normalizeTs,
      Transformers.sql(
        "SELECT event_id, ts, user_id, event_type, value * 2 AS value, props FROM <SRC>")))
    out(t.read())
  }

  private val streamerTransformSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us,
      |       value * 2 AS value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY event_type, user_id""".stripMargin

  // ---- §2.9+ CDC through SQL: CALL table_changes --------------------

  /** l11's row-level CDC scenario surfaced through the SQL procedure
    * layer — `CALL table_changes(table => …, from_instant => …)`, the
    * Delta `table_changes` TVF analog. Same net-change semantics and
    * oracle as the API gate; the statement path is what's under test. */
  def qCdcSql(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val wh = freshRoot("ev_cdcsql_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(cfg("ev_cdcsql", TableConfig.Cow))
    val c1 = t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    t.deleteWhere(col("event_type") === "click")
    gsql.sql(s"CALL table_changes(table => 'ev_cdcsql', from_instant => '$c1')")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("_change_type", "event_type", "user_id", "event_id", "ts_us", "value")
      .orderBy("event_type", "user_id")
  }

  // ---- D10+ MERGE full-sync: WHEN NOT MATCHED BY SOURCE (l24) -------

  /** The Delta-SQL full-table-sync MERGE: UPDATE SET * for matched
    * keys composed with WHEN NOT MATCHED BY SOURCE THEN DELETE for
    * target keys the source no longer carries — one statement
    * reconciles the table to the source relation. Exercises all three
    * engine paths in one commit sequence: the stats-pruned key probe,
    * the upsert write, and the complement-key delete.
    *
    * Source = the latest-wins state of users with `user_id % 3 <> 0`,
    * value bumped by +1000 (the marker proving the UPDATE branch ran,
    * exact in IEEE for 2-decimal doubles); ties at equal ts resolve to
    * the source row because its commit is newer — the same tiebreak
    * batch₂ wins in l1. Users with `user_id % 3 = 0` vanish via the
    * BY SOURCE delete. */
  def qMergeFullSync(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val wh = freshRoot("ev_mrgsync_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(cfg("ev_mrgsync", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    ev.createOrReplaceTempView("l24_events_src")
    gsql.sql(
      """MERGE INTO ev_mrgsync USING (
        |  SELECT event_id, ts, user_id, event_type, value + 1000.0 AS value, props
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY event_type, user_id
        |          ORDER BY ts DESC, (event_id % 2) DESC) AS rn
        |        FROM l24_events_src WHERE user_id % 3 <> 0)
        |  WHERE rn = 1) AS s
        |ON s.user_id = ev_mrgsync.user_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    out(t.read())
  }

  private val mergeFullSyncSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us,
      |       value + 1000.0 AS value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id
      |        ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events WHERE user_id % 3 <> 0)
      |WHERE rn = 1 ORDER BY event_type, user_id""".stripMargin

  // ---- S9+ partial-update upsert payload (l25) ----------------------

  /** Hudi `PartialUpdateAvroPayload` semantics through the write path:
    * batch₂ arrives pre-deduped to ONE row per key, with `value`
    * NULLED on half the keys (`event_id % 4 = 1`) — "advance
    * event_id/ts but keep the stored value". Keys where the incoming
    * ordering is OLDER than the stored row lose wholesale (payload
    * contract); keys without a stored row insert as-is, null value
    * included. The MOR twin of this operator shares the same code
    * path (the patch reads a latest-wins merge of base+delta), spec-
    * covered in Round14Spec; the gate runs COW. */
  def qPartialUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_partial"),
      cfg("ev_partial", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "user_id").orderBy(col("ts").desc)
    val b2 = ev.filter(col("event_id") % 2 === 1)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("value",
        when(col("event_id") % 4 === 1, lit(null).cast("double"))
          .otherwise(col("value")))
    t.upsertPartial(b2)
    out(t.read())
  }

  /** DuckDB twin: e1 = latest-wins over batch₁; b2 = the same pre-
    * deduped partial batch; winner-per-key decided on ordering with
    * the newer-commit tiebreak (>=); a winning partial row COALESCEs
    * its nulled value from e1. */
  private val partialUpsertSql =
    """WITH e1 AS (
      |  SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY event_type, user_id ORDER BY ts DESC) AS rn
      |        FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
      |b2 AS (
      |  SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us,
      |         CASE WHEN event_id % 4 = 1 THEN NULL ELSE value END AS value
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY event_type, user_id ORDER BY ts DESC) AS rn
      |        FROM events WHERE event_id % 2 = 1) WHERE rn = 1)
      |SELECT event_type, user_id,
      |  CASE WHEN b2.ts_us IS NOT NULL AND (e1.ts_us IS NULL OR b2.ts_us >= e1.ts_us)
      |       THEN b2.event_id ELSE e1.event_id END AS event_id,
      |  CASE WHEN b2.ts_us IS NOT NULL AND (e1.ts_us IS NULL OR b2.ts_us >= e1.ts_us)
      |       THEN b2.ts_us ELSE e1.ts_us END AS ts_us,
      |  CASE WHEN b2.ts_us IS NOT NULL AND (e1.ts_us IS NULL OR b2.ts_us >= e1.ts_us)
      |       THEN coalesce(b2.value, e1.value) ELSE e1.value END AS value
      |FROM e1 FULL OUTER JOIN b2 USING (event_type, user_id)
      |ORDER BY event_type, user_id""".stripMargin

  // ---- D11+ ALTER TABLE DROP COLUMN (l26) ----------------------------

  /** Schema narrowing mid-lifecycle: insert batch₁ (with `value`),
    * DROP COLUMN value through the SQL dialect, then upsert batch₂
    * (which no longer carries it). The drop is a zero-row commit — no
    * file rewritten — and the post-drop merge runs on the narrowed
    * schema. Pre-drop files still hold the bytes; reads hide them by
    * name, and the retired-name guard keeps them unreachable
    * (Round14Spec covers refusal + time travel). */
  def qDropColumn(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val wh = freshRoot("ev_dropcol_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(cfg("ev_dropcol", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    gsql.sql("ALTER TABLE ev_dropcol DROP COLUMN value")
    t.upsert(ev.filter(col("event_id") % 2 === 1).drop("value"))
    t.read()
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("event_type", "user_id", "event_id", "ts_us")
      .orderBy("event_type", "user_id")
  }

  private val dropColumnSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY event_type, user_id""".stripMargin

  // ---- T3 cleaning through the oracle gate (l27) ---------------------

  /** Cleaning must be CONTENT-INVISIBLE: after insert + upsert +
    * delete and an aggressive `clean(retainCommits = 1)` that
    * physically deletes every superseded file version, the snapshot
    * still matches the oracle merge exactly. What cleaning changes —
    * old versions gone from disk, time travel past the horizon
    * refused — is asserted in Round14Spec; what it must never change
    * is asserted here. */
  def qClean(spark: SparkSession, dir: String): DataFrame = {
    val t = build(spark, dir, "ev_clean", TableConfig.Cow)
    t.deleteWhere(col("event_type") === "error")
    TableServices.clean(t, retainCommits = 1)
    out(t.read())
  }

  private val cleanSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us, value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY event_type, user_id""".stripMargin

  // ---- T6+ snapshot export (l28) -------------------------------------

  /** Hudi snapshot-exporter analog: the MOR table's realtime-merged
    * state exported as plain hive-partitioned parquet, then read back
    * with a BARE `spark.read.parquet` — no commit log, no engine — and
    * compared against the oracle merge. Proves the handoff format a
    * non-graft consumer would load. */
  def qSnapshotExport(spark: SparkSession, dir: String): DataFrame = {
    val t = build(spark, dir, "ev_export", TableConfig.Mor)
    val dest = freshRoot("ev_export_out")
    TableServices.exportSnapshot(t, dest)
    out(spark.read.parquet(dest))
  }

  // ---- T6++ foreign-reader Delta verification (l29) -----------------

  /** Where the l29 table lands. The oracle SQL is a STATIC string, so
    * the table must live at a deterministic absolute path; the query
    * resets it on every run (idempotent). Deliberately outside the
    * `graft-` temp prefix: the shutdown hook must NOT delete it before
    * the driver's DuckDB pass runs in a separate process. */
  private val foreignDeltaRoot = "/tmp/graft_xtable_l29"

  /** The xTable claim verified by a genuinely FOREIGN reader. The
    * engine builds the COW table and emits the Delta log
    * ([[graft.interop.XTableSync.syncDelta]]); the ORACLE side mounts
    * it with no graft code at all — DuckDB replays the
    * `_delta_log` JSON versions via read_json to resolve the live
    * file set (add minus remove), then scans exactly those parquet
    * files.
    * Superseded file versions still sit under `data/`, so the oracle
    * only matches if the emitted metadata selects the correct subset —
    * the same reconstruction Trino/Spark-Delta perform when mounting
    * the synced table (reference xtable.md:54-59 register_table +
    * query flow, demo.ipynb cells 6-18). */
  def qDeltaForeignRead(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(foreignDeltaRoot))
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, foreignDeltaRoot,
      cfg("ev_delta_foreign", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    graft.interop.XTableSync.syncDelta(t)
    out(t.read())
  }

  private val deltaForeignSql =
    s"""WITH acts AS (
       |  SELECT * FROM read_json_auto('$foreignDeltaRoot/_delta_log/*.json',
       |                               format='newline_delimited', sample_size=-1)),
       |live AS (
       |  SELECT "add".path AS path FROM acts WHERE "add" IS NOT NULL
       |  EXCEPT
       |  SELECT "remove".path FROM acts WHERE "remove" IS NOT NULL),
       |f AS (
       |  SELECT event_type, user_id, event_id, ts, value, filename
       |  FROM read_parquet('$foreignDeltaRoot/data/**/*.parquet',
       |                    filename=true, hive_partitioning=false,
       |                    union_by_name=true))
       |SELECT event_type, user_id, event_id, ts // 1000 AS ts_us, value
       |FROM f JOIN live ON f.filename = '$foreignDeltaRoot/' || live.path
       |ORDER BY event_type, user_id""".stripMargin

  // ---- T6++ checkpointed Delta log verification (l34) ----------------

  /** Fixed root, same reason as l29: the oracle SQL is static. */
  private val checkpointDeltaRoot = "/tmp/graft_xtable_l34"

  /** The Delta LOG-RETENTION flow verified by a foreign reader: the
    * engine exports two versions, writes a single-part CHECKPOINT
    * ([[graft.interop.XTableSync.checkpointDelta]] — the public Delta
    * checkpoint protocol: one parquet of reconciled actions +
    * `_last_checkpoint`), exports one more version, then EXPIRES the
    * JSON commits the checkpoint covers
    * ([[graft.interop.XTableSync.expireDeltaLog]]). The oracle mounts
    * what a real post-retention `_delta_log` looks like with no graft
    * code: live set = checkpoint adds ∪ later-JSON adds ∖ later-JSON
    * removes. Without checkpointing, a long-lived export accumulates
    * an O(commits) JSON chain that every foreign mount must replay —
    * the 100 TB operational path is checkpoint + expire. */
  def qDeltaCheckpointRead(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(checkpointDeltaRoot))
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, checkpointDeltaRoot,
      cfg("ev_delta_checkpoint", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 3 === 0))
    t.upsert(ev.filter(col("event_id") % 3 === 1))
    graft.interop.XTableSync.syncDelta(t) // v0, v1
    graft.interop.XTableSync.checkpointDelta(spark, checkpointDeltaRoot)
    t.upsert(ev.filter(col("event_id") % 3 === 2)) // rewrites buckets →
    graft.interop.XTableSync.syncDelta(t) // v2 carries adds AND removes
    graft.interop.XTableSync.expireDeltaLog(checkpointDeltaRoot)
    out(t.read())
  }

  private val deltaCheckpointSql =
    s"""WITH cp AS (
       |  SELECT * FROM read_parquet(
       |    '$checkpointDeltaRoot/_delta_log/*.checkpoint.parquet')),
       |acts AS (
       |  SELECT * FROM read_json_auto('$checkpointDeltaRoot/_delta_log/*.json',
       |                               format='newline_delimited', sample_size=-1)),
       |live AS (
       |  SELECT "add".path AS path FROM cp WHERE "add" IS NOT NULL
       |  UNION
       |  SELECT "add".path FROM acts WHERE "add" IS NOT NULL
       |  EXCEPT
       |  SELECT "remove".path FROM acts WHERE "remove" IS NOT NULL),
       |f AS (
       |  SELECT event_type, user_id, event_id, ts, value, filename
       |  FROM read_parquet('$checkpointDeltaRoot/data/**/*.parquet',
       |                    filename=true, hive_partitioning=false,
       |                    union_by_name=true))
       |SELECT event_type, user_id, event_id, ts // 1000 AS ts_us, value
       |FROM f JOIN live ON f.filename = '$checkpointDeltaRoot/' || live.path
       |ORDER BY event_type, user_id""".stripMargin

  // ---- lakehouse↔pipeline bridge: in-table exact dedup (l35) ----------

  /** [[TableServices.dedupExact]] end to end — "dedup the corpus" as a
    * TABLE SERVICE whose outcome rides the timeline: a documents
    * corpus with PLANTED exact duplicates (a negative-id copy of every
    * 7th doc, so the canonical-min keep rule picks the PLANTED copy
    * and the survivors genuinely differ from the input) is bulk-loaded
    * into a graft table, curated in place, and read back. The
    * duplicates leave through the table's own delete path — time
    * travel still shows the pre-curation state, incremental consumers
    * see ordinary tombstones. The oracle replays plant + md5-group +
    * keep-min in SQL over the same parquet. */
  def qTableDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "n_chars")
    val planted = docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", -col("doc_id") - 1))
    val t = GraftTable.create(spark, freshRoot("doc_curated"),
      TableConfig(name = "doc_curated", keyField = "doc_id",
        orderingField = "doc_id", numBuckets = 2))
    t.bulkInsert(planted)
    TableServices.dedupExact(t, "text")
    t.read()
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  private val tableDedupSql =
    """WITH p AS (
      |  SELECT doc_id, text, n_chars FROM documents
      |  UNION ALL
      |  SELECT -doc_id - 1, text, n_chars FROM documents
      |  WHERE doc_id % 7 = 0),
      |k AS (SELECT md5(text) AS h, min(doc_id) AS keeper FROM p GROUP BY 1)
      |SELECT p.doc_id, CAST(p.n_chars AS BIGINT) AS n_chars
      |FROM p JOIN k ON md5(p.text) = k.h AND p.doc_id = k.keeper
      |ORDER BY doc_id""".stripMargin

  /** Fuzzy sibling of l35 ([[TableServices.dedupFuzzy]]): the fixture
    * corpus carries REAL near-duplicates at Jaccard ≥ 0.7 (the p3/p13
    * family's), so no planting is needed — MinHash-LSH pairs →
    * transitive closure → keep-min, victims deleted through the table.
    * The oracle reuses the p13 exact-Jaccard closure CTEs (the
    * operator's band-bucketed path equals exact Jaccard at these
    * parameters, the standing p3 contract) and keeps each cluster's
    * least member plus every unclustered doc. */
  def qTableDedupFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "n_chars")
    val t = GraftTable.create(spark, freshRoot("doc_fuzzy"),
      TableConfig(name = "doc_fuzzy", keyField = "doc_id",
        orderingField = "doc_id", numBuckets = 2))
    t.bulkInsert(docs)
    TableServices.dedupFuzzy(t, "text")
    t.read()
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  private val tableDedupFuzzySql = PipelineQueries.closureCtes + ",\n" +
    """cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |       FROM reach GROUP BY a)
      |SELECT d.doc_id AS doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
      |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
      |WHERE cl.doc_id IS NULL OR cl.cluster_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- vector search on the SQL surface (l37) --------------------------

  /** `CALL vector_search` end to end — retrieval over the
    * table-service IVF index, reachable from SQL: the embeddings
    * corpus bulk-loads into a graft table, the CALL builds/refreshes
    * the index on the snapshot stamp, probes at FULL probe (exact),
    * restricts CANDIDATES with the `filter` predicate (pushed below
    * ranking — the filtered-retrieval contract), and returns per-query
    * ranked cosine neighbors. Oracle = brute-force filtered cosine
    * top-k over the same parquet: full probe must equal it exactly,
    * scores included ([[graft.functions.CosineSim]]'s fold is the
    * oracle's list_sum arithmetic). */
  def qVectorSearchSql(spark: SparkSession, dir: String): DataFrame = {
    val embs = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val wh = freshRoot("emb_vsearch_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(TableConfig(name = "emb_vs",
      keyField = "vec_id", orderingField = "vec_id", numBuckets = 2))
    t.bulkInsert(embs)
    gsql.sql("CALL vector_search(table => 'emb_vs', id_col => 'vec_id', " +
        "vec_col => 'embedding', k => 5, n_lists => 8, " +
        "query_where => 'vec_id < 10', filter => 'vec_id % 3 = 0')")
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  // ---- T6++ Iceberg v2 position-delete READ (l39) -----------------------

  /** Fixed root, same reason as l29/l31: the oracle SQL is static. */
  private val posDeleteRoot = "/tmp/graft_xtable_l39"

  private def writeOneSorted(df: DataFrame, sortCol: String,
      dest: java.nio.file.Path): Unit = {
    val tmpd = s"$dest.tmp"
    df.repartition(1).sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(tmpd)
    val part = graft.util.Fs.list(java.nio.file.Paths.get(tmpd))(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(part, dest)
    graft.util.TempDirs.deleteRecursively(java.nio.file.Paths.get(tmpd))
  }

  private def writeAvro(path: java.nio.file.Path, schemaJson: String,
      rows: Seq[Map[String, Any]]): Unit = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    def rec(s: org.apache.avro.Schema, m: Map[String, Any]): GenericRecord = {
      val r = new GenericData.Record(s)
      m.foreach {
        case (k, sub: Map[_, _]) =>
          r.put(k, rec(s.getField(k).schema(), sub.asInstanceOf[Map[String, Any]]))
        case (k, v) => r.put(k, v)
      }
      r
    }
    rows.foreach(m => w.append(rec(schema, m)))
    w.close()
  }

  private val l39ManifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int"}]}""".stripMargin
  private val l39ManifestSchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"content","type":"int"}]}}]}""".stripMargin

  /** The foreign-read leg REAL Flink/Spark-written Iceberg v2 tables
    * exercise constantly: merge-on-read POSITION deletes. The fixture
    * forges a v2 tree — two sorted data files (even/odd event_id) plus
    * a position-delete parquet ((file_path, pos) tuples) under a
    * DELETE manifest (manifest-list content=1) — and the engine's
    * [[graft.interop.XTableSync.readIceberg]] must apply the deletes
    * by (file, row-ordinal) anti-join. The DuckDB oracle resolves the
    * SAME fixture independently via read_parquet(filename,
    * file_row_number): the gate matches only if delete-manifest
    * routing, position semantics (0-based file ordinal), and path
    * normalization are all correct. Equality deletes stay refused
    * (Round27Spec). */
  def qIcebergPosDelete(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(posDeleteRoot))
    val ev = events(spark, dir).select(
      col("event_id"), col("event_type"), col("value"))
    val metaDir = java.nio.file.Paths.get(posDeleteRoot, "metadata")
    java.nio.file.Files.createDirectories(metaDir)
    val fA = java.nio.file.Paths.get(posDeleteRoot, "data", "fA.parquet")
    val fB = java.nio.file.Paths.get(posDeleteRoot, "data", "fB.parquet")
    writeOneSorted(ev.filter(col("event_id") % 2 === 0), "event_id", fA)
    writeOneSorted(ev.filter(col("event_id") % 2 === 1), "event_id", fB)
    val delFile = java.nio.file.Paths.get(posDeleteRoot, "deletes", "pd.parquet")
    import spark.implicits._
    writeOneSorted(Seq(
        (fA.toString, 0L), (fA.toString, 3L), (fA.toString, 5L),
        (fA.toString, 10L), (fA.toString, 20L),
        (fB.toString, 1L), (fB.toString, 2L), (fB.toString, 30L))
      .toDF("file_path", "pos"), "pos", delFile)
    val dataMan = metaDir.resolve("m-data.avro")
    writeAvro(dataMan, l39ManifestSchema, Seq(fA, fB).map(f => Map(
      "status" -> Int.box(1),
      "data_file" -> Map("file_path" -> f.toString, "content" -> Int.box(0)))))
    val delMan = metaDir.resolve("m-del.avro")
    writeAvro(delMan, l39ManifestSchema, Seq(Map(
      "status" -> Int.box(1),
      "data_file" -> Map("file_path" -> delFile.toString,
        "content" -> Int.box(1)))))
    val list = metaDir.resolve("snap-1.avro")
    writeAvro(list, l39ManifestListSchema, Seq(
      Map("manifest_path" -> dataMan.toString, "content" -> Int.box(0)),
      Map("manifest_path" -> delMan.toString, "content" -> Int.box(1))))
    java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"),
      s"""{"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$list"}]}""".stripMargin)
    graft.interop.XTableSync.readIceberg(spark, posDeleteRoot)
      .orderBy("event_id", "event_type")
  }

  private val icebergPosDeleteSql =
    s"""WITH d AS (
       |  SELECT event_id, event_type, value, filename, file_row_number
       |  FROM read_parquet('$posDeleteRoot/data/*.parquet',
       |                    filename=true, file_row_number=true)),
       |del AS (SELECT file_path, pos
       |        FROM read_parquet('$posDeleteRoot/deletes/*.parquet'))
       |SELECT event_id, event_type, value FROM d
       |WHERE NOT EXISTS (SELECT 1 FROM del
       |  WHERE del.file_path = d.filename AND del.pos = d.file_row_number)
       |ORDER BY event_id, event_type""".stripMargin

  // ---- T6++ Iceberg v2 equality-delete READ (l41) -----------------------

  /** Fixed root, same reason as l39: the oracle SQL is static. */
  private val eqDeleteRoot = "/tmp/graft_xtable_l41"

  private val l41ManifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"}]}""".stripMargin
  private val l41ManifestSchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"content","type":"int"},
      |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],
      |"default":null}]}}]}""".stripMargin

  /** The foreign-read leg Flink CDC pipelines exercise constantly:
    * Iceberg v2 merge-on-read EQUALITY deletes (data_file content=2).
    * The fixture forges a v2 tree with real SEQUENCE NUMBERS:
    *  - fA (seq 1): even event_ids;
    *  - eq1 (seq 2, equality_ids=[event_id]): deletes event_id%10=0 —
    *    applies to fA only (1 < 2);
    *  - fB (seq 3): odd event_ids PLUS event_id%20=0 RE-INSERTED with
    *    value+1000 — the re-inserts survive eq1 (3 > 2, the spec's
    *    strictly-smaller ordering a naive join-all would violate);
    *  - eq2 (seq 4, equality_ids=[event_type]): deletes the
    *    alphabetically-first event_type from BOTH files (1,3 < 4).
    * [[graft.interop.XTableSync.readIceberg]] must group the deletes
    * by equality_ids set, resolve field ids through the metadata
    * schema, and anti-join each group with the sequence comparison.
    * The DuckDB oracle recomputes the post-delete state independently
    * from the same parquet files. Reference analog: the Iceberg leg of
    * xTable (xtable/xtable_iceberg.yaml:17-24). */
  def qIcebergEqDelete(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(eqDeleteRoot))
    val ev = events(spark, dir).select(
      col("event_id"), col("event_type"), col("value"))
    val metaDir = java.nio.file.Paths.get(eqDeleteRoot, "metadata")
    java.nio.file.Files.createDirectories(metaDir)
    val fA = java.nio.file.Paths.get(eqDeleteRoot, "data", "fA.parquet")
    val fB = java.nio.file.Paths.get(eqDeleteRoot, "data", "fB.parquet")
    writeOneSorted(ev.filter(col("event_id") % 2 === 0), "event_id", fA)
    writeOneSorted(
      ev.filter(col("event_id") % 2 === 1).unionByName(
        ev.filter(col("event_id") % 20 === 0)
          .withColumn("value", col("value") + 1000.0)),
      "event_id", fB)
    val eq1 = java.nio.file.Paths.get(eqDeleteRoot, "deletes", "eq1.parquet")
    val eq2 = java.nio.file.Paths.get(eqDeleteRoot, "deletes", "eq2.parquet")
    writeOneSorted(ev.filter(col("event_id") % 10 === 0)
      .select("event_id").distinct(), "event_id", eq1)
    writeOneSorted(ev.select("event_type").distinct()
      .orderBy("event_type").limit(1), "event_type", eq2)
    val dataMan = metaDir.resolve("m-data.avro")
    writeAvro(dataMan, l41ManifestSchema, Seq(
      Map("status" -> Int.box(1), "sequence_number" -> Long.box(1L),
        "data_file" -> Map(
          "file_path" -> fA.toString, "content" -> Int.box(0))),
      Map("status" -> Int.box(1), "sequence_number" -> Long.box(3L),
        "data_file" -> Map(
          "file_path" -> fB.toString, "content" -> Int.box(0)))))
    val delMan = metaDir.resolve("m-del.avro")
    writeAvro(delMan, l41ManifestSchema, Seq(
      Map("status" -> Int.box(1), "sequence_number" -> Long.box(2L),
        "data_file" -> Map("file_path" -> eq1.toString,
          "content" -> Int.box(2),
          "equality_ids" -> java.util.Arrays.asList(Int.box(1)))),
      Map("status" -> Int.box(1), "sequence_number" -> Long.box(4L),
        "data_file" -> Map("file_path" -> eq2.toString,
          "content" -> Int.box(2),
          "equality_ids" -> java.util.Arrays.asList(Int.box(2))))))
    val list = metaDir.resolve("snap-1.avro")
    writeAvro(list, l41ManifestListSchema, Seq(
      Map("manifest_path" -> dataMan.toString, "content" -> Int.box(0),
        "sequence_number" -> Long.box(3L)),
      Map("manifest_path" -> delMan.toString, "content" -> Int.box(1),
        "sequence_number" -> Long.box(4L))))
    java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"),
      s"""{"current-snapshot-id":1,"current-schema-id":0,
         |"schemas":[{"schema-id":0,"type":"struct","fields":[
         |{"id":1,"name":"event_id","required":true,"type":"long"},
         |{"id":2,"name":"event_type","required":false,"type":"string"},
         |{"id":3,"name":"value","required":false,"type":"double"}]}],
         |"snapshots":[{"snapshot-id":1,"manifest-list":"$list"}]}""".stripMargin)
    graft.interop.XTableSync.readIceberg(spark, eqDeleteRoot)
      .orderBy("event_id", "event_type", "value")
  }

  private val icebergEqDeleteSql =
    s"""WITH fa AS (SELECT event_id, event_type, value, 1 AS seq
       |            FROM read_parquet('$eqDeleteRoot/data/fA.parquet')),
       |fb AS (SELECT event_id, event_type, value, 3 AS seq
       |       FROM read_parquet('$eqDeleteRoot/data/fB.parquet')),
       |d AS (SELECT * FROM fa UNION ALL SELECT * FROM fb)
       |SELECT event_id, event_type, value FROM d
       |WHERE NOT (seq < 2 AND event_id IN (SELECT event_id
       |  FROM read_parquet('$eqDeleteRoot/deletes/eq1.parquet')))
       |  AND NOT (seq < 4 AND event_type IN (SELECT event_type
       |  FROM read_parquet('$eqDeleteRoot/deletes/eq2.parquet')))
       |ORDER BY event_id, event_type, value""".stripMargin

  // ---- T6++ Iceberg incremental READ (l45) ------------------------------

  /** Fixed root, same reason as l39/l41: the oracle SQL is static. */
  private val iceChangesRoot = "/tmp/graft_xtable_l45"

  /** Foreign Iceberg INCREMENTAL read — the l44 twin: three metadata
    * versions (v1 appends fA, v2 appends fB, v3 position-deletes the
    * event_id % 10 = 0 rows of fA — the MOR delete shape), and
    * [[graft.interop.XTableSync.readIcebergChanges]] must classify
    * each step from the file-set diff alone: appended files as
    * inserts, new delete files as the referenced rows read back as
    * deletes. The fixture derives the delete positions through
    * `_metadata.row_index`; the DuckDB oracle re-derives every
    * version's change rows from the predicates independently. */
  def qIcebergChanges(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(iceChangesRoot))
    val ev = events(spark, dir).select(
      col("event_id"), col("event_type"), col("value"))
    val metaDir = java.nio.file.Paths.get(iceChangesRoot, "metadata")
    java.nio.file.Files.createDirectories(metaDir)
    val fA = java.nio.file.Paths.get(iceChangesRoot, "data", "fA.parquet")
    val fB = java.nio.file.Paths.get(iceChangesRoot, "data", "fB.parquet")
    writeOneSorted(ev.filter(col("event_id") % 2 === 0), "event_id", fA)
    writeOneSorted(ev.filter(col("event_id") % 2 === 1), "event_id", fB)
    import spark.implicits._
    val pd = java.nio.file.Paths.get(iceChangesRoot, "deletes", "pd.parquet")
    writeOneSorted(
      spark.read.parquet(fA.toString)
        .where(col("event_id") % 10 === 0)
        .select(lit(fA.toString).as("file_path"),
          col("_metadata.row_index").as("pos")),
      "pos", pd)
    def dataMan(name: String, files: Seq[java.nio.file.Path]) = {
      val p = metaDir.resolve(name)
      writeAvro(p, l39ManifestSchema, files.map(f => Map(
        "status" -> Int.box(1),
        "data_file" -> Map("file_path" -> f.toString,
          "content" -> Int.box(0)))))
      p
    }
    val mA = dataMan("m-a.avro", Seq(fA))
    val mB = dataMan("m-b.avro", Seq(fB))
    val mDel = metaDir.resolve("m-del.avro")
    writeAvro(mDel, l39ManifestSchema, Seq(Map(
      "status" -> Int.box(1),
      "data_file" -> Map("file_path" -> pd.toString,
        "content" -> Int.box(1)))))
    def version(v: Long, dataMans: Seq[java.nio.file.Path],
        delMans: Seq[java.nio.file.Path]): Unit = {
      val list = metaDir.resolve(s"snap-$v.avro")
      writeAvro(list, l39ManifestListSchema,
        dataMans.map(m => Map[String, Any](
          "manifest_path" -> m.toString, "content" -> Int.box(0))) ++
        delMans.map(m => Map[String, Any](
          "manifest_path" -> m.toString, "content" -> Int.box(1))))
      java.nio.file.Files.writeString(metaDir.resolve(s"v$v.metadata.json"),
        s"""{"current-snapshot-id":$v,"snapshots":[
           |{"snapshot-id":$v,"manifest-list":"$list"}]}""".stripMargin)
      ()
    }
    version(1L, Seq(mA), Nil)
    version(2L, Seq(mA, mB), Nil)
    version(3L, Seq(mA, mB), Seq(mDel))
    graft.interop.XTableSync.readIcebergChanges(spark, iceChangesRoot, 1L)
      .orderBy("_commit_version", "event_id", "event_type")
  }

  private val icebergChangesSql =
    s"""WITH fa AS (SELECT event_id, event_type, value
       |            FROM read_parquet('$iceChangesRoot/data/fA.parquet')),
       |fb AS (SELECT event_id, event_type, value
       |       FROM read_parquet('$iceChangesRoot/data/fB.parquet')),
       |d AS (
       |  SELECT event_id, event_type, value,
       |         'insert' AS _change_type, 1 AS _commit_version FROM fa
       |  UNION ALL SELECT event_id, event_type, value, 'insert', 2 FROM fb
       |  UNION ALL SELECT event_id, event_type, value, 'delete', 3
       |  FROM fa WHERE event_id % 10 = 0)
       |SELECT event_id, event_type, value, _change_type,
       |       CAST(_commit_version AS BIGINT) AS _commit_version
       |FROM d
       |ORDER BY _commit_version, event_id, event_type""".stripMargin

  // ---- T6++ Delta deletion-vector READ (l42) ----------------------------

  /** Fixed root, same reason as l39/l41: the oracle SQL is static. */
  private val deltaDvRoot = "/tmp/graft_xtable_l42"

  /** Delta deletion vectors on the foreign-read path — the row-level
    * deletes modern Delta writers attach BY DEFAULT (protocol
    * (3, readerFeatures=[deletionVectors])). The fixture forges a real
    * DV table per the public Delta protocol: two data files; fA
    * carries a storageType=u DV (framed `.bin` under a random prefix —
    * z85 uuid name derivation, big-endian size word, CRC32) deleting
    * rows where event_id % 20 = 0; fB an INLINE (storageType=i) DV
    * deleting rows where event_id % 7 = 0. The DV ordinals are derived
    * through Spark's `_metadata.row_index` over the written files and
    * round-trip the full portable-roaring encode → z85/frame → decode
    * pipeline; the DuckDB oracle re-derives the surviving rows from
    * the predicates alone — the two agree only if the ordinal mapping
    * is exact. Reference analog: the Delta leg of xTable
    * (xtable/xtable_delta.yaml). */
  def qDeltaDv(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(deltaDvRoot))
    val ev = events(spark, dir).select(
      col("event_id"), col("event_type"), col("value"))
    val fA = java.nio.file.Paths.get(deltaDvRoot, "data-a.parquet")
    val fB = java.nio.file.Paths.get(deltaDvRoot, "data-b.parquet")
    writeOneSorted(ev.filter(col("event_id") % 2 === 0), "event_id", fA)
    writeOneSorted(ev.filter(col("event_id") % 2 === 1), "event_id", fB)
    def ords(f: java.nio.file.Path,
        pred: org.apache.spark.sql.Column): Seq[Long] =
      spark.read.parquet(f.toString)
        .select(col("_metadata.row_index").as("ri")).where(pred)
        .orderBy("ri").collect().map(_.getLong(0)).toSeq
    import graft.interop.DeltaDv
    // fA: storageType=u — the framed on-disk blob under prefix "ab"
    val ordsA = ords(fA, col("event_id") % 20 === 0)
    val bmA = DeltaDv.encodeBitmap(ordsA)
    val (blobA, offA) = DeltaDv.frameFile(bmA)
    val uuid = java.util.UUID.fromString(
      "6bd5f62b-1abc-4d9e-b4d1-5a3e1e6b0001")
    val uuidBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    val dvPath = java.nio.file.Paths.get(deltaDvRoot, "ab",
      s"deletion_vector_$uuid.bin")
    java.nio.file.Files.createDirectories(dvPath.getParent)
    java.nio.file.Files.write(dvPath, blobA)
    val dvA = s"""{"storageType":"u","pathOrInlineDv":"ab${
      DeltaDv.z85Encode(uuidBytes)}","offset":$offA,"sizeInBytes":${
      bmA.length},"cardinality":${ordsA.size}}"""
    // fB: storageType=i — the bitmap rides inline, z85-padded
    val ordsB = ords(fB, col("event_id") % 7 === 0)
    val bmB = DeltaDv.encodeBitmap(ordsB)
    val padded = java.util.Arrays.copyOf(bmB, (bmB.length + 3) / 4 * 4)
    val dvB = s"""{"storageType":"i","pathOrInlineDv":"${
      DeltaDv.z85Encode(padded)}","sizeInBytes":${bmB.length},""" +
      s""""cardinality":${ordsB.size}}"""
    val schemaQ = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(ev.schema.json)
    val logDir = java.nio.file.Paths.get(deltaDvRoot, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    java.nio.file.Files.writeString(
      logDir.resolve("00000000000000000000.json"), Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"],""" +
          """"writerFeatures":["deletionVectors"]}}""",
        s"""{"metaData":{"id":"l42","format":{"provider":"parquet",""" +
          s""""options":{}},"schemaString":$schemaQ,""" +
          s""""partitionColumns":[],"configuration":{},"createdTime":0}}""",
        s"""{"add":{"path":"data-a.parquet","partitionValues":{},""" +
          s""""size":1,"modificationTime":0,"dataChange":true,""" +
          s""""deletionVector":$dvA}}""",
        s"""{"add":{"path":"data-b.parquet","partitionValues":{},""" +
          s""""size":1,"modificationTime":0,"dataChange":true,""" +
          s""""deletionVector":$dvB}}""").mkString("\n"))
    graft.interop.XTableSync.readDelta(spark, deltaDvRoot)
      .orderBy("event_id", "event_type", "value")
  }

  private val deltaDvSql =
    s"""WITH d AS (
       |  SELECT event_id, event_type, value
       |  FROM read_parquet('$deltaDvRoot/data-a.parquet')
       |  WHERE event_id % 20 <> 0
       |  UNION ALL
       |  SELECT event_id, event_type, value
       |  FROM read_parquet('$deltaDvRoot/data-b.parquet')
       |  WHERE event_id % 7 <> 0)
       |SELECT event_id, event_type, value FROM d
       |ORDER BY event_id, event_type, value""".stripMargin

  // ---- T6++ Delta column-mapping READ (l43) -----------------------------

  /** Fixed root, same reason as l39/l41/l42: the oracle SQL is static. */
  private val colMapRoot = "/tmp/graft_xtable_l43"

  /** Delta column mapping on the foreign-read path — the physical-name
    * indirection every renamed-column Delta table carries
    * (`delta.columnMapping.mode=name`, minReaderVersion=2). The
    * fixture writes the data file under PHYSICAL names
    * (`col-<tag>`) and a schemaString whose fields map logical →
    * physical via `delta.columnMapping.physicalName` metadata;
    * [[graft.interop.XTableSync.readDelta]] must read the parquet
    * under the physical schema and surface logical names. The DuckDB
    * oracle performs the remap independently (SELECT "col-.." AS
    * logical). Reference analog: the Delta leg of xTable
    * (xtable/xtable_delta.yaml). */
  def qDeltaColumnMapping(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(colMapRoot))
    val ev = events(spark, dir).select(
      col("event_id").as("col-8d1e"), col("event_type").as("col-2b7a"),
      col("value").as("col-f903"))
    val f = java.nio.file.Paths.get(colMapRoot, "data.parquet")
    writeOneSorted(ev, "col-8d1e", f)
    val fields = Seq(
      ("event_id", "long", 1, "col-8d1e"),
      ("event_type", "string", 2, "col-2b7a"),
      ("value", "double", 3, "col-f903")).map { case (n, t, id, ph) =>
      s"""{"name":"$n","type":"$t","nullable":true,"metadata":{""" +
        s""""delta.columnMapping.id":$id,""" +
        s""""delta.columnMapping.physicalName":"$ph"}}"""
    }.mkString("[", ",", "]")
    val schemaQ = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(s"""{"type":"struct","fields":$fields}""")
    val logDir = java.nio.file.Paths.get(colMapRoot, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    java.nio.file.Files.writeString(
      logDir.resolve("00000000000000000000.json"), Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"l43","format":{"provider":"parquet",""" +
          s""""options":{}},"schemaString":$schemaQ,""" +
          s""""partitionColumns":[],"configuration":{""" +
          s""""delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"3"},"createdTime":0}}""",
        s"""{"add":{"path":"data.parquet","partitionValues":{},""" +
          s""""size":1,"modificationTime":0,"dataChange":true}}""")
        .mkString("\n"))
    graft.interop.XTableSync.readDelta(spark, colMapRoot)
      .orderBy("event_id", "event_type", "value")
  }

  private val deltaColumnMappingSql =
    s"""SELECT "col-8d1e" AS event_id, "col-2b7a" AS event_type,
       |  "col-f903" AS value
       |FROM read_parquet('$colMapRoot/data.parquet')
       |ORDER BY event_id, event_type, value""".stripMargin

  // ---- T6++ Delta change-data-feed READ (l44) ---------------------------

  /** Fixed root, same reason as l39/l41/l42/l43: the oracle SQL is
    * static. */
  private val cdfRoot = "/tmp/graft_xtable_l44"

  /** Foreign Delta CHANGE DATA FEED — the `table_changes` semantics
    * over a forged `_delta_log`, the incremental-consumption leg of
    * the xTable story (chain a foreign Delta table without snapshot
    * diffing):
    *  - v0 adds fA (even event_ids) → inserts;
    *  - v1 carries `cdc` change files (update pre/post images for
    *    event_id % 10 = 0, post = value + 1000) AND a decoy
    *    add(rewritten fA)/remove(fA) pair describing the same change —
    *    [[graft.interop.XTableSync.readDeltaChanges]] must serve the
    *    commit from EXACTLY its change files or the rows double-count;
    *  - v2 adds fB (odd event_ids) → derived inserts;
    *  - v3 removes fB → derived deletes read from the still-on-disk
    *    file.
    * The DuckDB oracle recomputes all four versions' change rows from
    * the raw parquet + the fixture predicates independently. */
  def qDeltaCdf(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(java.nio.file.Paths.get(cdfRoot))
    val ev = events(spark, dir).select(
      col("event_id"), col("event_type"), col("value"))
    val fA = java.nio.file.Paths.get(cdfRoot, "fa.parquet")
    val fR = java.nio.file.Paths.get(cdfRoot, "fr.parquet")
    val fB = java.nio.file.Paths.get(cdfRoot, "fb.parquet")
    val c1 = java.nio.file.Paths.get(cdfRoot, "c1.parquet")
    val evA = ev.filter(col("event_id") % 2 === 0)
    writeOneSorted(evA, "event_id", fA)
    writeOneSorted(evA.withColumn("value",
      when(col("event_id") % 10 === 0, col("value") + 1000.0)
        .otherwise(col("value"))), "event_id", fR)
    writeOneSorted(ev.filter(col("event_id") % 2 === 1), "event_id", fB)
    val ups = evA.filter(col("event_id") % 10 === 0)
    writeOneSorted(
      ups.withColumn("_change_type", lit("update_preimage"))
        .unionByName(ups.withColumn("value", col("value") + 1000.0)
          .withColumn("_change_type", lit("update_postimage"))),
      "event_id", c1)
    val schemaQ = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(ev.schema.json)
    val logDir = java.nio.file.Paths.get(cdfRoot, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    def add(p: String) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true}}"""
    def commit(v: Long, lines: Seq[String]): Unit = {
      java.nio.file.Files.writeString(
        logDir.resolve(f"$v%020d.json"), lines.mkString("\n"))
      ()
    }
    commit(0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"l44","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":$schemaQ,""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.enableChangeDataFeed":"true"},"createdTime":0}}""",
      add("fa.parquet")))
    commit(1L, Seq(
      s"""{"cdc":{"path":"c1.parquet","partitionValues":{},"size":1,""" +
        s""""dataChange":false}}""",
      add("fr.parquet"),
      """{"remove":{"path":"fa.parquet","deletionTimestamp":1,""" +
        """"dataChange":true}}"""))
    commit(2L, Seq(add("fb.parquet")))
    commit(3L, Seq(
      """{"remove":{"path":"fb.parquet","deletionTimestamp":3,""" +
        """"dataChange":true}}"""))
    graft.interop.XTableSync.readDeltaChanges(spark, cdfRoot, 0L)
      .orderBy("_commit_version", "event_id", "_change_type", "value")
  }

  private val deltaCdfSql =
    s"""WITH fa AS (SELECT event_id, event_type, value
       |            FROM read_parquet('$cdfRoot/fa.parquet')),
       |fb AS (SELECT event_id, event_type, value
       |       FROM read_parquet('$cdfRoot/fb.parquet')),
       |ups AS (SELECT * FROM fa WHERE event_id % 10 = 0),
       |d AS (
       |  SELECT event_id, event_type, value,
       |         'insert' AS _change_type, 0 AS _commit_version FROM fa
       |  UNION ALL SELECT event_id, event_type, value,
       |         'update_preimage', 1 FROM ups
       |  UNION ALL SELECT event_id, event_type, value + 1000,
       |         'update_postimage', 1 FROM ups
       |  UNION ALL SELECT event_id, event_type, value, 'insert', 2 FROM fb
       |  UNION ALL SELECT event_id, event_type, value, 'delete', 3 FROM fb)
       |SELECT event_id, event_type, value, _change_type,
       |       CAST(_commit_version AS BIGINT) AS _commit_version
       |FROM d
       |ORDER BY _commit_version, event_id, _change_type, value""".stripMargin

  // ---- incremental vector-index maintenance under the oracle (l40) ------

  /** The round-27 maintenance path under the DuckDB oracle: build the
    * index on the even half, then ONE upsert delivers new rows (odd
    * vec_ids) AND moved vectors (evens < 20 shifted by +1.0 — float
    * arithmetic, exact on both sides), and the next `CALL
    * vector_search` must serve the post-upsert state through the
    * incrementally-maintained index (CDC remove+append against frozen
    * centroids — the full-rebuild path would also pass, but the specs
    * pin WHICH path runs; this gate pins that the result is exact).
    * Full probe ⇒ cosine top-k over the final snapshot, which the
    * oracle recomputes from the raw parquet with the p6 cosine form. */
  def qVectorSearchIncremental(spark: SparkSession, dir: String): DataFrame = {
    val embs = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val wh = freshRoot("emb_vinc_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(TableConfig(name = "emb_vinc",
      keyField = "vec_id", orderingField = "ver", numBuckets = 2))
    t.bulkInsert(embs.filter(col("vec_id") % 2 === 0).withColumn("ver", lit(1L)))
    gsql.sql("CALL build_vector_index(table => 'emb_vinc', " +
      "id_col => 'vec_id', vec_col => 'embedding', n_lists => 8)")
    val up = embs.filter(col("vec_id") % 2 === 1)
      .unionByName(embs
        .filter(col("vec_id") % 2 === 0 && col("vec_id") < 20)
        .withColumn("embedding",
          expr("transform(embedding, x -> x + cast(1.0 as float))")))
      .withColumn("ver", lit(2L))
    t.upsert(up)
    gsql.sql("CALL vector_search(table => 'emb_vinc', " +
        "id_col => 'vec_id', vec_col => 'embedding', k => 5, " +
        "n_lists => 8, query_where => 'vec_id < 10')")
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  private val vectorSearchIncrementalSql =
    """WITH up AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
      |  UNION ALL
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(x + 1.0 AS REAL))
      |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 20),
      |fin AS (
      |  SELECT vec_id, embedding FROM up
      |  UNION ALL
      |  SELECT vec_id, embedding FROM embeddings
      |  WHERE vec_id % 2 = 0 AND vec_id NOT IN (SELECT vec_id FROM up)),
      |q AS (SELECT vec_id, embedding FROM fin WHERE vec_id < 10),
      |s AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
      |  list_sum(list_transform(generate_series(1, len(q.embedding)),
      |    i -> q.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE))
      |  / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |       i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
      |   * sqrt(list_sum(list_transform(generate_series(1, len(v.embedding)),
      |       i -> v.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE)))) AS cosine
      |      FROM q JOIN fin v ON q.vec_id <> v.vec_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
      |SELECT query_id, neighbor_id, rank, cosine FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---- diversity selection on the SQL surface (l38) ---------------------

  /** `CALL mmr_select` — the p85 clustered-MMR operator reached through
    * the procedure surface, on the p78 fixture (query = vec_id 0,
    * candidates 1..199, k = 8): numClusters = 1 with a covering pool is
    * bit-identical to the guarded mmrSelect, so the p78 recursive-CTE
    * oracle applies verbatim even though the rows took a round trip
    * through a graft table. */
  def qMmrSelectSql(spark: SparkSession, dir: String): DataFrame = {
    val embs = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val wh = freshRoot("emb_mmr_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(TableConfig(name = "emb_mmr",
      keyField = "vec_id", orderingField = "vec_id", numBuckets = 2))
    t.bulkInsert(embs)
    gsql.sql("CALL mmr_select(table => 'emb_mmr', id_col => 'vec_id', " +
        "vec_col => 'embedding', k => 8, lambda => '0.5', " +
        "num_clusters => 1, pool_per_cluster => 256, " +
        "query_where => 'vec_id = 0', " +
        "filter => 'vec_id BETWEEN 1 AND 199')")
      .orderBy("rank")
  }

  private val vectorSearchSql =
    """WITH v AS (SELECT vec_id, embedding FROM embeddings
      |           WHERE vec_id % 3 = 0),
      |q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |s AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
      |  list_sum(list_transform(generate_series(1, len(q.embedding)),
      |    i -> q.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE))
      |  / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |       i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
      |   * sqrt(list_sum(list_transform(generate_series(1, len(v.embedding)),
      |       i -> v.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE)))) AS cosine
      |      FROM q JOIN v ON q.vec_id <> v.vec_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
      |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---- T6++ foreign-reader Iceberg verification (l31) ----------------

  /** Fixed root for the same reason as l29: the oracle SQL is static. */
  private val foreignIcebergRoot = "/tmp/graft_xtable_l31"

  /** The Iceberg leg of the xTable claim verified by a FOREIGN reader
    * (reference xtable.md:54-59 `register_table`, demo notebook cells
    * 6-18). The engine builds the COW table and syncs Iceberg v2
    * metadata TWICE — after the insert (v1: a snapshot whose files are
    * later superseded) and after the upsert (v2: current) — so the
    * oracle must resolve the real Iceberg chain: latest
    * `v*.metadata.json` → current-snapshot-id → manifest LIST avro →
    * manifest avro → live parquet set. DuckDB has no avro reader
    * offline, but avro strings are raw length-prefixed UTF-8, so the
    * oracle extracts the absolute paths from `read_blob` bytes with an
    * anchored regex — decoding exactly the fields a real reader would.
    * Superseded file versions still sit under `data/`, and v1's
    * manifest (still on disk) points at them: the oracle matches ONLY
    * if metadata-version selection, snapshot resolution, and both
    * manifest layers are all correct. */
  def qIcebergForeignRead(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(foreignIcebergRoot))
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, foreignIcebergRoot,
      cfg("ev_iceberg_foreign", TableConfig.Cow))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    graft.interop.XTableSync.syncIceberg(t) // v1 — superseded below
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    graft.interop.XTableSync.syncIceberg(t) // v2 — current snapshot
    out(t.read())
  }

  private val icebergForeignSql =
    s"""WITH meta AS (
       |  SELECT "current-snapshot-id" AS cur, snapshots
       |  FROM read_json_auto('$foreignIcebergRoot/metadata/v*.metadata.json')
       |  ORDER BY "last-sequence-number" DESC LIMIT 1),
       |mlist AS (
       |  SELECT s."manifest-list" AS path
       |  FROM (SELECT unnest(snapshots) AS s, cur FROM meta)
       |  WHERE s."snapshot-id" = cur),
       |manifests AS (
       |  SELECT DISTINCT mpath FROM (
       |    SELECT unnest(regexp_extract_all(CAST(b.content AS VARCHAR),
       |      '$foreignIcebergRoot/metadata/manifest-[-A-Za-z0-9_.]+[.]avro')) AS mpath
       |    FROM read_blob('$foreignIcebergRoot/metadata/snap-*.avro') b
       |    JOIN mlist ON b.filename = mlist.path)),
       |files AS (
       |  SELECT DISTINCT fpath FROM (
       |    SELECT unnest(regexp_extract_all(CAST(b.content AS VARCHAR),
       |      '$foreignIcebergRoot/data/[-/A-Za-z0-9_.=%]+[.]parquet')) AS fpath
       |    FROM read_blob('$foreignIcebergRoot/metadata/manifest-*.avro') b
       |    JOIN manifests ON b.filename = manifests.mpath)),
       |f AS (
       |  SELECT event_type, user_id, event_id, ts, value, filename
       |  FROM read_parquet('$foreignIcebergRoot/data/**/*.parquet',
       |                    filename=true, hive_partitioning=false,
       |                    union_by_name=true))
       |SELECT event_type, user_id, event_id, ts // 1000 AS ts_us, value
       |FROM f JOIN files ON f.filename = files.fpath
       |ORDER BY event_type, user_id""".stripMargin

  // ---- T6 reverse leg: Delta → graft adoption (l32) -------------------

  /** Fixed root, same reason as l29: the oracle SQL is static. */
  private val adoptDeltaRoot = "/tmp/graft_xtable_l32"

  /** Forge a FOREIGN Delta table at `root`: v0 adds a STALE file the
    * v1 version removes and replaces with the true live pair — so any
    * adoption that walks the directory instead of replaying the log
    * resurrects superseded rows and fails the gate. Returns the live
    * schema's StructType JSON (the log's schemaString). */
  private def forgeForeignDelta(root: String, stale: DataFrame,
      liveA: DataFrame, liveB: DataFrame): Unit = {
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    def writeOne(df: DataFrame, name: String): Long = {
      val tmp = s"$root/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = graft.util.Fs.list(java.nio.file.Paths.get(tmp))(_
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
      java.nio.file.Files.move(part, java.nio.file.Paths.get(root, name))
      graft.util.TempDirs.deleteRecursively(java.nio.file.Paths.get(tmp))
      java.nio.file.Files.size(java.nio.file.Paths.get(root, name))
    }
    val m = graft.core.CommitLog.mapper
    def add(p: String, sz: Long) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}"""
    def rm(p: String) =
      s"""{"remove":{"path":"$p","dataChange":true,"deletionTimestamp":2}}"""
    val metaData = m.writeValueAsString(Map("metaData" -> Map(
      "id" -> "00000000-0000-0000-0000-000000000000",
      "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
      "schemaString" -> liveA.schema.json,
      "partitionColumns" -> Seq.empty, "configuration" -> Map.empty,
      "createdTime" -> 0L)))
    val szS = writeOne(stale, "stale.parquet")
    val szA = writeOne(liveA, "fileA.parquet")
    val szB = writeOne(liveB, "fileB.parquet")
    def w(ver: Long, actions: Seq[String]): Unit =
      java.nio.file.Files.write(logDir.resolve(f"$ver%020d.json"),
        actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    w(0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData, add("stale.parquet", szS)))
    w(1L, Seq(rm("stale.parquet"),
      add("fileA.parquet", szA), add("fileB.parquet", szB)))
  }

  /** The reverse xTable leg (xtable/xtable_delta.yaml:17-25
    * sourceFormat DELTA): a FOREIGN Delta table — hand-forged log, a
    * superseded version still on disk — is adopted in place as a graft
    * table ([[graft.interop.XTableSync.adoptDelta]]), takes one engine
    * upsert, and re-syncs its continued `_delta_log`. The returned
    * rows are the graft snapshot; the query itself asserts the
    * unbroken-history claim (a full-log Delta replay reads the exact
    * same rows). The ORACLE is fully independent: DuckDB replays ONLY
    * the foreign versions (v0, v1) to the source live set and applies
    * the upsert's effect arithmetically — if adoption had resurrected
    * the stale file or dropped a live one, the sides diverge. */
  def qDeltaAdopt(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(adoptDeltaRoot))
    val ev = events(spark, dir)
    forgeForeignDelta(adoptDeltaRoot,
      stale = ev.filter(col("event_id") % 2 === 0)
        .withColumn("value", col("value") + lit(1000.0)),
      liveA = ev.filter(col("event_id") % 2 === 0),
      liveB = ev.filter(col("event_id") % 2 === 1))
    val t = graft.interop.XTableSync.adoptDelta(spark, adoptDeltaRoot,
      TableConfig(name = "ev_adopt", keyField = "event_id",
        orderingField = "ts", partitionField = None, numBuckets = 4))
    t.upsert(ev.filter(col("event_id") % 100 === 0)
      .withColumn("value", col("value") * 2))
    graft.interop.XTableSync.syncDelta(t)
    val cols = Seq("event_type", "user_id", "event_id", "ts", "value")
    val viaGraft = t.read().select(cols.map(col): _*)
    val viaDelta = graft.interop.XTableSync.readDelta(spark, adoptDeltaRoot)
      .select(cols.map(col): _*)
    require(viaDelta.exceptAll(viaGraft).isEmpty &&
            viaGraft.exceptAll(viaDelta).isEmpty,
      "continued _delta_log replay diverges from the graft snapshot")
    viaGraft
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("event_type", "user_id", "event_id", "ts_us", "value")
      .orderBy("event_id")
  }

  private val deltaAdoptSql =
    s"""WITH acts AS (
       |  SELECT * FROM read_json_auto(
       |    ['$adoptDeltaRoot/_delta_log/00000000000000000000.json',
       |     '$adoptDeltaRoot/_delta_log/00000000000000000001.json'],
       |    format='newline_delimited', sample_size=-1)),
       |live AS (
       |  SELECT "add".path AS path FROM acts WHERE "add" IS NOT NULL
       |  EXCEPT
       |  SELECT "remove".path FROM acts WHERE "remove" IS NOT NULL),
       |f AS (
       |  SELECT event_type, user_id, event_id, ts, value, filename
       |  FROM read_parquet('$adoptDeltaRoot/*.parquet',
       |                    filename=true, hive_partitioning=false,
       |                    union_by_name=true))
       |SELECT event_type, user_id, event_id, ts // 1000 AS ts_us,
       |       CASE WHEN event_id % 100 = 0 THEN value * 2 ELSE value END AS value
       |FROM f JOIN live ON f.filename = '$adoptDeltaRoot/' || live.path
       |ORDER BY event_id""".stripMargin

  // ---- T6 full triangle: adopt Delta, re-export Iceberg (l33) --------

  /** Fixed root, same reason as l29/l31/l32. */
  private val adoptTriangleRoot = "/tmp/graft_xtable_l33"

  /** The full xTable triangle (demo.ipynb cells 6-18): a foreign
    * DELTA table is adopted as a graft table, takes an engine upsert,
    * and `sync` re-exports ICEBERG v2 metadata over the adopted +
    * rewritten files. The oracle is the l31 foreign-reader chain —
    * latest metadata.json → current snapshot → manifest-list avro →
    * manifest avro → live parquet — run against the ADOPTED table's
    * root, proving the re-exported metadata alone reproduces the
    * post-migration snapshot with zero engine code. */
  def qAdoptRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    graft.util.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(adoptTriangleRoot))
    val ev = events(spark, dir)
    forgeForeignDelta(adoptTriangleRoot,
      stale = ev.filter(col("event_id") % 2 === 0)
        .withColumn("value", col("value") + lit(1000.0)),
      liveA = ev.filter(col("event_id") % 2 === 0),
      liveB = ev.filter(col("event_id") % 2 === 1))
    val t = graft.interop.XTableSync.adoptDelta(spark, adoptTriangleRoot,
      TableConfig(name = "ev_triangle", keyField = "event_id",
        orderingField = "ts", partitionField = None, numBuckets = 4))
    t.upsert(ev.filter(col("event_id") % 100 === 0)
      .withColumn("value", col("value") * 2))
    graft.interop.XTableSync.syncIceberg(t)
    t.read()
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("event_type", "user_id", "event_id", "ts_us", "value")
      .orderBy("event_id")
  }

  private val adoptRoundtripSql =
    s"""WITH meta AS (
       |  SELECT "current-snapshot-id" AS cur, snapshots
       |  FROM read_json_auto('$adoptTriangleRoot/metadata/v*.metadata.json')
       |  ORDER BY "last-sequence-number" DESC LIMIT 1),
       |mlist AS (
       |  SELECT s."manifest-list" AS path
       |  FROM (SELECT unnest(snapshots) AS s, cur FROM meta)
       |  WHERE s."snapshot-id" = cur),
       |manifests AS (
       |  SELECT DISTINCT mpath FROM (
       |    SELECT unnest(regexp_extract_all(CAST(b.content AS VARCHAR),
       |      '$adoptTriangleRoot/metadata/manifest-[-A-Za-z0-9_.]+[.]avro')) AS mpath
       |    FROM read_blob('$adoptTriangleRoot/metadata/snap-*.avro') b
       |    JOIN mlist ON b.filename = mlist.path)),
       |files AS (
       |  SELECT DISTINCT fpath FROM (
       |    SELECT unnest(regexp_extract_all(CAST(b.content AS VARCHAR),
       |      '$adoptTriangleRoot/data/[-/A-Za-z0-9_.=%]+[.]parquet')) AS fpath
       |    FROM read_blob('$adoptTriangleRoot/metadata/manifest-*.avro') b
       |    JOIN manifests ON b.filename = manifests.mpath)),
       |f AS (
       |  SELECT event_type, user_id, event_id, ts, value, filename
       |  FROM read_parquet('$adoptTriangleRoot/data/**/*.parquet',
       |                    filename=true, hive_partitioning=false,
       |                    union_by_name=true))
       |SELECT event_type, user_id, event_id, ts // 1000 AS ts_us, value
       |FROM f JOIN files ON f.filename = files.fpath
       |ORDER BY event_id""".stripMargin

  // ---- S9++ derived partition paths (l30) ---------------------------

  /** TimestampBasedKeyGenerator analog through the oracle: the table
    * partitions on `yyyy/MM/dd` DERIVED from the epoch-nanos `ts`
    * column (reference test-suite/test.properties:34-42), so record
    * identity is (derived day, user) — the same user on two days is
    * two records; two versions within a day merge latest-wins. The
    * oracle mirrors the derivation with strftime over the same epoch.
    * Layout (real nested dirs) and range-pruning plan asserts live in
    * DerivedPartitionSpec; this gate pins the merge SEMANTICS of
    * derived identity. */
  def qDerivedPartitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val t = GraftTable.create(spark, freshRoot("ev_derived"), TableConfig(
      name = "ev_derived", keyField = "user_id", orderingField = "ts",
      partitionField = Some("ts"), partitionFormat = Some("yyyy/MM/dd"),
      partitionUnit = "ns", tableType = TableConfig.Cow, numBuckets = 4))
    t.insert(ev.filter(col("event_id") % 2 === 0))
    t.upsert(ev.filter(col("event_id") % 2 === 1))
    t.read()
      .withColumn("day", date_format(
        timestamp_micros(expr("ts DIV 1000")), "yyyy/MM/dd"))
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select("day", "user_id", "event_id", "ts_us", "value")
      .orderBy("day", "user_id")
  }

  private val derivedPartitionsSql =
    """SELECT day, user_id, event_id, ts_us, value
      |FROM (SELECT strftime(make_timestamp(epoch_us(ts)), '%Y/%m/%d') AS day,
      |             user_id, event_id, epoch_us(ts) AS ts_us, value,
      |             row_number() OVER (
      |               PARTITION BY strftime(make_timestamp(epoch_us(ts)), '%Y/%m/%d'),
      |                            user_id
      |               ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY day, user_id""".stripMargin

  // -------------------------------------------------------------------

  // ---- A3 key-uniqueness invariant over the lakehouse table ---------

  /** The test-suite's duplicate-detection gate run against our own
    * snapshot (deltastreamer-hive-sync-presto.yaml:66-67): must be
    * empty. */
  def qUniqueInvariant(spark: SparkSession, dir: String): DataFrame =
    build(spark, dir, "ev_uniq", TableConfig.Cow).read()
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy("event_type", "user_id")

  private val uniqueSql =
    """SELECT event_type, user_id, count(*) AS cnt
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, user_id ORDER BY ts DESC, (event_id % 2) DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_cow_upsert_snapshot" -> (qCowUpsertSnapshot _),
    "l2_mor_read_optimized" -> (qMorReadOptimized _),
    "l3_mor_realtime" -> (qMorRealtime _),
    "l4_mor_compacted" -> (qMorCompacted _),
    "l5_incremental" -> (qIncremental _),
    "l6_delete_predicate" -> (qDelete _),
    "l7_overwrite_drop_partition" -> (qOverwriteAndDropPartition _),
    "l8_unique_invariant" -> (qUniqueInvariant _),
    "l9_stats_skipping" -> (qStatsSkipping _),
    "l10_schema_evolution" -> (qSchemaEvolution _),
    "l11_cdc" -> (qCdc _),
    "l12_zorder" -> (qZOrder _),
    "l13_bootstrap" -> (qBootstrap _),
    "l14_mor_catalog_snapshot" -> (qMorCatalogSnapshot _),
    "l15_orc_roundtrip" -> (qOrcRoundtrip _),
    "l16_stream_source" -> (qStreamSource _),
    "l17_stream_sink" -> (qStreamSink _),
    "l18_time_travel" -> (qTimeTravel _),
    "l19_spj_join" -> (qSpjJoin _),
    "l20_incremental_mv" -> (qIncrementalMv _),
    "l21_restore" -> (qRestore _),
    "l22_streamer_transform" -> (qStreamerTransform _),
    "l23_cdc_sql" -> (qCdcSql _),
    "l24_merge_full_sync" -> (qMergeFullSync _),
    "l25_partial_upsert" -> (qPartialUpsert _),
    "l26_drop_column" -> (qDropColumn _),
    "l27_clean" -> (qClean _),
    "l28_snapshot_export" -> (qSnapshotExport _),
    "l29_delta_foreign_read" -> (qDeltaForeignRead _),
    "l30_derived_partitions" -> (qDerivedPartitions _),
    "l31_iceberg_foreign_read" -> (qIcebergForeignRead _),
    "l32_delta_adopt" -> (qDeltaAdopt _),
    "l33_adopt_roundtrip" -> (qAdoptRoundtrip _),
    "l34_delta_checkpoint" -> (qDeltaCheckpointRead _),
    "l35_table_dedup" -> (qTableDedup _),
    "l36_table_dedup_fuzzy" -> (qTableDedupFuzzy _),
    "l37_vector_search" -> (qVectorSearchSql _),
    "l38_mmr_select" -> (qMmrSelectSql _),
    "l39_iceberg_pos_delete" -> (qIcebergPosDelete _),
    "l40_vector_search_incremental" -> (qVectorSearchIncremental _),
    "l41_iceberg_eq_delete" -> (qIcebergEqDelete _),
    "l42_delta_dv" -> (qDeltaDv _),
    "l43_delta_column_mapping" -> (qDeltaColumnMapping _),
    "l44_delta_cdf" -> (qDeltaCdf _),
    "l45_iceberg_changes" -> (qIcebergChanges _),
  )

  val oracles: Map[String, String] = Map(
    "l1_cow_upsert_snapshot" -> cowUpsertSql,
    "l2_mor_read_optimized" -> morRoSql,
    "l3_mor_realtime" -> cowUpsertSql,
    "l4_mor_compacted" -> cowUpsertSql,
    "l5_incremental" -> incrSql,
    "l6_delete_predicate" -> deleteSql,
    "l7_overwrite_drop_partition" -> overwriteSql,
    "l8_unique_invariant" -> uniqueSql,
    "l9_stats_skipping" -> statsSkipSql,
    "l10_schema_evolution" -> schemaEvoSql,
    "l11_cdc" -> cdcSql,
    "l12_zorder" -> cowUpsertSql,
    "l13_bootstrap" -> bootstrapSql,
    "l14_mor_catalog_snapshot" -> cowUpsertSql,
    "l15_orc_roundtrip" -> orcRoundtripSql,
    "l16_stream_source" -> streamSourceSql,
    "l17_stream_sink" -> cowUpsertSql,
    "l18_time_travel" -> timeTravelSql,
    "l19_spj_join" -> spjJoinSql,
    "l20_incremental_mv" -> incrementalMvSql,
    "l21_restore" -> restoreSql,
    "l22_streamer_transform" -> streamerTransformSql,
    "l23_cdc_sql" -> cdcSql,
    "l24_merge_full_sync" -> mergeFullSyncSql,
    "l25_partial_upsert" -> partialUpsertSql,
    "l26_drop_column" -> dropColumnSql,
    "l27_clean" -> cleanSql,
    "l28_snapshot_export" -> cowUpsertSql,
    "l29_delta_foreign_read" -> deltaForeignSql,
    "l30_derived_partitions" -> derivedPartitionsSql,
    "l31_iceberg_foreign_read" -> icebergForeignSql,
    "l32_delta_adopt" -> deltaAdoptSql,
    "l33_adopt_roundtrip" -> adoptRoundtripSql,
    "l34_delta_checkpoint" -> deltaCheckpointSql,
    "l35_table_dedup" -> tableDedupSql,
    "l36_table_dedup_fuzzy" -> tableDedupFuzzySql,
    "l37_vector_search" -> vectorSearchSql,
    // the SQL-surface MMR equals the p78/p85 operator bit for bit on
    // the same fixture rows, so the recursive-CTE oracle applies
    // verbatim
    "l38_mmr_select" -> PipelineQueries.sMmrSelectSql,
    "l39_iceberg_pos_delete" -> icebergPosDeleteSql,
    "l40_vector_search_incremental" -> vectorSearchIncrementalSql,
    "l41_iceberg_eq_delete" -> icebergEqDeleteSql,
    "l42_delta_dv" -> deltaDvSql,
    "l43_delta_column_mapping" -> deltaColumnMappingSql,
    "l44_delta_cdf" -> deltaCdfSql,
    "l45_iceberg_changes" -> icebergChangesSql,
  )
}
