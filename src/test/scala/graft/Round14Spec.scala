package graft

import graft.core.{GraftTable, TableConfig}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions: partial-update upsert payload, ordered-sequence
  * funnel, cohort retention, equi-width histogram, signed random
  * projection, k-NN majority-vote labeling. */
class Round14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def freshRoot(name: String): String =
    graft.util.TempDirs.create(s"graft-$name-").toString

  private def mkTable(name: String, tpe: String): GraftTable =
    GraftTable.create(spark, freshRoot(name),
      TableConfig(name = name, keyField = "k", orderingField = "ts",
        partitionField = None, tableType = tpe, numBuckets = 2))

  private def state(t: GraftTable): Map[Long, (String, Any)] =
    t.read().select("k", "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.get(2))).toMap

  // ---- upsertPartial ---------------------------------------------------

  test("upsertPartial: null data columns keep the stored value") {
    import spark.implicits._
    val t = mkTable("part_basic", TableConfig.Cow)
    t.insert(Seq((1L, 1L, "x", 10L), (2L, 1L, "y", 20L))
      .toDF("k", "ts", "a", "b"))
    t.upsertPartial(Seq(
      (1L, 2L, Option.empty[String], Option(11L)), // a kept, b overwritten
      (3L, 1L, Option.empty[String], Option(30L))  // new key: nulls stay
    ).toDF("k", "ts", "a", "b"))
    val s = state(t)
    assert(s(1L) == (("x", 11L)))
    assert(s(2L) == (("y", 20L)))
    assert(s(3L) == ((null, 30L)))
  }

  test("upsertPartial: older ordering keeps stored values (non-null stored)") {
    import spark.implicits._
    val t = mkTable("part_old", TableConfig.Cow)
    t.insert(Seq((2L, 5L, "y", 20L)).toDF("k", "ts", "a", "b"))
    t.upsertPartial(Seq((2L, 1L, Option("z"), Option.empty[Long]))
      .toDF("k", "ts", "a", "b"))
    // stored row has no nulls → the losing partial changes nothing
    assert(state(t)(2L) == (("y", 20L)))
    val ord = t.read().select("ts").collect().head.getLong(0)
    assert(ord == 5L) // stored ordering survives
  }

  test("upsertPartial: older partial back-fills stored NULLs (Hudi case 2)") {
    import spark.implicits._
    val t = mkTable("part_backfill", TableConfig.Cow)
    t.insert(Seq((2L, 5L, Option.empty[String], Option(20L)))
      .toDF("k", "ts", "a", "b"))
    t.upsertPartial(Seq((2L, 1L, Option("z"), Option.empty[Long]))
      .toDF("k", "ts", "a", "b"))
    // stored wins (ts=5) but its null `a` is patched from the late partial
    assert(state(t)(2L) == (("z", 20L)))
    assert(t.read().select("ts").collect().head.getLong(0) == 5L)
  }

  test("upsertPartial: narrow frame never wipes unmentioned columns") {
    import spark.implicits._
    val t = mkTable("part_narrow", TableConfig.Cow)
    t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    // batch carries only (k, ts, b) — `a` must keep its stored value
    t.upsertPartial(Seq((1L, 2L, 11L)).toDF("k", "ts", "b"))
    assert(state(t)(1L) == (("x", 11L)))
  }

  test("upsertPartial: two partial rows for one key compose in-batch") {
    import spark.implicits._
    val t = mkTable("part_fold", TableConfig.Cow)
    t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    t.upsertPartial(Seq(
      (1L, 2L, Option.empty[String], Option(11L)),
      (1L, 3L, Option("w"), Option.empty[Long])
    ).toDF("k", "ts", "a", "b"))
    // folded row: ts=3, a=w (latest non-null), b=11 (latest non-null)
    assert(state(t)(1L) == (("w", 11L)))
  }

  test("upsertPartial: MOR patches against the base+delta merged state") {
    import spark.implicits._
    val t = mkTable("part_mor", TableConfig.Mor)
    t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    // delta upsert changes a; partial upsert must see the DELTA value
    t.upsert(Seq((1L, 2L, "x2", 10L)).toDF("k", "ts", "a", "b"))
    t.upsertPartial(Seq((1L, 3L, Option.empty[String], Option(13L)))
      .toDF("k", "ts", "a", "b"))
    val r = t.readRealtime().select("k", "ts", "a", "b").collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 3L)
    assert(r.head.getString(2) == "x2") // patched from the delta row
    assert(r.head.getLong(3) == 13L)
  }

  test("upsertPartial: a deleted key is not resurrected as patch source") {
    import spark.implicits._
    val t = mkTable("part_del", TableConfig.Cow)
    t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    t.deleteWhere(col("k") === 1L)
    t.upsertPartial(Seq((1L, 2L, Option.empty[String], Option(99L)))
      .toDF("k", "ts", "a", "b"))
    // fresh insert semantics: a stays null (old "x" must NOT reappear)
    assert(state(t)(1L) == ((null, 99L)))
  }

  // ---- q43 funnel -------------------------------------------------------

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-funnel-fixt-").toString
    // ts in epoch NANOS (LongType) — the shape Tables.load normalizes to
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q43 funnel: stage windows are (prev, prev+24h], in order") {
    val us = 1000L // ns per µs
    val H24 = 86400000000L * us
    val dir = eventsDir(Seq(
      // user 10: completes signup -> view exactly at +24h -> click -> purchase
      (1L, 0L, 10L, "signup", 0.0),
      (2L, H24, 10L, "view", 0.0),          // boundary: included
      (3L, H24 + us, 10L, "click", 0.0),
      (4L, H24 + 2 * us, 10L, "purchase", 0.0),
      // user 11: view one µs past the window — drops at stage 2
      (5L, 0L, 11L, "signup", 0.0),
      (6L, H24 + us, 11L, "view", 0.0),
      // user 12: view BEFORE signup only — order matters, drops
      (7L, us, 12L, "signup", 0.0),
      (8L, 0L, 12L, "view", 0.0)))
    val r = Queries.q43Funnel(spark, dir).collect().head
    assert(r.getLong(0) == 3L, "n_signup")
    assert(r.getLong(1) == 1L, "n_view")
    assert(r.getLong(2) == 1L, "n_click")
    assert(r.getLong(3) == 1L, "n_purchase")
  }

  test("q43 funnel: stage counts are monotone non-increasing on sf0.001") {
    val r = Queries.q43Funnel(spark, "/root/testdata/sf0.001").collect().head
    val ns = (0 to 3).map(r.getLong)
    assert(ns == ns.sortBy(-_), s"funnel not monotone: $ns")
    assert(ns.head > 0)
  }

  test("q43 funnel: one corpus exchange feeds the whole 4-stage chain") {
    val plan = Queries.q43Funnel(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    // one hash exchange on user_id + the final single-partition agg
    val n = "(?i)exchange".r.findAllIn(plan).size
    assert(n <= 2, s"expected <=2 exchanges, got $n:\n$plan")
  }

  // ---- q44 cohort retention ---------------------------------------------

  test("q44 cohort: cells key on (first purchase day, days since)") {
    val us = 1000L
    val D = 86400000000L * us // one day in ns
    val dir = eventsDir(Seq(
      // user 1: first purchase day 0, again day 2 (+ a dup same day)
      (1L, 0L, 1L, "purchase", 0.0),
      (2L, 2 * D, 1L, "purchase", 0.0),
      (3L, 2 * D + us, 1L, "purchase", 0.0),
      // user 2: first purchase day 2
      (4L, 2 * D, 2L, "purchase", 0.0),
      // clicks never count
      (5L, 0L, 2L, "click", 0.0)))
    val got = Queries.q44CohortRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val day0 = 0L
    assert(got == Set((day0, 0L, 1L), (day0, 2L, 1L), (day0 + 2L, 0L, 1L)))
  }

  // ---- q45 histogram ------------------------------------------------------

  test("q45 histogram: buckets are left-closed at exact boundaries") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-hist-fixt-").toString
    Seq(49999.99, 50000.00, 50000.01, 0.0, 99999.99, 100000.00)
      .toDF("o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Queries.q45Histogram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 3L, 2L -> 1L))
  }

  // ---- p46 random projection ----------------------------------------------

  test("randomProjection: map-only (zero exchanges) and exact integer sums") {
    import spark.implicits._
    val v = Array.fill(64)(1.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "embedding", 64, 16)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.toLowerCase.contains("exchange"), plan)
    val proj = out.select("proj").collect().head.getSeq[Long](0)
    val expected = (0 until 16).map(j =>
      (0 until 64).map(i => Similarity.projectionSign(i, j) * 1048576L).sum)
    assert(proj == expected)
  }

  test("projectionSign: deterministic, both signs present") {
    val signs = for (i <- 0 until 64; j <- 0 until 16)
      yield Similarity.projectionSign(i, j)
    assert(signs.contains(1L) && signs.contains(-1L))
    assert(signs == signs.map(identity)) // re-derivation is stable
    val minus = signs.count(_ == -1L)
    assert(minus > 300 && minus < 700, s"suspiciously biased: $minus/1024")
  }

  // ---- p47 kNN labeling -----------------------------------------------------

  test("knnLabel: majority of k nearest; vote ties pick the smallest label") {
    import spark.implicits._
    def vec(x: Float) = Array(x, 0.0f)
    val ref = Seq(
      (100L, vec(1.0f), 7L),  // dist 0 to corpus point at 1.0
      (101L, vec(2.0f), 3L),  // dist 1
      (102L, vec(9.0f), 7L),  // far
      (103L, vec(9.1f), 3L))  // far
      .toDF("vec_id", "embedding", "label")
    val corpus = Seq((1L, vec(1.0f))).toDF("vec_id", "embedding")
    // k=2: nearest two labels {7, 3} tie 1-1 -> smallest label 3 wins
    val tie = Similarity.knnLabel(corpus, ref, "vec_id", "embedding",
      "label", k = 2, dims = 2).collect().head
    assert(tie.getLong(1) == 3L && tie.getLong(2) == 1L)
    // k=4: labels {7,3,7,3} tie 2-2 -> 3; k=1: nearest only -> 7
    val k1 = Similarity.knnLabel(corpus, ref, "vec_id", "embedding",
      "label", k = 1, dims = 2).collect().head
    assert(k1.getLong(1) == 7L)
  }

  // ---- l26 drop column ---------------------------------------------------

  test("dropColumn: hides data everywhere, zero rewrites, name retired") {
    import spark.implicits._
    val t = mkTable("dropcol", TableConfig.Cow)
    val c1 = t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    val filesBefore = t.log.liveFiles().map(_.path).toSet
    t.dropColumn("b")
    assert(t.log.liveFiles().map(_.path).toSet == filesBefore, "no rewrite")
    assert(!t.read().columns.contains("b"))
    // time travel to the pre-drop instant still surfaces the column
    val old = t.read(asOf = Some(c1))
    assert(old.columns.contains("b"))
    assert(old.select("b").collect().head.getLong(0) == 10L)
    // the name is retired: a write carrying it is refused
    val ex = intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, 2L, "y", 99L)).toDF("k", "ts", "a", "b"))
    }
    assert(ex.getMessage.contains("retired"), ex.getMessage)
    // post-drop writes without the column work on the narrowed schema
    t.upsert(Seq((1L, 3L, "z")).toDF("k", "ts", "a"))
    val r = t.read().select("k", "ts", "a").collect()
    assert(r.length == 1 && r.head.getString(2) == "z")
  }

  test("dropColumn: structural and unknown columns are refused") {
    import spark.implicits._
    val t = mkTable("dropcol_guard", TableConfig.Cow)
    t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    intercept[IllegalArgumentException](t.dropColumn("k"))
    intercept[IllegalArgumentException](t.dropColumn("ts"))
    intercept[IllegalArgumentException](t.dropColumn("nope"))
  }

  // ---- p48 heavy hitters + Misra-Gries contract ----------------------------

  test("misraGries: every exact heavy hitter survives; counts lower-bound") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val k = 64
    val toks = split(col("text"), " ")
    val bigrams = transform(
      sequence(lit(1), greatest(lit(1), size(toks) - lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    val counts = docs.select(explode(bigrams).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val mg = graft.operators.Curation.misraGriesTopTerms(docs, "text", k).toMap
    assert(mg.size <= k)
    // membership guarantee: true count > N/(k+1) => present
    val mustHave = counts.filter { case (_, c) => c > n / (k + 1) }.keySet
    assert(mustHave.subsetOf(mg.keySet),
      s"missing: ${(mustHave -- mg.keySet).take(5)}")
    // reported counts are lower bounds within N/(k+1)
    mg.foreach { case (t, c) =>
      val truth = counts.getOrElse(t, 0L)
      assert(c <= truth && truth - c <= n / (k + 1) + 1,
        s"$t: mg=$c truth=$truth n=$n")
    }
  }

  test("heavyHitters: integer keep boundary, one corpus pass") {
    import spark.implicits._
    val docs = Seq("a b a b", "a b c d").toDF("text")
    // bigrams: (a b)x2? doc1: "a b","b a","a b" -> a b:2, b a:1;
    // doc2: "a b","b c","c d" -> totals: a b:3, b a:1, b c:1, c d:1 (n=6)
    val hh = graft.operators.Curation.heavyHitters(docs, "text", phiInv = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("a b" -> 3L)) // 3*2 >= 6 exactly on the boundary
  }

  // ---- q46 / q47 plan + shape sanity ---------------------------------------

  test("q46 multi-join: dims broadcast, facts alone cross the network") {
    val df = Queries.q46MultiJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(df.collect().nonEmpty)
  }

  test("q47 fuzzy join: ordered pairs within the levenshtein threshold") {
    val rows = Queries.q47FuzzyJoin(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) <= 6L)
    }
  }

  // ---- l27 cleaning evidence -----------------------------------------------

  test("clean: superseded versions physically deleted, snapshot intact, horizon enforced") {
    import spark.implicits._
    val t = mkTable("clean_spec", TableConfig.Cow)
    val c1 = t.insert(Seq((1L, 1L, "a", 1L)).toDF("k", "ts", "a", "b"))
    t.upsert(Seq((1L, 2L, "b", 2L)).toDF("k", "ts", "a", "b"))
    t.upsert(Seq((1L, 3L, "c", 3L)).toDF("k", "ts", "a", "b"))
    val deleted = graft.core.TableServices.clean(t, retainCommits = 1)
    assert(deleted.nonEmpty, "COW rewrites must leave cleanable versions")
    deleted.foreach { rel =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, rel)), rel)
    }
    assert(state(t)(1L) == (("c", 3L)), "clean must not change the snapshot")
    // time travel past the clean horizon now fails at scan time
    intercept[Exception](t.read(asOf = Some(c1)).collect())
  }

  // ---- p49 keyword extraction / p50 KN counts -------------------------------

  test("p49 keywords: at most 3 per doc, ranks dense, scores non-increasing") {
    val rows = PipelineQueries.cKeywords(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length))
      assert(byRank.length <= 3)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("p50 KN counts: hand-checked continuation and fertility") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-kn-fixt-").toString
    Seq((1L, "a b a"), (2L, "c a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.cKnCounts(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bigrams: (a b), (b a), (c a)
    assert(got("a") == ((3L, 2L, 1L))) // c=3; left contexts {b, c}; right {b}
    assert(got("b") == ((1L, 1L, 1L))) // left {a}; right {a}
    assert(got("c") == ((1L, 0L, 1L))) // never preceded; right {a}
  }

  // ---- p51 Gram matrix --------------------------------------------------

  test("p51 Gram matrix: per-row outer product, no self-join, hand-checked") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-gram-fixt-").toString
    // two 64-dim vectors that are zero beyond dims 0..1:
    // v1 = (1, 0.5, 0...), v2 = (2, 1, 0...) — q = x*1024 exactly
    def vec(a: Float, b: Float) = Array(a, b) ++ Array.fill(62)(0.0f)
    Seq((1L, vec(1.0f, 0.5f), 0L), (2L, vec(2.0f, 1.0f), 0L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = PipelineQueries.eGramMatrix(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"Gram matrix must not self-join:\n$plan")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val q = 1024L
    // M[0,0] = (1q)² + (2q)² = 5q²; M[0,1] = 1q·0.5q + 2q·1q = 2.5q²;
    // M[1,1] = 0.25q² + 1q² = 1.25q²
    assert(got((0L, 0L)) == 5L * q * q)
    assert(got((0L, 1L)) == (q / 2) * q + 2L * q * q)
    assert(got((1L, 1L)) == (q / 2) * (q / 2) + q * q)
    assert(got((2L, 5L)) == 0L) // zero dims contribute zero
    assert(got.size == 64 * 65 / 2) // full upper triangle present
  }

  // ---- q50 top-k over join-aggregate ------------------------------------

  test("q50: top-10 runs as TakeOrderedAndProject, never a full sort") {
    val df = Queries.q50TopRevenue(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("GlobalLimit"), // TOAP subsumes sort+limit
      s"limit fell back to sort+limit:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.toSeq == revs.sortBy(-_).toSeq)
  }

  // ---- l28 snapshot export ----------------------------------------------

  test("exportSnapshot: engine-agnostic parquet, metadata columns dropped") {
    import spark.implicits._
    val t = mkTable("export_spec", TableConfig.Mor)
    t.insert(Seq((1L, 1L, "x", 10L)).toDF("k", "ts", "a", "b"))
    t.upsert(Seq((1L, 2L, "y", 11L)).toDF("k", "ts", "a", "b")) // delta
    val dest = freshRoot("export_spec_out")
    graft.core.TableServices.exportSnapshot(t, dest)
    val back = spark.read.parquet(dest)
    // merged view (the delta won), no engine columns
    assert(!back.columns.contains(graft.core.TableConfig.CommitTimeCol))
    assert(!back.columns.exists(_.contains("deleted")))
    val r = back.select("k", "ts", "a", "b").as[(Long, Long, String, Long)]
      .collect().toSeq
    assert(r == Seq((1L, 2L, "y", 11L)))
  }

  // ---- p53 co-occurrence ---------------------------------------------------

  test("p53 co-occurrence: ±2 window pairs, join-free plan, hand-checked") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-cooc-fixt-").toString
    Seq((1L, "a b c a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = PipelineQueries.cCooccurrence(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"co-occurrence must not self-join:\n$plan")
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // positions: a0 b1 c2 a3; window ±2 ordered pairs:
    // (a,b):a0→b1 = 1 plus a3→b1 = 1 → 2; (a,c): a0→c2 + a3→c2 = 2;
    // (a,a): a0↔a3 distance 3 → 0; (b,a): symmetric 2; (b,c): 1; (c,a): 2
    assert(got(("a", "b")) == 2L && got(("b", "a")) == 2L)
    assert(got(("a", "c")) == 2L && got(("c", "a")) == 2L)
    assert(got(("b", "c")) == 1L && got(("c", "b")) == 1L)
    assert(!got.contains(("a", "a")))
    // symmetric by construction
    got.keys.foreach { case (w, c) => assert(got((c, w)) == got((w, c))) }
  }

  test("knnLabel: reference side broadcasts, corpus never self-joins") {
    import spark.implicits._
    val ref = Seq((100L, Array(1.0f), 1L)).toDF("vec_id", "embedding", "label")
    val corpus = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    val plan = Similarity.knnLabel(corpus, ref, "vec_id", "embedding",
      "label", k = 1, dims = 1).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
