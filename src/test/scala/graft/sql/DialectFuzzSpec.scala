package graft.sql

import graft.Session
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the hand-rolled SQL dialect's load-bearing
  * primitive — the top-level splitter ([[GraftSql.splitTopLevel]],
  * used by OPTIONS parsing, UPDATE/MERGE SET assignment lists and CALL
  * arguments) — plus end-to-end statements with quoted values, odd
  * casing, stray whitespace and nested parens. Seeded generators (the
  * repo's PropertiesSpec idiom) keep failures reproducible. */
class DialectFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def freshSql(): GraftSql =
    new GraftSql(new GraftCatalog(spark,
      graft.util.TempDirs.create("graft-fuzz-").toString))

  // ---- splitTopLevel property -----------------------------------------

  // a token the splitter must keep whole: plain text, a quoted chunk
  // that may contain separators/parens, or a balanced paren group with
  // nested separators and nested groups
  private val plain: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '=', '.')))
        .map(_.mkString))
  private val quoted: Gen[String] = for {
    q <- Gen.oneOf('\'', '"', '`')
    n <- Gen.choose(0, 5)
    // inside a quote: separators, parens, spaces, the OTHER quote
    // chars, and (for '/") backslash-escaped quotes of the same kind
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(",", "(", ")", " ", "--"),
      Gen.oneOf("'", "\"", "`").suchThat(c => c != q.toString),
      if (q == '`') Gen.const("x") else Gen.const("\\" + q)))
  } yield q + cs.mkString + q
  private def parens(depth: Int): Gen[String] =
    if (depth <= 0) plain
    else Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(plain, quoted, parens(depth - 1)))
        .map(_.mkString("(", ",", ")")))
  private val token: Gen[String] = for {
    parts <- Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(plain, quoted, parens(2))))
  } yield parts.mkString

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("splitTopLevel: joining split-safe tokens with ',' round-trips") {
    val sql = freshSql()
    (1L to 300L).foreach { seed =>
      val tokens = sample(Gen.choose(1, 6)
        .flatMap(n => Gen.listOfN(n, token)), seed)
        .filter(_.trim.nonEmpty)
      val joined = tokens.mkString(",")
      val got = sql.splitTopLevel(joined, ',')
      assert(got == tokens,
        s"seed=$seed joined=<$joined> got=$got want=$tokens")
    }
  }

  test("splitTopLevel: never splits inside quotes or parens, any depth") {
    val sql = freshSql()
    assert(sql.splitTopLevel("a=(1,2,(3,4)),b='x,y',c=d", ',') ==
      Seq("a=(1,2,(3,4))", "b='x,y'", "c=d"))
    assert(sql.splitTopLevel("f(g(h(',')),i),j", ',') ==
      Seq("f(g(h(',')),i)", "j"))
    // unbalanced input degrades without throwing (conservative glue)
    assert(sql.splitTopLevel("a=(1,2", ',') == Seq("a=(1,2"))
  }

  // ---- end-to-end statements ------------------------------------------

  test("CREATE: quoted option values with commas/parens, odd casing, whitespace") {
    val g = freshSql()
    g.sql(
      """  cReAtE   TaBlE  fz1 ( k BIGINT, ts BIGINT, v STRING )  using  graft
        |   oPtIoNs ( "primaryKey" = 'k' ,  precombine='ts',
        |             partition='ts', partitionFormat='yyyy/MM/dd',
        |             partitionUnit='s' )  """.stripMargin)
    g.sql("InSeRt InTo fz1 VALUES (1, 1692000000, 'a,b(c)')")
    assert(g.sql("SELECT v FROM fz1").collect().head.getString(0) == "a,b(c)")
    val show = g.sql("show  create  table  fz1").collect().head.getString(0)
    assert(show.contains("partitionFormat='yyyy/MM/dd'"))
  }

  test("UPDATE SET list: quoted commas and nested function calls per assignment") {
    val g = freshSql()
    g.sql("CREATE TABLE fz2 (k BIGINT, ts BIGINT, a STRING, b STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz2 VALUES (1, 1, 'x', 'y')")
    g.sql("UPDATE fz2 SET a = concat('p,q', '(r', ')s'), b = upper(b) WHERE k = 1")
    val r = g.sql("SELECT a, b FROM fz2").collect().head
    assert(r.getString(0) == "p,q(r)s" && r.getString(1) == "Y")
  }

  test("CALL: nested-paren and quoted arguments reach the procedure intact") {
    val g = freshSql()
    g.sql("CREATE TABLE fz3 (k BIGINT, ts BIGINT, v STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz3 VALUES (1, 1, 'a'), (2, 1, 'b')")
    // named-arg call with quoted value — the splitter must not split
    // inside the quotes even with a comma in the value
    g.sql("CALL run_clustering(table => 'fz3')")
    assert(g.sql("SELECT count(*) FROM fz3").collect().head.getLong(0) == 2L)
  }

  test("backticked table names address the same table as bare names") {
    val g = freshSql()
    g.sql("CREATE TABLE `fzq` (k BIGINT, ts BIGINT, v STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO `fzq` VALUES (1, 1, 'a')")
    g.sql("UPDATE `fzq` SET v = 'b' WHERE k = 1")
    // bare and quoted spellings hit the SAME table
    assert(g.sql("SELECT v FROM fzq").collect().head.getString(0) == "b")
    assert(g.sql("SHOW CREATE TABLE `fzq`").collect().head.getString(0)
      .contains("CREATE TABLE fzq"))
    g.sql("DELETE FROM `fzq` WHERE k = 1")
    assert(g.sql("SELECT count(*) FROM fzq").collect().head.getLong(0) == 0L)
    g.sql("DROP TABLE `fzq`")
    intercept[IllegalArgumentException](g.sql("DROP TABLE fzq"))
  }

  test("MERGE: 'WHEN MATCHED' inside a source string literal doesn't split the statement") {
    val g = freshSql()
    g.sql("CREATE TABLE fz5 (k BIGINT, ts BIGINT, v STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz5 VALUES (1, 1, 'old')")
    g.sql(
      """MERGE INTO fz5 USING (
        |  SELECT 1 AS k, 2 AS ts, 'WHEN MATCHED THEN trap' AS v
        |) AS s ON s.k = fz5.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(g.sql("SELECT v FROM fz5").collect().head.getString(0)
      == "WHEN MATCHED THEN trap")
  }

  test("splitTopLevel: double-quoted and backticked chunks are kept whole") {
    val sql = freshSql()
    assert(sql.splitTopLevel("""a="x,y",b=`w,z`,c='p,q'""", ',') ==
      Seq("""a="x,y"""", "b=`w,z`", "c='p,q'"))
    // a paren imbalance INSIDE a quoted chunk must not poison the depth
    assert(sql.splitTopLevel("""a="(,(",b=c""", ',') ==
      Seq("""a="(,("""", "b=c"))
  }

  test("MERGE: 'when' inside a double-quoted string or backticked identifier") {
    val g = freshSql()
    g.sql("CREATE TABLE fz6 (k BIGINT, ts BIGINT, `when` STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz6 VALUES (1, 1, 'old')")
    // the clause boundary must be found at the REAL top-level WHEN, not
    // at the double-quoted "when matched..." literal or the backticked
    // `when` column reference inside the USING subquery
    g.sql(
      """MERGE INTO fz6 USING (
        |  SELECT k, ts + 1 AS ts, concat(`when`, " when matched x") AS `when`
        |  FROM (SELECT 1 AS k, 1 AS ts, 'v' AS `when`)
        |) AS s ON s.k = fz6.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(g.sql("SELECT `when` FROM fz6").collect().head.getString(0)
      == "v when matched x")
  }

  test("SQL comments: line and block comments don't break the dialect grammar") {
    val g = freshSql()
    g.sql(
      """-- demo table
        |CREATE TABLE fz7 (k BIGINT, ts BIGINT, v STRING) USING GRAFT
        |  /* options follow */ OPTIONS (primaryKey='k', precombine='ts')""".stripMargin)
    g.sql("INSERT INTO fz7 -- trailing note\nVALUES (1, 1, 'a -- not a comment')")
    // comment markers INSIDE string literals are data, not comments
    assert(g.sql("SELECT v FROM fz7").collect().head.getString(0)
      == "a -- not a comment")
    g.sql("/* leading block */ UPDATE fz7 SET v = '/*x*/' WHERE k = 1")
    assert(g.sql("SELECT v FROM fz7").collect().head.getString(0) == "/*x*/")
    // optimizer hints survive to the Spark path
    assert(g.sql("SELECT /*+ COALESCE(1) */ count(*) AS c FROM fz7")
      .collect().head.getLong(0) == 1L)
    g.sql("-- bye\nDROP TABLE fz7")
    intercept[IllegalArgumentException](g.sql("DROP TABLE fz7"))
  }

  test("comments/splitters: backslash-escaped quotes and nested block comments") {
    val g = freshSql()
    // Spark's default string literals honor backslash escapes: the
    // escaped quote must NOT close the literal, so the -- inside stays data
    assert(g.sql("""SELECT 'it\'s -- fine' AS v""").collect().head.getString(0)
      == "it's -- fine")
    // nested bracketed comments (Spark parser accepts them since 3.0)
    assert(g.sql("SELECT /* outer /* inner */ still comment */ 1 AS c")
      .collect().head.getInt(0) == 1)
    // splitter: escaped quote inside a quoted chunk doesn't end it
    assert(g.splitTopLevel("""a='x\',y',b=2""", ',') ==
      Seq("""a='x\',y'""", "b=2"))
    // stripComments keeps quote state across escapes
    assert(g.stripComments("""'a\'--b' -- gone""") == """'a\'--b' """)
  }

  test("UPDATE: ' where ' inside a SET string literal doesn't split the statement") {
    val g = freshSql()
    g.sql("CREATE TABLE fz8 (k BIGINT, ts BIGINT, note STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz8 VALUES (1, 1, 'x')")
    g.sql("UPDATE fz8 SET note = 'fixed where broken' WHERE k = 1")
    assert(g.sql("SELECT note FROM fz8").collect().head.getString(0)
      == "fixed where broken")
  }

  test("MERGE: clause keywords inside assignment literals don't change semantics") {
    val g = freshSql()
    g.sql("CREATE TABLE fz9 (k BIGINT, ts BIGINT, note STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz9 VALUES (1, 1, 'old')")
    // the literal spells out an INSERT clause: it must stay DATA — the
    // merge has no real NOT MATCHED clause, so key 2 must NOT appear
    g.sql(
      """MERGE INTO fz9 USING (
        |  SELECT 2 AS k, 5 AS ts, 'z' AS note
        |) AS s ON s.k = fz9.k
        |WHEN MATCHED THEN UPDATE SET note = 'when not matched then insert *'""".stripMargin)
    assert(g.sql("SELECT count(*) FROM fz9").collect().head.getLong(0) == 1L)
    assert(g.sql("SELECT note FROM fz9 WHERE k = 1").collect().head.getString(0)
      == "old") // no match for key 2 -> no update happened either
    // and a partial SET whose literal contains ' when matched ' keeps
    // the full assignment text
    g.sql(
      """MERGE INTO fz9 USING (
        |  SELECT 1 AS k, 9 AS ts, 'z' AS note
        |) AS s ON s.k = fz9.k
        |WHEN MATCHED THEN UPDATE SET note = 'updated when matched here'""".stripMargin)
    assert(g.sql("SELECT note FROM fz9 WHERE k = 1").collect().head.getString(0)
      == "updated when matched here")
  }

  test("MERGE: USING subquery with nested parens and quoted commas") {
    val g = freshSql()
    g.sql("CREATE TABLE fz4 (k BIGINT, ts BIGINT, v STRING) USING GRAFT " +
      "OPTIONS (primaryKey='k', precombine='ts')")
    g.sql("INSERT INTO fz4 VALUES (1, 1, 'old'), (2, 1, 'keep')")
    g.sql(
      """MERGE INTO fz4 USING (
        |  SELECT k, ts + 1 AS ts, concat(v, ',(new)') AS v
        |  FROM (SELECT 1 AS k, 1 AS ts, 'x' AS v)
        |) AS s ON s.k = fz4.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = g.sql("SELECT k, v FROM fz4 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "x,(new)"), (2L, "keep")))
  }
}
