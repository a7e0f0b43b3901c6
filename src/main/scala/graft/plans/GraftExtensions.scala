package graft.plans

import graft.functions.{LangIdExpression, MinHashSignature, SimHash64, WinnowFingerprint}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point — the engine's analog of the
  * reference's `--conf spark.sql.extensions=
  * org.apache.hudi.HoodieSparkSessionExtension` wiring
  * (hudi-spark-minio-trino/README.md:354-358): plugging the engine
  * into Catalyst's standard pipeline instead of per-session manual
  * registration.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injects the custom expressions as SQL functions. No analyzer/
  * optimizer rules or strategies are injected — SURVEY.md §4's
  * conclusion holds: every parity operator lands on built-in Catalyst,
  * and custom file selection happens before plan construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]

  /** Arity-checked builder: `exprs.head` on an empty list throws a
    * bare NoSuchElementException, and EXTRA arguments were silently
    * dropped — `minhash_signature(text, 64)` quietly returned 128-hash
    * signatures. Surface both as analysis-time errors instead. */
  private def arity1(name: String)(build: Exprs => org.apache.spark.sql.catalyst.expressions.Expression)
      : Exprs => org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      require(exprs.length == 1,
        s"$name expects exactly 1 argument, got ${exprs.length} " +
        "(parameters like hash counts are fixed on the SQL surface; " +
        "use the Scala API for custom parameters)")
      build(exprs)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpression].getName, "lang_id"),
      arity1("lang_id")(e => LangIdExpression(e.head))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      arity1("winnow_fingerprint")(e => WinnowFingerprint(e.head, 3, 4))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      arity1("minhash_signature")(e => MinHashSignature(e.head, 128))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      arity1("simhash64")(e => SimHash64(e.head))))
  }
}
