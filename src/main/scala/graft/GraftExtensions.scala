package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Exprs

/** `SparkSessionExtensions` injector — the spark-submit-native way to
  * load the engine's custom Catalyst expressions into ANY session:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or in code:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Registers the model-free scalar surface (the functions whose state is
  * baked into the expression): `hamming64`, `graft_simhash64`,
  * `graft_scrub`, `graft_minhash_bands`. The model-BOUND functions
  * (`graft_langid` / `graft_accepted_prob` / `graft_perplexity`) carry a
  * broadcast handle that only exists after a fit, so they stay on the
  * per-session path `Exprs.registerSql(spark, langId, lm)` — a static
  * extension cannot (and should not) conjure model state.
  *
  * This is tier (b)/(c) of the builder contract's custom-operator
  * preference order: native expressions, registered through the standard
  * extension point rather than ad-hoc session mutation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** (name, info, builder) for every model-free native expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("hamming64",
      info("hamming64", "hamming64(a, b) - popcount(a XOR b) over 64-bit fingerprints"),
      (es: Seq[Expression]) => { arity("hamming64", es, 2); Exprs.Hamming64(es(0), es(1)) }),
    ("graft_simhash64",
      info("graft_simhash64", "graft_simhash64(text) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => { arity("graft_simhash64", es, 1); Exprs.SimHash64(es.head) }),
    ("graft_scrub",
      info("graft_scrub", "graft_scrub(text) - single-pass PII/toxicity scrub chain"),
      (es: Seq[Expression]) => { arity("graft_scrub", es, 1); Exprs.ScrubAll(es.head) }),
    ("graft_minhash_bands",
      info("graft_minhash_bands",
        "graft_minhash_bands(text, k, hashes, bands) - MinHash-LSH band keys"),
      (es: Seq[Expression]) => {
        arity("graft_minhash_bands", es, 4)
        Exprs.MinhashBandKeys(es(0),
          foldToInt("graft_minhash_bands", "k", es(1)),
          foldToInt("graft_minhash_bands", "hashes", es(2)),
          foldToInt("graft_minhash_bands", "bands", es(3)))
      }))

  private def arity(name: String, es: Seq[Expression], expected: Int): Unit =
    if (es.length != expected) throw new IllegalArgumentException(
      s"$name expects $expected argument(s), got ${es.length}")

  /** SQL-surface parameter validation: the tuning knobs must be literal
    * ints (the expression bakes them into codegen). A column argument is
    * non-foldable — without this check it would hit eval() on an unbound
    * expression and surface as an opaque UnsupportedOperationException. */
  private def foldToInt(fn: String, param: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: parameter '$param' must be a literal integer, got non-literal ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$fn: parameter '$param' out of Int range: $l")
      case other => throw new IllegalArgumentException(
        s"$fn: parameter '$param' must be a literal integer, got $other")
    }
  }
}
