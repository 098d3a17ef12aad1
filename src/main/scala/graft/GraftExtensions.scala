package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SQL surface for the custom Catalyst expressions, registered through
  * `SparkSessionExtensions` (the supported extension point — no session
  * internals touched). The reference provider is SQL-facing; with these
  * registered, a SQL-only user reaches every graft sketch kernel from
  * `spark.sql(...)`:
  *
  *   graft_minhash(text, numHashes, shingleLen) -> array<bigint>
  *   graft_simhash(text)                        -> bigint
  *   graft_fingerprint(text)                    -> bigint
  *   graft_gram_hashes(text, n)                 -> array<bigint>
  *   graft_char_gram_hashes(text, n)            -> array<bigint>
  *   graft_cosine(a, b)                         -> double
  *   graft_set_overlap(a, b)                    -> bigint (inter<<32|union)
  *   graft_jaro_winkler(a, b)                   -> double
  *   graft_bounded_distinct(v, limit)           -> array (agg; state ≤ limit)
  *   graft_bounded_topk(v, k)                   -> array<double> (agg; k largest w/ mult.)
  *
  * Activated by `GraftSession.builder` (spark.sql.extensions also works
  * for externally-launched sessions:
  * `--conf spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_minhash(text, numHashes, shingleLen)")
        MinHashSignature(args.head, intLit(args(1), "numHashes"),
          intLit(args(2), "shingleLen"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashKeys].getName, "graft_gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_gram_hashes(text, n)")
        GramHashKeys(args.head, intLit(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashKeys].getName, "graft_char_gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_char_gram_hashes(text, n)")
        CharGramHashKeys(args.head, intLit(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(text)")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_fingerprint(text)")
        RollingFingerprint(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b)")
        CosineSim(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_set_overlap"),
      new ExpressionInfo(classOf[SetOverlapCounts].getName, "graft_set_overlap"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_set_overlap(a, b)")
        SetOverlapCounts(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(a, b)")
        JaroWinklerSim(args.head, args(1))
      }))
    // the bounded aggregates (state structurally capped per key) — the
    // analyzer wraps returned AggregateFunctions itself, so these work
    // anywhere a SQL aggregate does
    ext.injectFunction((
      new FunctionIdentifier("graft_bounded_distinct"),
      new ExpressionInfo(classOf[BoundedDistinctSet].getName, "graft_bounded_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_bounded_distinct(v, limit)")
        BoundedDistinctSet(args.head, intLit(args(1), "limit"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bounded_topk"),
      new ExpressionInfo(classOf[BoundedTopKMultiset].getName, "graft_bounded_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_bounded_topk(v, k)")
        BoundedTopKMultiset(args.head,
          org.apache.spark.sql.catalyst.expressions.Literal(1L),
          intLit(args(1), "k"))
      }))
  }
}
