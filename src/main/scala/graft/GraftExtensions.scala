package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL-surface registration for the engine's native Catalyst expressions
  * (`SparkSessionExtensions.injectFunction`) — SQL-text users get the same
  * codegen'd kernels the DataFrame lanes use, with no UDF fallback:
  *
  *  - `l2_dist_sq(a, b)`   — fused squared-L2 over float/double arrays
  *  - `dot_f(a, b)`        — dot product, double accumulation
  *  - `l2_norm_f(a)`       — L2 norm
  *  - `simhash64(a)`       — 64-bit SimHash over hashed term arrays
  *  - `bottom_k_distinct(x, k)` — KMV bottom-k distinct sketch aggregate
  *  - `top_k_pairs(key, payload, k)` — bounded-heap top-k pair aggregate
  *  - `bloom_sketch(x, mBits, kHashes)` — mergeable Bloom-filter aggregate
  *  - `hll_sketch(x, p)`   — mergeable HyperLogLog NDV-state aggregate
  *
  * Registered on every [[GraftSession]] (the `configure` contract), so
  * `spark.sql("... top_k_pairs(...) ...")` plans the same Partial-mode
  * TypedImperativeAggregate the audited DataFrame lanes run — q74 puts the
  * SQL-text path under the driver's DuckDB gate against a window oracle.
  *
  * Deploys like any Spark extension: `spark.sql.extensions=graft.GraftExtensions`
  * on a cluster, or `builder.withExtensions(new GraftExtensions)` in code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.defs.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** k arguments must be integer literals — the heap aggregates size their
    * buffers at plan time. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: k must be an INT literal, got $other")
  }

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  val defs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("l2_dist_sq"), info("l2_dist_sq", classOf[L2DistSq]),
      (args: Seq[Expression]) => L2DistSq(args(0), args(1))),
    (FunctionIdentifier("dot_f"), info("dot_f", classOf[DotProductF]),
      (args: Seq[Expression]) => DotProductF(args(0), args(1))),
    (FunctionIdentifier("l2_norm_f"), info("l2_norm_f", classOf[L2NormF]),
      (args: Seq[Expression]) => L2NormF(args(0))),
    (FunctionIdentifier("simhash64"), info("simhash64", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("bottom_k_distinct"), info("bottom_k_distinct", classOf[BottomKDistinct]),
      (args: Seq[Expression]) =>
        BottomKDistinct(args(0), intLit(args(1), "bottom_k_distinct"))),
    (FunctionIdentifier("top_k_pairs"), info("top_k_pairs", classOf[TopKPairs]),
      (args: Seq[Expression]) =>
        TopKPairs(args(0), args(1), intLit(args(2), "top_k_pairs"))),
    (FunctionIdentifier("bloom_sketch"), info("bloom_sketch", classOf[BloomSketch]),
      (args: Seq[Expression]) =>
        BloomSketch(args(0), intLit(args(1), "bloom_sketch"),
          intLit(args(2), "bloom_sketch"))),
    (FunctionIdentifier("hll_sketch"), info("hll_sketch", classOf[HllSketch]),
      (args: Seq[Expression]) =>
        HllSketch(args(0), intLit(args(1), "hll_sketch"))))
}
