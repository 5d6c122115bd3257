package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ENTIRE learned BPE merge table to a space-joined symbol
  * string in one expression (VERDICT r17 #2).
  *
  * Semantics: exactly the left fold of [[graft.operators.TextAnalysis
  * .bpeApplyMerge]] over the merges in learned order — each merge (l, r)
  * is one greedy left-to-right pass where an accumulator whose LAST
  * symbol is `l` absorbs a following `r` into `l+r` (non-overlapping by
  * construction: the merged symbol `l+r` can never equal `l` again, r
  * being nonempty). The chained-`aggregate` form this replaces built one
  * projection per merge — ~n_merges nested higher-order-function
  * expressions that Catalyst collapses into one enormous non-codegen
  * tree, re-evaluated in every plan branch that touches the tokenized
  * vocab. Here the whole table is a single referenced object and the
  * fold is a tight two-array loop inside whole-stage codegen; the
  * equivalence to the chained fold is property-tested in OperatorsSpec.
  *
  * Scale shape: evaluated once per DISTINCT word (vocab scale, never
  * corpus scale); the merge table rides along as one broadcast-sized
  * reference object exactly like the production 30k-merge artifact
  * would. */
case class BpeApplyAllMerges(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeApply.applyAll(input.asInstanceOf[UTF8String].toString, merges))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.BpeApply.applyAll($s.toString(), $ref));""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): BpeApplyAllMerges =
    copy(child = c)
  override def prettyName: String = "bpe_apply_all_merges"
}

object BpeApply {
  /** The sequential greedy fold, shared by eval and codegen. Words are
    * short and the loop allocates one reusable buffer, so the cost per
    * row is O(n_merges · n_symbols) string compares — no per-merge
    * split/rejoin round trips. */
  def applyAll(s: String, merges: Array[Array[String]]): String = {
    var syms: Array[String] = s.split(' ')
    var m = 0
    while (m < merges.length) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      val out = new Array[String](syms.length)
      var n = 0
      var i = 0
      while (i < syms.length) {
        val x = syms(i)
        if (n > 0 && (x == r) && (out(n - 1) == l)) out(n - 1) = l + x
        else { out(n) = x; n += 1 }
        i += 1
      }
      syms = if (n == syms.length) out else java.util.Arrays.copyOf(out, n)
      m += 1
    }
    if (syms.length == 1) syms(0) else syms.mkString(" ")
  }

  /** Column form: apply the whole learned merge table in one codegen'd
    * expression. */
  def applyAllMerges(c: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeApplyAllMerges(GraftShims.expression(c),
      merges.map(p => Array(p._1, p._2)).toArray))
}
