package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document winnowing fingerprint set in ONE row-local expression
  * (VERDICT r17 #3, d17's contention pathology): token array in, sorted
  * distinct window-minimum hashes out.
  *
  * Semantics are byte-for-byte the old declarative pipeline's — hash
  * every word k-gram with the md5-derived 60-bit lane
  * ([[CrossEngine.md5Hash60]]: first 15 hex chars of md5 as a long),
  * slide a length-`w` window over the gram hashes, keep each window's
  * MINIMUM, emit the distinct minima — but the old form materialized a
  * corpus-scale stride-1 GRAM-STRING table (explode → ~n_tokens rows per
  * doc, each carrying a k-token string) and then paid a per-doc window
  * sort plus a distinct shuffle to throw ~7/9 of it away. Under box
  * contention that intermediate is exactly the memory-pressure spill/GC
  * amplifier the r17 bench caught (5.2 s quiet → 206 s at load 3.2).
  * Here nothing outlives one row's evaluation: gram hashes land in one
  * primitive array, the sliding minimum is a monotonic deque
  * (O(n_grams) total), and the output is bounded by the fingerprint
  * DENSITY ~2/(w+1), so the only thing the engine ever shuffles is the
  * sparse fingerprint table itself.
  *
  * Window rule (Schleimer '03 robust winnowing, as the old pipeline
  * implemented it): docs with fewer than k tokens yield no grams; with
  * n_grams <= w, exactly one window over what grams exist; otherwise all
  * n_grams-w+1 full windows. Ties collapse in the distinct. */
case class WinnowFingerprintSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow needs k,w >= 1; got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    new GenericArrayData(Winnow.fingerprints(toks, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val toks = ctx.freshName("toks")
      s"""
        int $n = $c.numElements();
        java.lang.String[] $toks = new java.lang.String[$n];
        for (int $i = 0; $i < $n; $i++) {
          $toks[$i] = $c.getUTF8String($i).toString();
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.Winnow.fingerprints($toks, $k, $w));
      """
    })

  override protected def withNewChildInternal(c: Expression): WinnowFingerprintSet =
    copy(child = c)
  override def prettyName: String = "winnow_fingerprint_set"
}

object Winnow {
  /** The row-local kernel: k-gram 60-bit md5 hashes → sliding-window
    * minima via a monotonic deque → sorted distinct. Allocation is
    * bounded by the doc's own gram count; nothing is materialized
    * corpus-wide. */
  def fingerprints(toks: Array[String], k: Int, w: Int): Array[Long] = {
    val n = toks.length
    if (n < k) return Array.emptyLongArray
    val nG = n - k + 1
    val h = new Array[Long](nG)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nG) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars of the digest = the first 60 bits: 7 full
      // bytes then the 8th byte's HIGH nibble (CrossEngine.md5Hash60's
      // conv(substring(md5, 1, 15), 16, 10) lane, exactly)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      h(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    // sliding minima over windows [p, p+w-1] for p in 0..max(nG-w, 0),
    // clipped to the grams that exist — a monotonic deque of indices
    val nWin = math.max(nG - w, 0) + 1
    val mins = new Array[Long](nWin)
    val dq = new Array[Int](nG)
    var head = 0
    var tail = 0 // dq[head until tail], increasing h
    var g = 0
    var p = 0
    while (p < nWin) {
      val end = math.min(p + w, nG) // exclusive
      while (g < end) {
        while (tail > head && h(dq(tail - 1)) >= h(g)) tail -= 1
        dq(tail) = g
        tail += 1
        g += 1
      }
      while (dq(head) < p) head += 1
      mins(p) = h(dq(head))
      p += 1
    }
    // sorted distinct
    java.util.Arrays.sort(mins)
    var out = 1
    var q = 1
    while (q < nWin) {
      if (mins(q) != mins(out - 1)) { mins(out) = mins(q); out += 1 }
      q += 1
    }
    if (out == nWin) mins else java.util.Arrays.copyOf(mins, out)
  }

  /** Column form over a token array: the doc's sorted distinct winnowing
    * fingerprint set. */
  def fingerprintSet(tokens: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowFingerprintSet(GraftShims.expression(tokens), k, w))
}
