package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the per-row numeric hot paths where
  * higher-order functions allocate per element (SURVEY §4: "codegen'd
  * expression ... if transform() shows up in profiles" — it did: the nested
  * HOF SimHash was 12s at sf0.1; these fold the whole array in one pass).
  * All implement doGenCode so they stay inside WholeStageCodegen spans;
  * nullSafeEval is the interpreted fallback.
  */

/** simhash64(array<long>) -> long: majority vote per bit over token hashes. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
        int[] $votes = new int[64];
        for (int $i = 0; $i < $a.numElements(); $i++) {
          long $h = $a.getLong($i);
          for (int $b = 0; $b < 64; $b++) {
            if (((${h} >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
          }
        }
        ${ev.value} = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] >= 0) ${ev.value} |= (1L << $b);
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** dot_f(array<float>, array<float>) -> double, accumulated in double in
  * ascending index order (bit-compatible with the DuckDB oracle's
  * list_sum(list_transform(...)) evaluation). */
case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // element types are per-plan constants after analysis — hoisted to lazy
  // vals so the interpreted path doesn't re-pattern-match per row
  private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_f requires ARRAY<FLOAT|DOUBLE> children, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (leftIsFloat, rightIsFloat)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val getL = if (leftIsFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (rightIsFloat) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        ${ev.value} = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${ev.value} += $getL * $getR;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

/** l2_norm_f(array<float|double>) -> double. */
case class L2NormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // per-plan constant (see DotProductF) — not re-derived per row
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"l2_norm_f requires an ARRAY<FLOAT|DOUBLE> child, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val lf = isFloat
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val get = if (isFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        double $s = 0.0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          double $v = $get;
          $s += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(c: Expression): L2NormF = copy(child = c)
}

/** hyperplane_bucket(array<float>) -> long: sign bit per hyperplane
  * (random-projection LSH bucketing in one pass; the planes ride along as a
  * literal constructor param, referenced from generated code). */
case class HyperplaneSignBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val d = x.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(d, plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * plane(i); i += 1 }
      if (s >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        ${ev.value} = 0L;
        for (int $p = 0; $p < $planesRef.length; $p++) {
          int $n = java.lang.Math.min($a.numElements(), $planesRef[$p].length);
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += (double)$a.getFloat($i) * $planesRef[$p][$i];
          }
          if ($s >= 0.0) ${ev.value} |= (1L << $p);
        }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignBucket =
    copy(child = c)
}

/** nearest_centroid(array<float|double>) -> int: argmin of squared Euclidean
  * distance to the literal centroid set (IVF coarse assignment) in one pass.
  * Element-type-aware so it runs both on raw `array<float>` embeddings and
  * on derived `array<double>` residual columns (the IVFPQ encode path).
  */
case class NearestCentroid(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  // unsupported element types fail at ANALYSIS time, not as an opaque
  // eval/codegen IllegalArgumentException mid-job (ADVICE r6)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float|double>, got ${t.catalogString}")
    }

  private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var k = 0
    while (k < centers.length) {
      val c = centers(k)
      val n = math.min(x.numElements(), c.length)
      var s = 0.0
      var j = 0
      while (j < n) {
        val v = if (floatElems) x.getFloat(j).toDouble else x.getDouble(j)
        val diff = v - c(j); s += diff * diff; j += 1
      }
      if (s < bestD) { bestD = s; best = k }
      k += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("centers", centers, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val get = if (floatElems) s"(double)$a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
        ${ev.value} = 0;
        double $bestD = Double.MAX_VALUE;
        for (int $k = 0; $k < $centersRef.length; $k++) {
          int $n = java.lang.Math.min($a.numElements(), $centersRef[$k].length);
          double $s = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            double $diff = $get - $centersRef[$k][$j];
            $s += $diff * $diff;
          }
          if ($s < $bestD) { $bestD = $s; ${ev.value} = $k; }
        }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** l2_dist_sq(array<float|double>, array<float|double>) -> double: squared
  * Euclidean distance Σ(x_i - y_i)², accumulated in double in ascending
  * index order — the same math and order as the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)` it replaces on
  * the kNN hot path (h11/LISI: the HOF allocates a zipped array per pair;
  * at 200 probes x 1M cells that is 200M transient arrays — this stays a
  * fused scalar loop inside WholeStageCodegen). Element types are read from
  * the child ArrayTypes so float fixtures and double Harmony outputs share
  * one expression. */
case class L2DistSq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // per-plan constants (see DotProductF) — not re-derived per row
  private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_dist_sq requires ARRAY<FLOAT|DOUBLE> children, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = leftIsFloat
    val rf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val getL = if (leftIsFloat) s"(double)$a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getR = if (rightIsFloat) s"(double)$b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        ${ev.value} = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $getL - $getR;
          ${ev.value} += $d * $d;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2DistSq =
    copy(left = l, right = r)
  override def prettyName: String = "l2_dist_sq"
}

/** sorted_set_overlap(array<long>) -> boolean: true iff ANY element of the
  * input hits the FROZEN sorted long set (binary search per element).
  * Built for the st29 admission lane's decontamination check: the frozen
  * eval-gram set grows with the eval benchmark (134k entries at the 1M-doc
  * rehearsal), and the HOF `exists(.., array_contains(lit, ..))` form
  * scans the whole literal per element INTERPRETED — O(|grams| x |set|)
  * per doc, measured as a hang at rehearsal scale. This expression is one
  * codegen'd loop with O(|grams| x log|set|) lookups against a single
  * shared reference array (no per-row set build, unlike arrays_overlap's
  * per-row hash set). */
case class SortedSetOverlap(child: Expression, sorted: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_set_overlap requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sorted", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        ${ev.value} = false;
        int $n = $a.numElements();
        for (int $i = 0; $i < $n && !${ev.value}; $i++) {
          ${ev.value} = java.util.Arrays.binarySearch($setRef, $a.getLong($i)) >= 0;
        }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): SortedSetOverlap =
    copy(child = c)
  override def prettyName: String = "sorted_set_overlap"
}

object VectorExpressions {
  /** overlap of an array<long> column with a frozen sorted long set. */
  def sortedSetOverlap(c: Column, sorted: Array[Long]): Column =
    GraftShims.column(SortedSetOverlap(GraftShims.expression(c), sorted))

  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c)))
  def dotF(a: Column, b: Column): Column =
    GraftShims.column(DotProductF(GraftShims.expression(a), GraftShims.expression(b)))
  def l2NormF(c: Column): Column =
    GraftShims.column(L2NormF(GraftShims.expression(c)))

  /** cosine over float arrays (double math, oracle-compatible order). */
  def cosineF(a: Column, b: Column): Column = dotF(a, b) / (l2NormF(a) * l2NormF(b))

  def hyperplaneBucket(c: Column, planes: Array[Array[Double]]): Column =
    GraftShims.column(HyperplaneSignBucket(GraftShims.expression(c), planes))

  def nearestCentroid(c: Column, centers: Array[Array[Double]]): Column =
    GraftShims.column(NearestCentroid(GraftShims.expression(c), centers))

  /** Squared Euclidean distance over float/double arrays (double math,
    * index order — HOF- and oracle-compatible). */
  def l2DistSq(a: Column, b: Column): Column =
    GraftShims.column(L2DistSq(GraftShims.expression(a), GraftShims.expression(b)))

  /** Row-local twin of [[L2DistSq]] for kernels that run the distance
    * inside a Scala closure (s40's grouped robust prune): same element
    * order, same double accumulation — bit-identical to the expression
    * (spec-tested). */
  def l2DistSqLocal(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a(i) - b(i)
      s += d * d
      i += 1
    }
    s
  }
}
