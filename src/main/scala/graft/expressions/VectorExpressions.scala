package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen vector kernels over `ARRAY<DOUBLE>` columns.
  *
  * Why these exist: the HOF formulation (`transform`/`zip_with`/`aggregate`)
  * is interpreted (`CodegenFallback`) and — worse — Catalyst's
  * `CollapseProject` inlines a precomputed norm column back into the
  * `transform` lambda, re-evaluating the O(dim) norm once PER ELEMENT
  * (O(dim²) per row; the round-1 verdict measured ~2.7× on cosine vs
  * euclidean at dim=64). Each expression here evaluates its norm exactly
  * once per row inside a single generated loop, participates in
  * whole-stage codegen, and cannot be torn apart by the optimizer.
  *
  * Float semantics are bit-identical to the HOF forms (and to the DuckDB
  * oracle SQL in [[graft.Oracle]]): left-to-right folds seeded with 0.0,
  * `1e-12` eps added to the L2 norm before dividing (reference
  * index.py:4-8), cosine = normalize-both-then-dot (reference
  * index.py:11-16), NOT `dot/(na*nb)` which rounds differently.
  *
  * Null contract: null input array → null result (`nullIntolerant`);
  * array elements are assumed non-null doubles (enforced by the fixture
  * schema and `VectorTable`'s dim check).
  */
object VectorExpressions {
  val Eps = 1e-12

  /** Accept ARRAY<DOUBLE> regardless of element nullability flag.
    * (`ExpectsInputTypes` is not implementable outside the sql package in
    * Spark 4 — `AbstractDataType` is `private[sql]` — so the check is
    * hand-rolled.) */
  private def checkArrayDouble(name: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects ARRAY<DOUBLE> inputs, got ${types.mkString(", ")}")

  /** Whether an input's type admits null elements. The kernels read
    * primitive slots, so a null element would silently yield 0.0 —
    * instead they raise. The guard is emitted ONLY when the type says
    * nulls are possible: kernel outputs (`containsNull=false`) chain
    * guard-free, so e.g. the knn pair loop over pre-normalized vectors
    * pays nothing. */
  private def mayContainNull(t: DataType): Boolean = t match {
    case ArrayType(_, n) => n
    case _ => true
  }

  private def nullElement(name: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name: null array element at index $i (null elements are not supported)")

  /** Binary kernels demand equal lengths — the reference raises on
    * dimension mismatch (storage.py:15-16), and silently folding over
    * the common prefix would diverge from the HOF/oracle forms. */
  private def lengthMismatch(name: String, nx: Int, ny: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name: array length mismatch ($nx vs $ny)")

  private def lengthCheckCode(name: String, nx: String, ny: String): String =
    s"""if ($nx != $ny) throw new IllegalArgumentException(
       |  "$name: array length mismatch (" + $nx + " vs " + $ny + ")");""".stripMargin

  /** Codegen guard line — empty when the input type has no null slots. */
  private def guardCode(guard: Boolean, name: String, arr: String, i: String): String =
    if (guard)
      s"""if ($arr.isNullAt($i)) throw new IllegalArgumentException(
         |  "$name: null array element at index " + $i + " (null elements are not supported)");""".stripMargin
    else ""

  /** Dot product `Σ a[i]*b[i]`, left fold from 0.0. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(left.dataType, right.dataType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot"

    private def guardL = mayContainNull(left.dataType)
    private def guardR = mayContainNull(right.dataType)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) lengthMismatch(prettyName, n, y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (guardL && x.isNullAt(i)) nullElement(prettyName, i)
        if (guardR && y.isNullAt(i)) nullElement(prettyName, i)
        acc += x.getDouble(i) * y.getDouble(i); i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val ny = ctx.freshName("ny")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $x.numElements();
           |int $ny = $y.numElements();
           |${lengthCheckCode(prettyName, n, ny)}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${guardCode(guardL, prettyName, x, i)}
           |  ${guardCode(guardR, prettyName, y, i)}
           |  $acc += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Eps-guarded L2 normalize `v / (sqrt(Σ v[i]²) + 1e-12)` — the norm is
    * computed once per row inside the kernel (reference index.py:4-8). */
  case class VecL2Normalize(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(child.dataType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_l2_normalize"

    private def guard = mayContainNull(child.dataType)

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var ss = 0.0
      var i = 0
      while (i < n) {
        if (guard && x.isNullAt(i)) nullElement(prettyName, i)
        val v = x.getDouble(i); ss += v * v; i += 1
      }
      val nrm = math.sqrt(ss) + Eps
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val ss = ctx.freshName("ss")
        val nrm = ctx.freshName("nrm")
        val out = ctx.freshName("out")
        val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double $ss = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${guardCode(guard, prettyName, x, i)}
           |  double $v = $x.getDouble($i);
           |  $ss += $v * $v;
           |}
           |double $nrm = java.lang.Math.sqrt($ss) + ${Eps}D;
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $x.getDouble($i) / $nrm;
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Cosine similarity: both norms computed once, then the left fold of
    * `(a[i]/na) * (b[i]/nb)` — bit-identical to normalize-both-then-dot
    * (reference index.py:11-16). Unequal lengths raise (the HOF form
    * would yield NULL via zip_with padding; a silent common-prefix fold
    * diverged from the spec — round-2 advice). */
  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(left.dataType, right.dataType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_cosine"

    private def guardL = mayContainNull(left.dataType)
    private def guardR = mayContainNull(right.dataType)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) lengthMismatch(prettyName, n, y.numElements())
      var ssx = 0.0
      var ssy = 0.0
      var i = 0
      while (i < n) {
        if (guardL && x.isNullAt(i)) nullElement(prettyName, i)
        if (guardR && y.isNullAt(i)) nullElement(prettyName, i)
        val vx = x.getDouble(i); ssx += vx * vx
        val vy = y.getDouble(i); ssy += vy * vy
        i += 1
      }
      val nx = math.sqrt(ssx) + Eps
      val ny = math.sqrt(ssy) + Eps
      var acc = 0.0
      i = 0
      while (i < n) { acc += (x.getDouble(i) / nx) * (y.getDouble(i) / ny); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val nyLen = ctx.freshName("nyLen")
        val ssx = ctx.freshName("ssx")
        val ssy = ctx.freshName("ssy")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val acc = ctx.freshName("acc")
        val vx = ctx.freshName("vx")
        val vy = ctx.freshName("vy")
        s"""
           |int $n = $x.numElements();
           |int $nyLen = $y.numElements();
           |${lengthCheckCode(prettyName, n, nyLen)}
           |double $ssx = 0.0; double $ssy = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${guardCode(guardL, prettyName, x, i)}
           |  ${guardCode(guardR, prettyName, y, i)}
           |  double $vx = $x.getDouble($i); $ssx += $vx * $vx;
           |  double $vy = $y.getDouble($i); $ssy += $vy * $vy;
           |}
           |double $nx = java.lang.Math.sqrt($ssx) + ${Eps}D;
           |double $ny = java.lang.Math.sqrt($ssy) + ${Eps}D;
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ($x.getDouble($i) / $nx) * ($y.getDouble($i) / $ny);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Euclidean distance `sqrt(Σ (a[i]-b[i])²)` (reference index.py:25-29). */
  case class VecEuclideanDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(left.dataType, right.dataType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_euclidean_distance"

    private def guardL = mayContainNull(left.dataType)
    private def guardR = mayContainNull(right.dataType)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) lengthMismatch(prettyName, n, y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (guardL && x.isNullAt(i)) nullElement(prettyName, i)
        if (guardR && y.isNullAt(i)) nullElement(prettyName, i)
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val ny = ctx.freshName("ny")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = $x.numElements();
           |int $ny = $y.numElements();
           |${lengthCheckCode(prettyName, n, ny)}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${guardCode(guardL, prettyName, x, i)}
           |  ${guardCode(guardR, prettyName, y, i)}
           |  double $d = $x.getDouble($i) - $y.getDouble($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** One-pass int8-quantization statistics over ARRAY<DOUBLE> — the
    * kernel behind `q_quantize`. Replicates the HOF/oracle arithmetic
    * bit-for-bit (`s = max|x|/127`, `c_i = clamp(floor(x_i/s + 0.5),
    * ±127)`, reconstruction `c_i·s`, LEFT-fold error sum seeded 0.0) in
    * one generated pass: the HOF form was CodegenFallback and paid
    * O(dim²) interpreted lambda evals per row after CollapseProject
    * inlined the scale into the transform (plus a self-join to recover
    * the original vector for the error fold — the kernel sees both at
    * once). Output: (scale_micro, code_sum, code_max, err_micro), all
    * LONG, floor-scaled micros. Zero vectors quantize to all-zero. */
  case class VecQuantizeStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(child.dataType))
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scale_micro",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("code_sum",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("code_max",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("err_micro",
        org.apache.spark.sql.types.LongType, nullable = false)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_quantize_stats"

    override protected def nullSafeEval(a: Any): Any =
      VectorExpressions.quantizeStats(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.expressions.VectorExpressions$$.MODULE$$.quantizeStats($c)")

    override protected def withNewChildInternal(newChild: Expression): VecQuantizeStats =
      copy(child = newChild)
  }

  /** Runtime body of [[VecQuantizeStats]] — static so generated code
    * calls it directly. Fold order matches the HOF forms exactly
    * (ascending index, seed 0.0). */
  def quantizeStats(x: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = x.numElements()
    var maxAbs = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = java.lang.Math.abs(x.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val s = maxAbs / 127.0
    var codeSum = 0.0
    var codeMax = Double.NegativeInfinity
    var errSum = 0.0
    i = 0
    while (i < n) {
      val v = x.getDouble(i)
      val c =
        if (s > 0.0)
          java.lang.Math.max(java.lang.Math.min(
            java.lang.Math.floor(v / s + 0.5), 127.0), -127.0)
        else 0.0
      codeSum += c
      if (c > codeMax) codeMax = c
      errSum += java.lang.Math.abs(v - c * s)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      java.lang.Math.floor(s * 1e6).toLong,
      codeSum.toLong,
      codeMax.toLong,
      java.lang.Math.floor(errSum * 1e6).toLong))
  }

  /** Natural log via the PLATFORM `java.lang.Math.log` — NOT Spark's
    * built-in `log`, which evaluates `StrictMath.log` (fdlibm) and
    * diverges from libm by 1 ULP on some inputs (measured: df=394 BM25
    * idf). DuckDB's `ln` is libm, and on this platform `Math.log`
    * matches libm bit-for-bit, so oracle-parity formulas that need a
    * logarithm (BM25 idf) must use this kernel. Same 1-ULP caveat as
    * every transcendental: the contract is platform parity, not
    * correctly-rounded math. */
  case class PlatformLn(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects DOUBLE, got ${child.dataType.catalogString}")
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "platform_ln"

    override protected def nullSafeEval(a: Any): Any =
      java.lang.Math.log(a.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

    override protected def withNewChildInternal(newChild: Expression): PlatformLn =
      copy(child = newChild)
  }

  // ------------------------------------------------------ Column surface ---

  def platformLn(x: Column): Column =
    ColumnGlue.column(PlatformLn(ColumnGlue.expression(x)))

  def dot(a: Column, b: Column): Column =
    ColumnGlue.column(VecDot(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  def l2Normalize(v: Column): Column =
    ColumnGlue.column(VecL2Normalize(ColumnGlue.expression(v)))

  def cosine(a: Column, b: Column): Column =
    ColumnGlue.column(VecCosine(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  def euclideanDistance(a: Column, b: Column): Column =
    ColumnGlue.column(
      VecEuclideanDistance(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  def quantizeStatsCol(v: Column): Column =
    ColumnGlue.column(VecQuantizeStats(ColumnGlue.expression(v)))
}
