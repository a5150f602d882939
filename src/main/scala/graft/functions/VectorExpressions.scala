package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — sequential dot product over float/double arrays,
  * accumulated in double, as a native codegen'd Catalyst expression.
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation in
  * the ANN/similarity layer: Spark's array higher-order functions are
  * CodegenFallback, so that form interpreted BOTH lambdas per element and
  * allocated a zipped intermediate array per row — on the candidate-pair
  * scoring paths (s1/s2/s4/s5) that was the hot loop. This expression is
  * one fused JIT'd loop inside WholeStageCodegen.
  *
  * Semantics match the HOF form and DuckDB's `list_dot_product` on
  * `embedding::DOUBLE[]`: elements are widened to double BEFORE the
  * multiply, products accumulate left-to-right (FP addition order is part
  * of the oracle contract), and a null array yields null. Array elements
  * are assumed non-null (dense vectors); length mismatch uses the shorter
  * prefix. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> or array<double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
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
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val xa = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val ya = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $xa * $ya; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Static kernel + expression for `int8_quant(v)` — see [[Int8Quant]]. */
object VecFns {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  /** One-pass symmetric int8 quantization of a float vector: amax =
    * max(max_i |x_i|, 1e-12); q_i = round(x_i * 127 / amax) (HALF_UP via
    * BigDecimal — Spark's `round` semantics, NOT Math.round, which
    * differs on negative .5); sse = sum of squared reconstruction errors
    * x_i - q_i*amax/127 accumulated left-to-right. Bit-identical to the
    * declarative transform/zip_with chain it replaces (which ran as
    * CodegenFallback: four interpreted lambdas + four intermediate
    * arrays per row), assuming NaN-free input (dense embeddings). */
  def int8Quant(arr: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = arr.numElements()
    var amax = 1e-12
    var i = 0
    while (i < n) {
      val x = math.abs(arr.getFloat(i).toDouble)
      if (x > amax) amax = x
      i += 1
    }
    val sb = new java.lang.StringBuilder(n * 4)
    var sse = 0.0
    i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      val q = java.math.BigDecimal.valueOf(x * 127.0 / amax)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      if (i > 0) sb.append(',')
      sb.append(q)
      val e = x - q.toDouble * amax / 127.0
      sse += e * e
      i += 1
    }
    new GenericInternalRow(
      Array[Any](amax, UTF8String.fromString(sb.toString), sse))
  }

  /** Sign-bit packing for [[SignPack]]: bit j iff v[j] > 0, dims past 64
    * ignored. */
  def signPack(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(arr.numElements(), 64)
    var code = 0L
    var i = 0
    while (i < n) {
      if (arr.getFloat(i) > 0f) code |= (1L << i)
      i += 1
    }
    code
  }
}

/** `sign_pack(v: array<float>)` -> long: bit j set iff v[j] > 0 — the
  * 1-bit (sign) quantization code for binary Hamming ANN (s15). One
  * machine word per vector (32x smaller than the float array), so the
  * Hamming distance between two vectors is a single XOR + POPCNT.
  * Contract: dim <= 64 (extra elements ignored) and NaN-free input —
  * the strict `> 0` test sends +0.0/-0.0 to bit 0 in both this kernel
  * and the oracle's double-widened `v[i] > 0`, keeping the two engines'
  * codes identical bit for bit. */
case class SignPack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sign_pack requires array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_pack"
  protected override def nullSafeEval(input: Any): Any =
    VecFns.signPack(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFns.signPack($c)")
  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** `int8_quant(v: array<float>)` -> struct(amax, q, sse): the s6
  * symmetric per-vector quantization as ONE codegen'd kernel call per
  * row (see [[VecFns.int8Quant]]) instead of the interpreted
  * transform/zip_with chain. */
case class Int8Quant(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"int8_quant requires array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("amax", DoubleType, nullable = false),
    StructField("q", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("sse", DoubleType, nullable = false)))
  override def prettyName: String = "int8_quant"
  protected override def nullSafeEval(input: Any): Any =
    VecFns.int8Quant(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFns.int8Quant($c)")
  override protected def withNewChildInternal(newChild: Expression): Int8Quant =
    copy(child = newChild)
}
