package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.KmerCodec

/** Static, codegen-friendly kernels behind the Catalyst expressions.
  * Deliberately JVM-static (object methods) so generated code calls them
  * directly without serialized closures. Invalid input uses in-band
  * sentinels (empty string / -1L) to keep the expressions non-nullable
  * and the generated code branch-free.
  */
object KmerFns {
  private def rcChar(c: Char): Char = c match {
    case 'A' | 'a' => 'T'; case 'C' | 'c' => 'G'
    case 'G' | 'g' => 'C'; case 'T' | 't' => 'A'
    case _ => 0
  }

  /** Reverse complement; "" if any base is invalid. */
  def revComp(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new Array[Char](str.length)
    var i = 0
    while (i < str.length) {
      val rc = rcChar(str.charAt(str.length - 1 - i))
      if (rc == 0) return UTF8String.EMPTY_UTF8
      out(i) = rc
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** min(s, revcomp(s)); "" if any base is invalid. */
  def canonical(s: UTF8String): UTF8String = {
    val rc = revComp(s)
    if (rc.numBytes() == 0 && s.numBytes() != 0) UTF8String.EMPTY_UTF8
    else if (s.compareTo(rc) <= 0) s else rc
  }

  /** 2-bit pack (k <= 31); -1 when invalid or out of contract. */
  def pack(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty || str.length > 31) -1L
    else KmerCodec.encodeLong(str, 0, str.length)
  }

  /** Unpack k bases from a packed Long; "" for out-of-contract k. */
  def unpack(v: Long, k: Int): UTF8String =
    if (k < 1 || k > 31 || v < 0) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(KmerCodec.decodeLong(v, k))
}

/** `canonical_kmer(str)` — native Catalyst expression with codegen: stays
  * inside WholeStageCodegen instead of breaking the stage like a Scala UDF
  * would (SURVEY §2.7 -> "functions, not UDFs"). */
case class CanonicalKmer(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_kmer"
  protected override def nullSafeEval(input: Any): Any =
    KmerFns.canonical(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmerFns.canonical($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalKmer =
    copy(child = newChild)
}

/** `revcomp(str)`. */
case class ReverseComplement(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "revcomp"
  protected override def nullSafeEval(input: Any): Any =
    KmerFns.revComp(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmerFns.revComp($c)")
  override protected def withNewChildInternal(newChild: Expression): ReverseComplement =
    copy(child = newChild)
}

/** `kmer_pack(str)` -> 2-bit packed Long (-1 sentinel when invalid). */
case class KmerPack(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "kmer_pack"
  protected override def nullSafeEval(input: Any): Any =
    KmerFns.pack(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmerFns.pack($c)")
  override protected def withNewChildInternal(newChild: Expression): KmerPack =
    copy(child = newChild)
}

/** `kmer_unpack(packed, k)` -> ACGT string. */
case class KmerUnpack(left: Expression, right: Expression) extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = StringType
  override def prettyName: String = "kmer_unpack"
  protected override def nullSafeEval(v: Any, k: Any): Any =
    KmerFns.unpack(v.asInstanceOf[Long], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, k) => s"graft.functions.KmerFns.unpack($v, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KmerUnpack =
    copy(left = newLeft, right = newRight)
}

/** Catalyst optimizer rule: algebraic identities of the k-mer domain.
  * `canonical(rc(x)) == canonical(x)` and `canonical` is idempotent —
  * both hold for invalid input too (every side degenerates to the ""
  * sentinel), so the rewrites are semantics-preserving unconditionally.
  * (`rc(rc(x)) -> x` is deliberately NOT rewritten: it fails for
  * invalid x, where the inner rc collapses to "".) */
object KmerAlgebra extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case CanonicalKmer(ReverseComplement(x)) => CanonicalKmer(x)
      case CanonicalKmer(c @ CanonicalKmer(_)) => c
    }
}

/** Registration: either call [[GraftFunctions.register]] on a live session,
  * or install [[GraftExtensions]] via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "canonical_kmer" -> (args => CanonicalKmer(args.head)),
    "revcomp" -> (args => ReverseComplement(args.head)),
    "kmer_pack" -> (args => KmerPack(args.head)),
    "kmer_unpack" -> (args => KmerUnpack(args(0), args(1))),
    "rolling_hash" -> (args => RollingHash(args.head)),
    "vec_dot" -> (args => VecDot(args(0), args(1))),
    "simhash60" -> (args => SimHash60Agg(args.head)))

  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(KmerAlgebra)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ KmerAlgebra
    }
  }
}

/** SparkSessionExtensions installer for cluster-wide registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.KmerExpressions", name), builder))
    }
    ext.injectOptimizerRule(_ => KmerAlgebra)
  }
}
