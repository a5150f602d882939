package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-processing kernels as native expressions. */
object TextFns {
  final val Mod = 1000000000000037L // fits (Mod-1)*31 + cp in a Long

  /** Polynomial rolling hash over code points: h = (h*31 + cp) mod M.
    * Order-sensitive (a true content fingerprint, unlike a bag hash). */
  def rollingHash(s: UTF8String): Long = {
    var h = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) h = (h * 31 + it.nextInt()) % Mod
    h
  }
}

/** `rolling_hash(str)` -> Long — codegen'd document fingerprint. */
case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  protected override def nullSafeEval(input: Any): Any =
    TextFns.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFns.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
