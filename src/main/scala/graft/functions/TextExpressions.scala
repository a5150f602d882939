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

/** `simhash60(hex64)` -> Long: native SimHash aggregate over 64-hex-char
  * digest strings — bit j of the result is set iff the count of rows
  * whose j-th hex char has odd ascii exceeds half (sum of +/-1 > 0),
  * exactly the 60-column `sum(CASE ...)` formulation of d11 but as ONE
  * [[org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate]]:
  * buffer = Array[Int](60), partial-merge = elementwise add (ObjectHashAggregate
  * keeps map-side combine), and the per-row work is a tight 60-step loop on
  * the UTF8 bytes — no 60-way substring/ascii expression fan-out and no
  * multi-second whole-stage-codegen compile of a 60-aggregate plan. */
case class SimHash60Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Int]]
  with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash60"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](60)

  override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[UTF8String].getBytes
      val n = math.min(60, b.length)
      var j = 0
      while (j < n) {
        buf(j) += (if ((b(j) & 1) == 1) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 60) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 60) { if (buf(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(240)
    var j = 0
    while (j < 60) { bb.putInt(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Int](60)
    var j = 0
    while (j < 60) { buf(j) = bb.getInt(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash60Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHash60Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHash60Agg =
    copy(child = newChildren.head)
}
