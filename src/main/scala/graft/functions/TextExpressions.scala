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

object LevFns {
  /** Banded (Ukkonen) Levenshtein saturating at k+1: returns
    * min(lev(a,b), k+1) in O((2k+1)·min(m,n)) time instead of the full
    * O(m·n) table — the verify kernel a SymSpell-style matcher actually
    * wants, since every distance beyond its radius is equally "no".
    * All cell values are CLAMPED at k+1, which doubles as the band
    * sentinel (any out-of-band cell is provably > k), and a row whose
    * whole band saturates exits early. Code-point based (same unicode
    * semantics as Spark's levenshtein). */
  def levBounded(ua: UTF8String, ub: UTF8String, k: Int): Long = {
    if (k < 0) return 0L
    val s = ua.toString.codePoints().toArray
    val t = ub.toString.codePoints().toArray
    val (m, n) = (s.length, t.length)
    if (math.abs(m - n) > k) return (k + 1).toLong
    val cap = k + 1
    var prev = Array.tabulate(n + 2)(j => math.min(j, cap))
    var cur = new Array[Int](n + 2)
    var i = 1
    while (i <= m) {
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      cur(lo - 1) = if (lo == 1) math.min(i, cap) else cap
      var rowMin = cur(lo - 1)
      var j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val up = prev(j) + 1
        if (up < v) v = up
        val left = cur(j - 1) + 1
        if (left < v) v = left
        if (v > cap) v = cap
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= cap) return cap.toLong // whole band saturated
      if (hi + 1 <= n + 1) cur(hi + 1) = cap // right sentinel for next row
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(n), cap).toLong
  }
}

/** `lev_bounded(a, b, k)` -> Long: min(levenshtein(a,b), k+1) via the
  * banded DP above — codegen'd, O(k·len) per row. */
case class LevBounded(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lev_bounded"
  protected override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevFns.levBounded(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) =>
      s"graft.functions.LevFns.levBounded($a, $b, $k)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LevBounded =
    copy(first = f, second = s, third = t)
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
