package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ExpectsInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, LongType}
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

  /** Canonical 2-bit pack in ONE scan: min(pack(s), pack(revcomp(s))) ==
    * pack(least(s, revcomp(s))) because MSB-first packing with A<C<G<T
    * code order makes packed-Long comparison identical to lexicographic
    * string comparison at equal k. -1 sentinel for invalid bases or
    * out-of-contract length (matching [[pack]]).
    *
    * The one-scan form is only taken for uppercase-ACGT input: the
    * contract is exact equality with `pack(canonical(s))`, and those two
    * composed functions do NOT case-fold the comparison (canonical
    * compares the raw string against its uppercase revcomp) while
    * KmerCodec.encodeLong accepts lowercase — so soft-masked (lowercase)
    * bases take the composed slow path instead of silently producing a
    * case-folded key the string-domain form would never produce. */
  def canonPack(s: UTF8String): Long = {
    val str = s.toString
    val k = str.length
    if (k < 1 || k > 31) return -1L
    var i = 0
    while (i < k) {
      val c = str.charAt(i)
      if (c != 'A' && c != 'C' && c != 'G' && c != 'T')
        return pack(canonical(s)) // mixed-case / invalid: exact composed semantics
      i += 1
    }
    KmerCodec.canonicalLong(KmerCodec.encodeLong(str, 0, k), k)
  }

  /** Fused `canon_pack(substring(s, i, len))` — 1-based `i`, ZERO
    * allocation on the all-uppercase-ACGT ASCII fast path (the packed
    * long is built straight off the UTF8String bytes). Anything off the
    * fast path (multi-byte chars, lowercase, invalid bases, windows past
    * the end) delegates to the composed form for exact parity —
    * KmerExpressionsSpec pins equality against the composition. */
  def canonPackAt(s: UTF8String, i: Int, len: Int): Long =
    canonPackSub(s, i, len, 0, null)

  /** [[canonPackAt]] over the PATCHED read: the composition
    * `canon_pack(substring(concat(substr(s,1,p-1), b, substr(s,p+1,..)),
    * i, len))` — the error corrector's candidate k-mer key — computed
    * without materializing the altered read or the k-mer substring when
    * `b` is one uppercase-ACGT char and the window stays inside an
    * all-ASCII `s` (the always case for DNA reads). `p <= 0` or null `b`
    * means no patch. Off-fast-path inputs build the composed string so
    * the contract is exact everywhere (spec-pinned). */
  def canonPackSub(s: UTF8String, i: Int, len: Int, p: Int, b: UTF8String): Long = {
    val patch = b != null && p >= 1
    val nBytes = s.numBytes()
    if (i >= 1 && len >= 1 && len <= 31 && i - 1 + len <= nBytes &&
        (!patch || (b.numBytes() == 1 && p <= nBytes))) {
      // prefix must be pure ASCII for byte offset == char offset
      var j = 0
      var ascii = true
      while (ascii && j < nBytes) { if (s.getByte(j) < 0) ascii = false; j += 1 }
      if (ascii && (!patch || okBase(b.getByte(0)))) {
        val start = i - 1
        var v = 0L
        var ok = true
        j = 0
        while (ok && j < len) {
          var c: Byte = s.getByte(start + j)
          if (patch && start + j == p - 1) c = b.getByte(0)
          (c: @annotation.switch) match {
            case 'A' => v = v << 2
            case 'C' => v = (v << 2) | 1L
            case 'G' => v = (v << 2) | 2L
            case 'T' => v = (v << 2) | 3L
            case _   => ok = false
          }
          j += 1
        }
        if (ok) return KmerCodec.canonicalLong(v, len)
      }
    }
    canonPackSubSlow(s, i, len, p, b)
  }

  @inline private def okBase(c: Byte): Boolean =
    c == 'A' || c == 'C' || c == 'G' || c == 'T'

  private def canonPackSubSlow(s: UTF8String, i: Int, len: Int, p: Int, b: UTF8String): Long = {
    val str = s.toString
    val patched =
      if (b == null || p < 1) str
      else str.substring(0, math.min(p - 1, str.length)) + b.toString +
        (if (p < str.length) str.substring(p) else "")
    canonPack(UTF8String.fromString(patched).substringSQL(i, len))
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic compare of two equal-length byte arrays —
    * identical ordering to comparing their lowercase-hex encodings. */
  private def uCmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Shared per-position kernel for both minimizer forms: fill
    * `digests(i)` with the md5 of the canonical k-mer at position i for
    * every i in [0, n); when `canons` is non-null also record the
    * canonical k-mer text. Complement handling matches
    * translate('ACGT','TGCA'): non-uppercase-ACGT chars pass through
    * unchanged (and hash as their low byte — md5 of ASCII == md5 of
    * UTF-8 for the inputs this kernel sees). */
  private def fillCanonDigests(str: String, k: Int, n: Int,
                               digests: Array[Array[Byte]],
                               canons: Array[String]): Unit = {
    val md = md5Local.get()
    val fwd = new Array[Char](k)
    val rc = new Array[Char](k)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < k) {
        val c = str.charAt(i + j)
        fwd(j) = c
        val m = c match {
          case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'
          case other => other
        }
        rc(k - 1 - j) = m
        j += 1
      }
      // least(fwd, reverse(complement)) by direct char compare
      var useRc = false
      var decided = false
      j = 0
      while (j < k && !decided) {
        if (fwd(j) != rc(j)) { useRc = rc(j) < fwd(j); decided = true }
        j += 1
      }
      val canon = if (useRc) rc else fwd
      j = 0
      while (j < k) { md.update(canon(j).toByte); j += 1 }
      digests(i) = md.digest() // digest() resets the instance
      if (canons != null) canons(i) = new String(canon)
      i += 1
    }
  }

  /** One-pass (k,w)-minimizer sketch: md5-hex window minima over the
    * CANONICAL k-mers of `s`, distinct, as an array of 32-char hex
    * strings. Bit-for-bit the same set as the declarative chain
    * `array_distinct(transform(windows, j -> array_min(slice(
    *    transform(kmers, i -> md5(least(kmer, revcomp(kmer)))), j, w))))`
    * (md5 of ASCII == md5 of UTF8 here; hex-string order == unsigned
    * digest-byte order, so minima are selected on raw digests and only
    * the <= n-w+1 winners are hex-encoded). Reads shorter than k+w-1
    * have no full window -> empty array, the same guard the HOF form
    * needed explicitly. */
  def minimizerMd5(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length - k + 1
    if (k < 1 || w < 1 || n < w) return new GenericArrayData(Array.empty[Any])
    val digests = new Array[Array[Byte]](n)
    fillCanonDigests(str, k, n, digests, null) // texts not needed here
    // window minima on raw digests; distinct via linear probe over the
    // (tiny, <= n-w+1) winner list
    val out = new java.util.ArrayList[Any](n - w + 1)
    val seen = new java.util.ArrayList[Array[Byte]](n - w + 1)
    var jw = 0
    while (jw <= n - w) {
      var min = digests(jw)
      var t = jw + 1
      while (t < jw + w) {
        if (uCmp(digests(t), min) < 0) min = digests(t)
        t += 1
      }
      var dup = false
      var si = 0
      while (si < seen.size() && !dup) {
        if (uCmp(seen.get(si), min) == 0) dup = true
        si += 1
      }
      if (!dup) {
        seen.add(min)
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = HexChars((min(b) >> 4) & 0xf)
          hex(2 * b + 1) = HexChars(min(b) & 0xf)
          b += 1
        }
        out.add(UTF8String.fromString(new String(hex)))
      }
      jw += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-window minimizer SELECTION (g13's shape): one entry per window
    * j = 0..n-w, the canonical k-mer whose (md5, kmer) struct is minimal
    * in that window — bit-for-bit the rows of the declarative
    * `transform(windows, j -> array_min(slice(structs, j, w)).km)` chain
    * (struct order: md5 hex first, k-mer text as tie-break), including
    * duplicates, so downstream per-window counts are unchanged. */
  def minimizerWindows(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length - k + 1
    if (k < 1 || w < 1 || n < w) return new GenericArrayData(Array.empty[Any])
    val digests = new Array[Array[Byte]](n)
    val canons = new Array[String](n)
    fillCanonDigests(str, k, n, digests, canons)
    val out = new Array[Any](n - w + 1)
    var jw = 0
    while (jw <= n - w) {
      var min = jw
      var t = jw + 1
      while (t < jw + w) {
        val c = uCmp(digests(t), digests(min))
        if (c < 0 || (c == 0 && canons(t).compareTo(canons(min)) < 0)) min = t
        t += 1
      }
      out(jw) = UTF8String.fromString(canons(min))
      jw += 1
    }
    new GenericArrayData(out)
  }
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

/** `canon_pack(str)` -> packed canonical k-mer Long in one scan — the
  * fused form of `kmer_pack(canonical_kmer(str))` without the revcomp
  * string allocation (see [[KmerFns.canonPack]]); -1 sentinel when
  * invalid. Used as an equi-join KEY: injective on canonical k-mers at
  * fixed k, so set membership matches the string-domain form exactly. */
case class CanonPack(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "canon_pack"
  protected override def nullSafeEval(input: Any): Any =
    KmerFns.canonPack(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmerFns.canonPack($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonPack =
    copy(child = newChild)
}

/** `canon_pack_at(str, i, len)` -> packed canonical k-mer of the
  * `len`-char window at 1-based `i` — the fused, allocation-free form of
  * `canon_pack(substring(str, i, len))` (see [[KmerFns.canonPackAt]]).
  * Same key domain as canon_pack, so join membership is unchanged. */
case class CanonPackAt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "canon_pack_at"
  protected override def nullSafeEval(s: Any, i: Any, l: Any): Any =
    KmerFns.canonPackAt(s.asInstanceOf[UTF8String], i.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i, l) => s"graft.functions.KmerFns.canonPackAt($s, $i, $l)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CanonPackAt =
    copy(first = f, second = s, third = t)
}

/** `canon_pack_sub(str, i, len, p, b)` -> [[CanonPackAt]] over the read
  * with the base at 1-based position `p` replaced by `b` — the error
  * corrector's candidate k-mer key with no candidate-string
  * materialization (see [[KmerFns.canonPackSub]]). */
case class CanonPackSub(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {
  require(children.size == 5, "canon_pack_sub takes (str, i, len, p, b)")
  override def inputTypes: Seq[DataType] =
    Seq(StringType, IntegerType, IntegerType, IntegerType, StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "canon_pack_sub"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else KmerFns.canonPackSub(vs(0).asInstanceOf[UTF8String], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int], vs(4).asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gs = children.map(_.genCode(ctx))
    val anyNull = gs.map(_.isNull.toString).mkString(" || ")
    ev.copy(code = code"""
      ${gs.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.KmerFns.canonPackSub(
          ${gs(0).value}, ${gs(1).value}, ${gs(2).value}, ${gs(3).value}, ${gs(4).value});
      }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CanonPackSub =
    copy(children = newChildren)
}

/** `minimizer_md5(read, k, w)` -> array of distinct md5-hex (k,w)-window
  * minimizers (the minimap2 seeding sketch, Li 2018 §2.1). One codegen'd
  * kernel call per read replaces the interpreted HOF chain
  * transform(md5)→slice→array_min→array_distinct, whose per-k-mer
  * substring/translate/reverse/least allocations dominated the g14
  * sketch stage (array lambdas are CodegenFallback). Selection order is
  * still md5 (oracle parity — see the g13/g14 oracles). */
case class MinimizerMd5(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minimizer_md5"
  protected override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    KmerFns.minimizerMd5(s.asInstanceOf[UTF8String], k.asInstanceOf[Int], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k, w) => s"graft.functions.KmerFns.minimizerMd5($s, $k, $w)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinimizerMd5 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `minimizer_windows(read, k, w)` -> the selected canonical k-mer per
  * window (one entry per window, duplicates preserved — g13's shape; see
  * [[KmerFns.minimizerWindows]]). */
case class MinimizerWindows(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minimizer_windows"
  protected override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    KmerFns.minimizerWindows(s.asInstanceOf[UTF8String], k.asInstanceOf[Int], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k, w) => s"graft.functions.KmerFns.minimizerWindows($s, $k, $w)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinimizerWindows =
    copy(first = newFirst, second = newSecond, third = newThird)
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
    "canon_pack" -> (args => CanonPack(args.head)),
    "canon_pack_at" -> (args => CanonPackAt(args(0), args(1), args(2))),
    "canon_pack_sub" -> (args => CanonPackSub(args)),
    "minimizer_md5" -> (args => MinimizerMd5(args(0), args(1), args(2))),
    "minimizer_windows" -> (args => MinimizerWindows(args(0), args(1), args(2))),
    "rolling_hash" -> (args => RollingHash(args.head)),
    "lev_bounded" -> (args => LevBounded(args(0), args(1), args(2))),
    "vec_dot" -> (args => VecDot(args(0), args(1))),
    "int8_quant" -> (args => Int8Quant(args.head)),
    "sign_pack" -> (args => SignPack(args.head)),
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
