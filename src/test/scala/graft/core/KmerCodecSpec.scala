package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatestplus.scalacheck.ScalaCheckPropertyChecks
import org.scalacheck.Gen

class KmerCodecSpec extends AnyFunSuite with ScalaCheckPropertyChecks {
  import KmerCodec._

  private val dnaGen: Gen[String] =
    Gen.chooseNum(1, 400).flatMap(n => Gen.stringOfN(n, Gen.oneOf('A', 'C', 'G', 'T')))
  private val kmerGen: Gen[String] =
    Gen.chooseNum(1, 31).flatMap(n => Gen.stringOfN(n, Gen.oneOf('A', 'C', 'G', 'T')))

  private def rcStr(s: String): String =
    s.reverse.map { case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A' }

  test("Long roundtrip") {
    forAll(kmerGen) { s => assert(decodeLong(encodeLong(s), s.length) == s) }
  }

  test("Long RC is an involution and matches string RC") {
    forAll(kmerGen) { s =>
      val k = s.length
      val v = encodeLong(s)
      assert(decodeLong(rcLong(v, k), k) == rcStr(s))
      assert(rcLong(rcLong(v, k), k) == v)
    }
  }

  test("Long canonical is symmetric under RC") {
    forAll(kmerGen) { s =>
      val k = s.length
      assert(canonicalLong(encodeLong(s), k) == canonicalLong(encodeLong(rcStr(s)), k))
    }
  }

  test("Long order == lexicographic order for equal k") {
    forAll(kmerGen, kmerGen) { (a0, b0) =>
      val k = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(k), b0.take(k))
      assert(java.lang.Long.compare(encodeLong(a), encodeLong(b)).sign == a.compareTo(b).sign)
    }
  }

  test("rolling updates match re-encode") {
    forAll(Gen.chooseNum(2, 31), dnaGen) { (k, s) =>
      whenever(s.length >= k) {
        var fwd = encodeLong(s, 0, k)
        var rc = rcLong(fwd, k)
        var i = k
        while (i < s.length) {
          val c = code(s.charAt(i))
          fwd = rollForward(fwd, c, k)
          rc = rollRc(rc, c, k)
          assert(fwd == encodeLong(s, i - k + 1, k))
          assert(rc == rcLong(fwd, k))
          i += 1
        }
      }
    }
  }

  test("blocks roundtrip incl. exact block boundaries") {
    for (n <- Seq(1, 30, 31, 32, 61, 62, 63, 93, 124)) {
      val s = Iterator.continually("ACGT").flatten.take(n).mkString
      assert(decodeBlocks(encodeBlocks(s)) == s)
      assert(lengthOf(encodeBlocks(s)) == n)
    }
    forAll(dnaGen) { s => assert(decodeBlocks(encodeBlocks(s)) == s) }
  }

  test("blocks RC involution + canonical symmetry") {
    forAll(dnaGen) { s =>
      val b = encodeBlocks(s)
      assert(decodeBlocks(rcBlocks(b)) == rcStr(s))
      assert(decodeBlocks(canonicalBlocks(b)) == decodeBlocks(canonicalBlocks(encodeBlocks(rcStr(s)))))
    }
  }

  test("concat/slice/prefix/suffix agree with strings") {
    forAll(dnaGen, dnaGen) { (a, b) =>
      assert(decodeBlocks(concatBlocks(encodeBlocks(a), encodeBlocks(b))) == a + b)
    }
    forAll(dnaGen) { s =>
      val b = encodeBlocks(s)
      val k = math.min(s.length, 31)
      assert(decodeLong(blocksPrefixLong(b, k), k) == s.take(k))
      assert(decodeLong(blocksSuffixLong(b, k), k) == s.takeRight(k))
      val mid = s.length / 2
      assert(decodeBlocks(sliceBlocks(b, 0, mid)) == s.take(mid) || mid == 0)
    }
  }

  test("compareBlocks is lexicographic then by length") {
    forAll(dnaGen, dnaGen) { (a, b) =>
      assert(compareBlocks(encodeBlocks(a), encodeBlocks(b)).sign == a.compareTo(b).sign)
    }
  }

  test("invalid bases rejected") {
    assert(encodeLong("ACGN") == -1L)
    assert(encodeBlocks("ACGN") == null)
  }
}
