package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

class KmerIterSpec extends AnyFunSuite with ScalaCheckRunner {

  private val dnaWithN: Gen[String] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(20 -> Gen.oneOf('A', 'C', 'G', 'T'), 1 -> Gen.const('N'))))

  private def rcStr(s: String): String =
    s.reverse.map { case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A' }

  test("canonicalLong matches string-level canonicalization (with N resets)") {
    check(Prop.forAll(Gen.chooseNum(1, 31), dnaWithN) { (k, s) =>
      val got = KmerIter.canonicalLong(s, k).map(KmerCodec.decodeLong(_, k)).toList
      val want = (0 to s.length - k)
        .map(i => s.substring(i, i + k))
        .filter(_.forall("ACGT".contains(_)))
        .map(w => Seq(w, rcStr(w)).min)
      got == want
    })
  }

  test("rolling canonicalBlocks == naive re-encode for k spanning block boundaries") {
    for (k <- Seq(5, 31, 32, 40, 62, 63, 93)) {
      check(Prop.forAll(dnaWithN) { s =>
        val rolled = KmerIter.canonicalBlocks(s, k).map(KmerCodec.decodeBlocks).toList
        val naive = KmerIter.canonicalBlocksNaive(s, k).map(KmerCodec.decodeBlocks).toList
        rolled == naive
      }, minTests = 60)
    }
  }
}
