package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Banded SimHash pairing (d11's core): the 4x15-bit band join must find
  * EXACTLY the hamming<=3 pairs — complete by pigeonhole (4 bands can
  * absorb at most 3 differing bits without one band matching), and the
  * popcount verify makes it exact. Checked against brute force on random
  * 60-bit signatures with planted near-pairs.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("simhashPairs == brute-force hamming<=3 on random signatures (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(107L, 109L, 113L)) {
      val rnd = new scala.util.Random(seed)
      val mask60 = (1L << 60) - 1
      val base = Seq.fill(120)(rnd.nextLong() & mask60).distinct
      // plant near-duplicates: flip 0..4 random bits (4-bit flips must be
      // rejected by the verify even when a band still matches)
      val planted = base.take(30).map { s =>
        val flips = rnd.nextInt(5)
        (0 until flips).foldLeft(s)((v, _) => v ^ (1L << rnd.nextInt(60)))
      }
      val sigs = (base ++ planted).distinct.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val got = Dedup.simhashPairs(sigs.toDF("doc_id", "sig"))
        .as[(Long, Long, Long)].collect().toSet
      val brutePairs = (for {
        (sa, ia) <- sigs.map { case (i, s) => (s, i) }
        (sb, ib) <- sigs.map { case (i, s) => (s, i) } if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h.toLong)).toSet
      assert(got == brutePairs, s"seed $seed: banded != brute force")
      assert(brutePairs.nonEmpty, s"seed $seed planted no near pairs")
    }
  }

  test("repeatedSpans merges adjacent duplicated n-grams into maximal passages") {
    import spark.implicits._
    // doc 1 and doc 2 share a 6-token passage (>= n=4 tokens -> 3 gram
    // starts, one island); doc 3 is all-unique filler and must not appear.
    val shared = "the quick brown fox jumps high"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"one two three four $shared five six"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, 4)
      .as[(Long, Long, Long)].collect().toSet
    // shared passage = 6 tokens -> gram starts p, p+1, p+2 (one island of
    // span_tokens = 2 + 4 = 6); doc1 starts at token 2, doc2 at token 4
    assert(got == Set((1L, 2L, 6L), (2L, 4L, 6L)))
  }
}
