package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** m6's stub pHash: locality-sensitivity is the property the banded
  * pairing depends on — a small payload edit must flip only the bits of
  * the touched blocks, so edited copies stay within the hamming<=3
  * radius [[Dedup.simhashPairs]] is pigeonhole-complete for.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def phash(p: Array[Byte]): Long = {
    val par = new Array[Long](60)
    var i = 0
    while (i < p.length) { par(i % 60) += p(i) & 0xffL; i += 1 }
    var sig = 0L
    var b = 0
    while (b < 60) { if ((par(b) & 1L) == 1L) sig |= 1L << b; b += 1 }
    sig
  }

  test("stub pHash flips exactly the bits of edited blocks") {
    val rnd = new scala.util.Random(307L)
    val base = Array.fill(300)((rnd.nextInt(26) + 'a').toByte)
    val s0 = phash(base)
    // single-byte parity-changing edit at position p flips bit p % 60 only
    for (p <- Seq(0, 7, 59, 60, 299)) {
      val e = base.clone(); e(p) = (e(p) + 1).toByte
      assert((s0 ^ phash(e)) == (1L << (p % 60)), s"edit at $p")
    }
    // a 3-byte edit in 3 distinct blocks stays within pairing radius
    val e3 = base.clone()
    Seq(1, 32, 63).foreach(p => e3(p) = (e3(p) + 1).toByte)
    assert(java.lang.Long.bitCount(s0 ^ phash(e3)) == 3)
  }

  test("m6 query plants one findable near-pair per doc") {
    val got = Multimodal.queries("m6_phash_neardup")(
      spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val pairs = got.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val nDocs = 500
    // every planted (doc, doc + 400000) copy must be recovered
    (0L until nDocs.toLong).foreach { id =>
      assert(pairs.contains((id, id + 400000)), s"planted pair $id missing")
    }
  }
}
