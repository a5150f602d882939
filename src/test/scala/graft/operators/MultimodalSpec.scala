package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, length}
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

  test("m2/m3 slice PAYLOAD BYTES, not characters (multibyte contract)") {
    // the SQL oracle can only state char ops, so it carries an
    // ASCII-payload contract for these stubs (see Multimodal.oracles);
    // this spec pins the BYTE semantics the engine actually has, on
    // multibyte utf-8 the oracle cannot express: a 3-bytes-per-char CJK
    // text slices mid-codepoint and the results are functions of the
    // utf-8 byte array alone.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length => slen}
    val text = "\u667a\u80fd \u6570\u636e \u5904\u7406 \u5f15\u64ce \u89c4\u6a21 \u6d4b\u8bd5" // 17 chars, 41 utf-8 bytes
    val bytes = text.getBytes("UTF-8")
    assert(text.length == 17 && bytes.length == 41)
    val dir = java.nio.file.Files.createTempDirectory("mbyte").toString
    Seq((1L, text, "zh", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", slen(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // m1: n_bytes and fake dims derive from the 41 BYTES, not 17 chars
    val m1 = Multimodal.queries("m1_media_meta")(spark, dir)
      .as[(Long, Long, String, Long, Long)].collect().head
    assert(m1._2 == 41L && m1._4 == 41L % 640 && m1._5 == (41L * 31) % 480)
    // m3: every-2nd-BYTE downsample -> 21 bytes, md5 of the raw byte
    // subsequence (NOT valid utf-8 -> inexpressible as a SQL string)
    val expect = {
      val out = Array.tabulate((bytes.length + 1) / 2)(i => bytes(2 * i))
      java.security.MessageDigest.getInstance("MD5")
        .digest(out).map("%02x".format(_)).mkString
    }
    val m3 = Multimodal.queries("m3_resize")(spark, dir)
      .as[(Long, Long, String)].collect().head
    assert(m3._2 == 21L && m3._3 == expect)
    // m2: 41 bytes -> 2 full 16-byte frames, frame 0 sampled; its md5 is
    // the hash of bytes [0,16) which split the 6th codepoint in half
    val m2 = Multimodal.queries("m2_frame_sample")(spark, dir)
      .as[(Long, Long, String)].collect()
    val f0 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(bytes, 0, 16))
      .map("%02x".format(_)).mkString
    assert(m2.length == 1 && m2.head._2 == 0L && m2.head._3 == f0)
  }

  test("m7: every verdict class fires on its planted row, with precedence") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("m7spec").toString
    // ids chosen so 13 hits the planted checksum corruption (13 % 97 = 13)
    Seq(
      (1L, "clean ascii", "en", "s"),          // ok
      (13L, "corrupted in flight", "en", "s"), // checksum_mismatch
      (2L, "café", "fr", "s"),            // 4 chars, 5 bytes -> size
      (3L, "", "en", "s"),                     // empty
      (110L, "", "en", "s")                    // empty BEATS checksum (110%97=13)
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.queries("m7_integrity_audit")(s, dir)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got("ok") === ((1L, 11L)))
    assert(got("checksum_mismatch") === ((1L, 19L)))
    assert(got("size_mismatch") === ((1L, 5L)))
    assert(got("empty") === ((2L, 0L)))
  }
}
