package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, length}
import graft.TestSpark

/** The real-pixel image stack under m2/m3/m6:
  *  - the PNG encoder round-trips pixel-exactly through javax.imageio AND
  *    through an independent pure-JDK Inflater + scanline parse (two
  *    decoders agreeing on every byte pins the encoder)
  *  - the integer bilinear resampler is exact (identity at 1:1, hand
  *    values at 2:1)
  *  - dHash is locality-sensitive on true pixels: a small region edit
  *    stays within the hamming ≤ 3 radius [[Dedup.simhashPairs]] is
  *    pigeonhole-complete for, so every planted twin is recalled
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent PNG decode: no ImageIO — raw Inflater + filter-0
    * scanline parse. Any disagreement with [[Multimodal.decodePng]]
    * means the encoder or the ImageIO usage is wrong. */
  private def decodeIndependent(png: Array[Byte]): Array[Array[Int]] = {
    def be(off: Int): Int =
      ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P')
    var off = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (off < png.length) {
      val len = be(off)
      val tag = new String(png, off + 4, 4, "US-ASCII")
      // CRC32 of tag+body must match the chunk trailer
      val c = new java.util.zip.CRC32()
      c.update(png, off + 4, 4 + len)
      assert(c.getValue.toInt == be(off + 8 + len), s"chunk $tag crc")
      tag match {
        case "IHDR" =>
          w = be(off + 8); h = be(off + 12)
          assert(png(off + 16) == 8 && png(off + 17) == 2, "RGB8 expected")
        case "IDAT" => idat.write(png, off + 8, len)
        case _      => ()
      }
      off += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + 3 * w))
    var done = 0
    while (!inf.finished()) done += inf.inflate(raw, done, raw.length - done)
    assert(done == raw.length, "short inflate")
    inf.end()
    Array.tabulate(h, w) { (y, x) =>
      val o = y * (1 + 3 * w) + 1 + 3 * x
      assert(raw(y * (1 + 3 * w)) == 0, "filter-0 expected")
      ((raw(o) & 0xff) << 16) | ((raw(o + 1) & 0xff) << 8) | (raw(o + 2) & 0xff)
    }
  }

  test("PNG encode round-trips pixel-exactly through ImageIO AND a raw inflate") {
    for (id <- Seq(0L, 7L, 12345L)) {
      val w = 16 + (id % 17).toInt; val h = 12 + (id % 13).toInt
      val png = Multimodal.pngRgb(w, h, (x, y) => Multimodal.pixel(id, 0, x, y, w, h))
      val expected = Array.tabulate(h, w)((y, x) => Multimodal.pixel(id, 0, x, y, w, h))
      val viaImageIO = Multimodal.decodePng(png)
      val viaInflate = decodeIndependent(png)
      assert(viaImageIO.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq,
        s"ImageIO decode diverged for id=$id")
      assert(viaInflate.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq,
        s"independent decode diverged for id=$id")
    }
  }

  test("integer bilinear: identity at 1:1, exact quarter-points at 2:1") {
    val src = Array(Array(0, 100, 200, 300), Array(40, 140, 240, 340),
      Array(80, 180, 280, 380), Array(120, 220, 320, 420))
    assert(Multimodal.bilinear(src, 4, 4).map(_.toSeq).toSeq ==
      src.map(_.toSeq).toSeq, "1:1 resample must be the identity")
    // 2:1 half-pixel centers land at source x = 0.5, 2.5 (fx = 128):
    // out(0)(0) = avg of the 2x2 block = (0+100+40+140)/4 = 70
    val half = Multimodal.bilinear(src, 2, 2)
    assert(half(0)(0) == 70 && half(0)(1) == 270 &&
      half(1)(0) == 150 && half(1)(1) == 350, half.map(_.toSeq).toSeq.toString)
  }

  test("dHash locality: the m6 region edit stays inside the pairing radius") {
    for (id <- 0L until 50L) {
      def img(edit: Boolean) = Multimodal.decodePng(
        Multimodal.pngRgb(32, 24, { (x, y) =>
          val v = Multimodal.pixel(id, 0, x, y, 32, 24)
          if (edit && x >= 12 && x < 16 && y >= 8 && y < 12)
            (v & 0xffff00) | math.min(255, (v & 0xff) + 6)
          else v
        }))
      val ham = java.lang.Long.bitCount(
        Multimodal.dhash60(img(edit = false)) ^ Multimodal.dhash60(img(edit = true)))
      assert(ham <= 3, s"id=$id edited twin drifted to hamming $ham")
    }
  }

  test("m6 recalls every planted twin and nothing else at sf0.001") {
    val got = Multimodal.localQueries("m6_phash_neardup")(
      spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val pairs = got.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val nDocs = 500
    (0L until nDocs.toLong).foreach { id =>
      assert(pairs.contains((id, id + 400000)), s"planted pair $id missing")
    }
    // per-doc hash-noise green keeps accidental cross-doc pairs at zero
    assert(pairs.size == nDocs, s"unexpected extra pairs: ${pairs.size - nDocs}")
  }

  test("m10 pairs every twin doc's three scenes and nothing else at sf0.001") {
    val got = Multimodal.localQueries("m10_keyframe_neardup")(
      spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val rows = got.as[(Long, Long, Long, Long, Long)].collect()
    val pairs = rows.map(r => (r._1, r._2, r._3, r._4)).toSet
    // twins 2j/2j+1 share all three scene textures; the jitter keeps them
    // within hamming <= 1, so banding must recall every (scene-aligned) pair
    (0L until 250L).foreach { j =>
      (0L until 3L).foreach { sc =>
        val p = (2 * j, sc, 2 * j + 1, sc)
        assert(pairs.contains(p), s"planted twin pair doc=${2 * j} scene=$sc missing")
        val ham = rows.find(r => (r._1, r._2, r._3, r._4) == p).get._5
        assert(ham <= 1, s"twin pair $p beyond the jitter radius: hamming=$ham")
      }
    }
    // unrelated textures CAN land within hamming <= 3 of each other by
    // chance (60-bit hashes over 1500 keyframes); such pairs are correct
    // algorithm output (the Python reference emits them too) — just pin
    // that they stay a trace contamination, not a flood
    val extra = pairs.size - 750
    assert(extra >= 0 && extra <= 10, s"accidental pair count exploded: $extra")
  }

  test("m11 fingerprint: gain/phase remaster keeps the signature IDENTICAL " +
    "while every WAV byte can differ") {
    for (tex <- 0L until 300L) {
      val base = Multimodal.audioSamples(tex, gain = 1, off = 0)
      val twin = Multimodal.audioSamples(tex, gain = 2, off = 3)
      // the whole point of an energy-ORDERING fingerprint: |2s| = 2|s|
      // preserves every window comparison, and the 3-sample phase shift
      // only drifts window sums by a bounded edge term the >= 2x envelope
      // steps dominate — hamming must be exactly 0, not merely <= radius
      assert(Multimodal.audioSig(base) == Multimodal.audioSig(twin),
        s"tex=$tex twin signature drifted")
      // ...yet the twins are NOT byte-dups: the WAVs differ in sample data
      assert(!Multimodal.wavPcm16(base, 8000).sameElements(
        Multimodal.wavPcm16(twin, 8000)), s"tex=$tex twins byte-identical")
      // and the signature is doc-specific (adjacent textures disagree)
      if (tex > 0)
        assert(Multimodal.audioSig(base) !=
          Multimodal.audioSig(Multimodal.audioSamples(tex - 1, 1, 0)),
          s"tex=$tex collides with ${tex - 1}")
    }
  }

  test("m11 recalls every planted audio twin at hamming 0 at sf0.001") {
    val got = Multimodal.localQueries("m11_audio_neardup")(
      spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val rows = got.as[(Long, Long, Long)].collect()
    val pairs = rows.map(r => (r._1, r._2)).toSet
    (0L until 250L).foreach { j =>
      assert(pairs.contains((2 * j, 2 * j + 1)), s"planted twin pair $j missing")
      val ham = rows.find(r => (r._1, r._2) == ((2 * j, 2 * j + 1))).get._3
      assert(ham == 0, s"twin pair $j not exact in fingerprint space: $ham")
    }
    // cross-texture accidental pairs are legitimate output (the reference
    // emits them too) — pin that they stay trace-level
    val extra = pairs.size - 250
    assert(extra >= 0 && extra <= 10, s"accidental pair count exploded: $extra")
  }

  test("m8 WAV cycle: AudioSystem decodes the synthesized PCM bit-exactly") {
    for (id <- Seq(0L, 3L, 1234L)) {
      val n = 800 + (id % 5).toInt * 160
      val samples = Multimodal.pcm(id, n)
      val (sr, dec) = Multimodal.decodeWav(Multimodal.wavPcm16(samples, 8000))
      assert(sr == 8000, s"decoded rate $sr")
      assert(dec.toSeq == samples.toSeq, s"id=$id decode diverged")
    }
    // floor-sqrt boundary exactness (the one place a float sqrt could
    // round differently from Python's math.isqrt)
    assert(Multimodal.isqrt(0) == 0 && Multimodal.isqrt(15) == 3 &&
      Multimodal.isqrt(16) == 4 && Multimodal.isqrt(((1L << 31) - 1) * ((1L << 31) - 1)) == (1L << 31) - 1)
  }

  test("m9 finds exactly the planted scene boundaries with wide margin") {
    val got = Multimodal.localQueries("m9_scene_cuts")(
      spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val rows = got.as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1)
    rows.foreach { case (id, fs) =>
      val cuts = fs.filter(_._4 == 1).map(_._2).toSet
      assert(cuts == Set(2L + id % 3, 5L + id % 2), s"doc $id cuts $cuts")
      // within-scene diffs are the 1-luma corner jitter at most; cross-
      // scene re-textures the whole plane — no boundary ambiguity
      fs.foreach { case (_, f, diff, isCut) =>
        if (isCut == 1) assert(diff >= 1000, s"doc $id frame $f weak cut: $diff")
        else assert(diff <= 1, s"doc $id frame $f noisy non-cut: $diff")
      }
    }
    assert(rows.size == 500)
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
