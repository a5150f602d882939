package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import graft.TestSpark
import java.nio.file.Files

/** The `.4mc` container + FourMcTextInputFormat contract:
  *  - lossless line round-trip through `Fastq.readLinesWithFormat`
  *    (the unchanged -inputformat seam), blocks cut MID-LINE
  *  - a split GRID (≥3 byte-range splits) reassembles the exact line
  *    sequence: every straddling line is owned by exactly one split
  *  - block-boundary-equals-line-boundary ownership (the off-by-one the
  *    skip-first-line heuristic gets wrong) is handled via the
  *    previous-block peek
  *  - XXH32 catches a flipped payload byte before decode
  *  - incompressible blocks store raw (compLen == rawLen) and round-trip
  */
class FourMcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpFile(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    s"$d/data.4mc"
  }

  private def readVia(path: String, maxSplit: Long): (Int, Seq[String]) = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplit)
    conf.setLong("mapreduce.input.fileinputformat.split.minsize", 1L)
    val rdd = spark.sparkContext.newAPIHadoopFile(path,
      classOf[FourMcTextInputFormat], classOf[LongWritable], classOf[Text], conf)
    (rdd.getNumPartitions, rdd.map(_._2.toString).collect().toSeq)
  }

  test("round-trip + ≥3-way split grid reassembles the exact line sequence") {
    val rnd = new scala.util.Random(42)
    // adversarial mix: tiny lines, lines longer than a block, empty lines,
    // repetitive (compressible) and random-hex (incompressible) content
    val lines = (0 until 2000).map { i =>
      i % 7 match {
        case 0 => ""
        case 1 => "x" * (300 + rnd.nextInt(200))      // spans block cuts
        case 2 => Seq.fill(40)(rnd.nextInt(16).toHexString).mkString
        case _ => s"line-$i-" + ("ab" * rnd.nextInt(30))
      }
    }
    val path = tmpFile("fourmc_rt")
    val nBlocks = FourMc.writeFile(new Configuration(), path,
      lines.iterator, blockBytes = 1024)
    assert(nBlocks >= 10, s"fixture too small: $nBlocks blocks")
    // whole-file read through the UNCHANGED -inputformat seam
    val viaSeam = Fastq.readLinesWithFormat(spark, path,
      "graft.sources.FourMcTextInputFormat").collect().toSeq
    assert(viaSeam == lines, "whole-file read diverged")
    // split grid: every granularity must reproduce the identical sequence
    val fileLen = new java.io.File(path).length()
    for (maxSplit <- Seq(fileLen / 7, fileLen / 5, fileLen / 3)) {
      val (nSplits, got) = readVia(path, maxSplit)
      assert(got == lines, s"maxSplit=$maxSplit reassembly diverged")
      if (maxSplit == fileLen / 7)
        assert(nSplits >= 3, s"split grid degenerate: $nSplits splits")
    }
  }

  test("line boundary exactly at a block cut: the next split owns the fresh line") {
    // blockBytes = 8 and 8-byte records ('1234567\n') align every block
    // cut WITH a line boundary — the case where blindly skipping the
    // first line of a split would LOSE one line per split
    val lines = (0 until 64).map(i => f"$i%07d")
    val path = tmpFile("fourmc_aligned")
    val n = FourMc.writeFile(new Configuration(), path, lines.iterator, blockBytes = 8)
    assert(n == 64, s"expected 64 single-record blocks, got $n")
    val (nSplits, got) = readVia(path, 64L) // ~few blocks per split
    assert(nSplits >= 3)
    assert(got == lines, "aligned-boundary ownership lost or duplicated lines")
    // and the mid-line variant: 12-byte records over 8-byte blocks, every
    // block starts mid-line except multiples of 3
    val lines2 = (0 until 63).map(i => f"$i%011d")
    val path2 = tmpFile("fourmc_straddle")
    FourMc.writeFile(new Configuration(), path2, lines2.iterator, blockBytes = 8)
    val (nSplits2, got2) = readVia(path2, 64L)
    assert(nSplits2 >= 3)
    assert(got2 == lines2, "straddling lines lost or duplicated")
  }

  test("XXH32 catches a flipped payload byte before decode") {
    val path = tmpFile("fourmc_corrupt")
    FourMc.writeFile(new Configuration(), path,
      (0 until 200).map(i => s"record-$i-payload-$i").iterator, blockBytes = 512)
    val (offs, _) = FourMc.footerOffsets(new Configuration(), path)
    assert(offs.size >= 2)
    // flip one byte inside the SECOND block's payload
    val raf = new java.io.RandomAccessFile(path, "rw")
    try {
      raf.seek(offs(1) + 12 + 3)
      val b = raf.read(); raf.seek(offs(1) + 12 + 3); raf.write(b ^ 0x40)
    } finally raf.close()
    // drop Hadoop's local-FS .crc sidecar so the CONTAINER's own XXH32 is
    // what detects the flip (object stores have no sidecar to lean on)
    val f = new java.io.File(path)
    val sidecar = new java.io.File(f.getParentFile, s".${f.getName}.crc")
    if (sidecar.exists()) assert(sidecar.delete())
    val e = intercept[org.apache.spark.SparkException] {
      Fastq.readLinesWithFormat(spark, path,
        "graft.sources.FourMcTextInputFormat").collect()
    }
    assert(e.getMessage.contains("XXH32") ||
      String.valueOf(e.getCause).contains("XXH32"), e.getMessage.take(500))
  }

  test("footer self-description rejects tampering (r12 fixed-position layout)") {
    def freshFile(): String = {
      val path = tmpFile("fourmc_footer")
      FourMc.writeFile(new Configuration(), path,
        (0 until 300).map(i => s"rec-$i").iterator, blockBytes = 256)
      val f = new java.io.File(path)
      val sidecar = new java.io.File(f.getParentFile, s".${f.getName}.crc")
      if (sidecar.exists()) assert(sidecar.delete())
      path
    }
    def patchInt(path: String, pos: Long, v: Int): Unit = {
      val raf = new java.io.RandomAccessFile(path, "rw")
      try { raf.seek(pos); raf.writeInt(v) } finally raf.close()
    }
    // sanity: untampered file parses
    val base = freshFile()
    val (offs, _) = FourMc.footerOffsets(new Configuration(), base)
    assert(offs.size >= 2)
    // (a) bogus footerLen copy at the fixed len-8 position
    val p1 = freshFile()
    patchInt(p1, new java.io.File(p1).length - 8, 999999999)
    val e1 = intercept[IllegalArgumentException] {
      FourMc.footerOffsets(new Configuration(), p1)
    }
    assert(e1.getMessage.contains("implausible footer length"), e1.getMessage)
    // (b) plausible-but-wrong footerLen (right stride, wrong block count):
    // the leading copy disagrees -> caught before any offset is trusted
    val p2 = freshFile()
    val len2 = new java.io.File(p2).length
    val (offs2, _) = FourMc.footerOffsets(new Configuration(), p2)
    patchInt(p2, len2 - 8, (8 * (offs2.size - 1) + 28))
    val e2 = intercept[IllegalArgumentException] {
      FourMc.footerOffsets(new Configuration(), p2)
    }
    assert(e2.getMessage.contains("footer length copies disagree"), e2.getMessage)
    // (c) hostile block header: a ~2 GiB rawLen must be rejected BEFORE
    // any allocation (the MaxBlockBytes bound)
    val p3 = freshFile()
    val (offs3, _) = FourMc.footerOffsets(new Configuration(), p3)
    patchInt(p3, offs3(1), Int.MaxValue - 1) // block 1's rawLen field
    val fs = new org.apache.hadoop.fs.Path(p3)
      .getFileSystem(new Configuration())
    val in = fs.open(new org.apache.hadoop.fs.Path(p3))
    val e3 = intercept[IllegalArgumentException] {
      try FourMc.readBlock(in, offs3(1), p3) finally in.close()
    }
    assert(e3.getMessage.contains("impossible sizes"), e3.getMessage)
  }

  test("incompressible blocks store raw and still round-trip") {
    val rnd = new scala.util.Random(7)
    // truly incompressible: random hex strings
    val lines = (0 until 50).map(_ =>
      Array.fill(120)(Integer.toHexString(rnd.nextInt(16))).mkString)
    val path = tmpFile("fourmc_raw")
    FourMc.writeFile(new Configuration(), path, lines.iterator, blockBytes = 256)
    val got = Fastq.readLinesWithFormat(spark, path,
      "graft.sources.FourMcTextInputFormat").collect().toSeq
    assert(got == lines)
  }
}
