package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The `.gb4z` block-indexed LZ4 container ([[BlockLz4]]): byte parity
  * with the uncompressed read across a split-size grid (one task per
  * block down to all-in-one), genuine multi-partition planning on ONE
  * compressed file (the capability a gzip member lacks), footer/offset
  * integrity, adversarial '@'-leading quality lines, predicate pushdown
  * through the container read path, and the streaming whole-file
  * partition resolving its block range from the footer. */
class Gb4zSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def record(i: Int): String = {
    val id = f"read_$i%05d" + "x" * 13
    val seq = ("ACGT" * 10) + "ACGTACGTACGTA"
    val qual = "@" + "I" * 20
    s"@$id\n$seq\n+\n$qual\n"
  }

  /** Drop Hadoop LocalFileSystem's `.name.crc` sidecar after mutating a
    * file's bytes directly: the corruption tests exercise the CONTAINER's
    * per-block crc (the layer that exists on filesystems without
    * transparent checksums — S3A, raw local), not the sidecar's. */
  private def dropFsSidecar(f: String): Unit = {
    val p = Paths.get(f)
    Files.deleteIfExists(p.getParent.resolve("." + p.getFileName + ".crc"))
    ()
  }

  private def writeBoth(n: Int, blockBytes: Int): (String, String) = {
    val dir = Files.createTempDirectory("graft_gb4z").toString
    val plainDir = s"$dir/plain"; val packedDir = s"$dir/packed"
    Files.createDirectories(Paths.get(plainDir))
    Files.createDirectories(Paths.get(packedDir))
    Files.writeString(Paths.get(plainDir, "reads.fastq"),
      (0 until n).map(record).mkString)
    val lines = (0 until n).iterator.flatMap(i => record(i).stripSuffix("\n")
      .split("\n", -1).iterator)
    BlockLz4.writeFile(new Configuration(), s"$packedDir/reads.gb4z",
      lines, blockBytes = blockBytes)
    (plainDir, packedDir)
  }

  test("container read == uncompressed read across the split grid") {
    val (plain, packed) = writeBoth(300, blockBytes = 1024)
    val want = spark.read.format("fastq").load(plain)
      .collect().map(_.toString).sorted.toSeq
    for (split <- Seq(1, 512, 4096, 1 << 20)) {
      val got = spark.read.format("fastq")
        .option("maxSplitBytes", split).load(packed)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"split=$split diverged from the uncompressed read")
    }
  }

  test("one compressed file genuinely plans MANY partitions") {
    val (_, packed) = writeBoth(300, blockBytes = 1024)
    val df = spark.read.format("fastq").option("maxSplitBytes", 1).load(packed)
    val parts = df.rdd.getNumPartitions
    assert(parts > 10, s"expected one task per block, got $parts partitions")
    assert(df.count() == 300)
    // and the coarse grid really coalesces blocks into fewer tasks
    val one = spark.read.format("fastq")
      .option("maxSplitBytes", 1 << 30).load(packed)
    assert(one.rdd.getNumPartitions == 1)
  }

  test("pushed predicates evaluate inside the container read") {
    val (_, packed) = writeBoth(100, blockBytes = 1024)
    val df = spark.read.format("fastq").option("maxSplitBytes", 1024)
      .load(packed).filter(col("id") < "read_00010")
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters: [id"),
      "predicate not pushed into the container scan")
    assert(df.count() == 10)
  }

  test("streaming whole-file partition resolves its block range from the footer") {
    import org.apache.spark.sql.streaming.Trigger
    val (_, packed) = writeBoth(120, blockBytes = 2048)
    val name = "gb4z_stream_mem"
    spark.catalog.dropTempView(name)
    val q = spark.readStream.format("fastq").option("maxFilesPerTrigger", "1")
      .load(packed).groupBy().count()
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).collect().head.getLong(0) == 120L)
  }

  test("distributed sink: one shard per partition, read-back parity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gb4z_sink").toString + "/shards"
    // 4-line records fabricated AFTER the repartition (the sink contract:
    // records never straddle partitions); pure column expressions — a
    // scala lambda here would drag the test suite into the closure
    val lines = (0 until 200).toDF("i").repartition(4)
      .select(explode(array(
        concat(lit("@"), format_string("read_%05d", col("i")), lit("x" * 13)),
        lit(("ACGT" * 10) + "ACGTACGTACGTA"),
        lit("+"),
        lit("@" + "I" * 20))).as("value"))
    BlockLz4.writeDir(lines, dir, blockBytes = 1024)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(BlockLz4.Extension))
    assert(shards.length == 4, s"expected one shard per partition: ${shards.length}")
    val got = spark.read.format("fastq").option("maxSplitBytes", 2048)
      .load(dir).select("id").as[String].collect().sorted.toSeq
    assert(got == (0 until 200).map(i => f"read_$i%05d" + "x" * 13),
      "sink shards lost or duplicated records on read-back")
    // overwrite semantics: a second write fully replaces the layout
    BlockLz4.writeDir(lines.limit(40).repartition(1), dir, blockBytes = 1024)
    assert(spark.read.format("fastq").load(dir).count() == 10)
  }

  test("container layer fuzz: byte parity on random corpora and block sizes") {
    // below the FASTQ parser: writer -> footer -> rangeStream must be the
    // identity on arbitrary line content — multibyte unicode, empty
    // lines, records larger than the block budget (kept whole: the
    // writer only cuts at record boundaries), and 1-byte blocks
    val rnd = new scala.util.Random(90210L)
    // whole codepoints (🚀 is a surrogate pair — indexing raw chars would
    // fabricate lone surrogates, a test artifact, not container input)
    val alphabet = Vector("a", "b", "c", " ", "€", "✓", "\t", "x", "y",
      "z", "0", "1", "2", "3", "🚀")
    for ((blockBytes, recordLines) <- Seq((1, 1), (64, 3), (4096, 4))) {
      val lines = (0 until 400).map { _ =>
        val n = rnd.nextInt(120)
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val dir = Files.createTempDirectory("graft_gb4z_fuzz")
      val f = s"$dir/fuzz.gb4z"
      val nBlocks = BlockLz4.writeFile(
        new Configuration(), f, lines.iterator, blockBytes, recordLines)
      val (offs, footerStart) = BlockLz4.footerOffsets(new Configuration(), f)
      assert(offs.length == nBlocks)
      val fs = new org.apache.hadoop.fs.Path(f)
        .getFileSystem(new Configuration())
      val in = fs.open(new org.apache.hadoop.fs.Path(f))
      val got = try {
        val s = BlockLz4.rangeStream(in, offs.head, footerStart)
        new String(s.readAllBytes(), "UTF-8")
      } finally in.close()
      assert(got == lines.map(_ + "\n").mkString,
        s"roundtrip diverged at blockBytes=$blockBytes recordLines=$recordLines")
    }
  }

  test("single flipped payload byte in a mid-block is detected and reported") {
    // the crc32 leg of the format: LZ4 has no internal integrity check, so
    // without the per-block checksum a flipped storage byte would decode
    // to garbage records SILENTLY. Strict readers must fail naming the
    // file and block offset; verifyBlocks must classify exactly the
    // corrupted block bad (the quarantine route) with every other block
    // still good.
    val (_, packed) = writeBoth(300, blockBytes = 1024)
    val f = s"$packed/reads.gb4z"
    val conf = new Configuration()
    val (offs, _) = BlockLz4.footerOffsets(conf, f)
    assert(offs.length >= 3, "need a multi-block container for a MID-block flip")
    val bytes = Files.readAllBytes(Paths.get(f))
    val at = (offs(1) + 12 + 5).toInt // 5 bytes into block 1's payload
    bytes(at) = (bytes(at) ^ 0x40).toByte
    Files.write(Paths.get(f), bytes)
    dropFsSidecar(f)
    // strict path: the DSv2 read fails loudly, not with wrong rows
    val e = intercept[Exception] {
      spark.read.format("fastq").option("maxSplitBytes", 1 << 30)
        .load(packed).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(c => String.valueOf(c.getMessage)).getOrElse("")
    assert(msg.contains("crc mismatch") && msg.contains(s"block@${offs(1)}"),
      s"corruption not reported with file+offset: $msg")
    // quarantine path: exactly the flipped block is bad, all others good
    val reports = BlockLz4.verifyBlocks(conf, f)
    assert(reports.count(!_.ok) == 1)
    val bad = reports.find(!_.ok).get
    assert(bad.offset == offs(1) && bad.error.contains("crc mismatch"))
    assert(reports.filter(_.ok).map(_.offset) == offs.filterNot(_ == offs(1)))
  }

  test("corrupt or truncated footers fail planning with the file named") {
    val (_, packed) = writeBoth(60, blockBytes = 1024)
    val f = s"$packed/reads.gb4z"
    val good = Files.readAllBytes(Paths.get(f))
    // truncation: drop the tail so the footer magic is gone
    Files.write(Paths.get(f), good.dropRight(7))
    dropFsSidecar(f)
    val e1 = intercept[Exception] { BlockLz4.footerOffsets(new Configuration(), f) }
    assert(e1.getMessage.contains(f) && e1.getMessage.contains("footer"))
    // absurd block count: overwrite n with a huge value, keep the magic
    val evil = good.clone()
    val nAt = evil.length - 12
    evil(nAt) = 0x7f.toByte
    Files.write(Paths.get(f), evil)
    dropFsSidecar(f)
    val e2 = intercept[Exception] { BlockLz4.footerOffsets(new Configuration(), f) }
    assert(e2.getMessage.contains("block count") && e2.getMessage.contains(f))
    // zero-length shard: planned as EMPTY, not an error — the valid
    // sibling still reads (an in-flight writer must not fail the load)
    Files.write(Paths.get(f), good)
    dropFsSidecar(f)
    Files.write(Paths.get(s"$packed/empty.gb4z"), Array.emptyByteArray)
    assert(spark.read.format("fastq").load(packed).count() == 60)
  }

  test("footer round-trip: offsets are monotone block starts") {
    val (_, packed) = writeBoth(50, blockBytes = 512)
    val (offs, footerStart) = BlockLz4.footerOffsets(
      new Configuration(), s"$packed/reads.gb4z")
    assert(offs.nonEmpty && offs.head == 8L, "first block must follow the header")
    assert(offs == offs.sorted && offs.distinct == offs)
    assert(offs.last < footerStart)
  }
}
