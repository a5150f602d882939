package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The streaming `.gb4z` sink's exactly-once commit protocol
  * ([[BlockLz4.writeBatch]] / [[BlockLz4.committedShardsGlob]]):
  * kill-restart leaves no duplicate and no missing shard, a replayed
  * batch is idempotent, and orphan shards from a batch that died before
  * its manifest commit are invisible to the manifest-gated read. */
class Gb4zSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def record(i: Int): Seq[String] = {
    val r = new scala.util.Random(i * 2654435761L)
    val seq = Array.fill(40)("ACGT"(r.nextInt(4))).mkString
    Seq(s"@read_$i", seq, "+", "I" * 40)
  }

  /** One source FASTQ file of reads [lo, hi). */
  private def writeSrc(dir: String, name: String, lo: Int, hi: Int): Unit = {
    Files.writeString(java.nio.file.Paths.get(dir, s"$name.fastq"),
      (lo until hi).flatMap(record).mkString("", "\n", "\n"))
    ()
  }

  private def runSink(srcDir: String, root: String): Unit = {
    val q = spark.readStream.format("fastq").option("maxFilesPerTrigger", "1")
      .load(srcDir)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        BlockLz4.writeBatch(
          graft.sources.Fastq.toFastqLines(
            b.select(col("seq").as("read")).repartition(2)),
          s"$root/out", id, blockBytes = 1024)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def gatedSeqs(root: String): Seq[String] = {
    val glob = BlockLz4.committedShardsGlob(new Configuration(), s"$root/out")
    glob.toSeq.flatMap { g =>
      import spark.implicits._
      spark.read.format("fastq").load(g).select("seq").as[String].collect()
    }.sorted
  }

  test("kill-restart: no duplicate, no missing shard; orphans stay invisible") {
    val dir = Files.createTempDirectory("graft_gb4z_sinkspec").toString
    val srcDir = s"$dir/src"; val root = s"$dir/sink"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    // run 1 ("crash" after two clean microbatches): files b0, b1
    writeSrc(srcDir, "b0", 0, 30)
    writeSrc(srcDir, "b1", 30, 60)
    runSink(srcDir, root)
    val mfsAfter1 = new java.io.File(s"$root/out").listFiles()
      .map(_.getName).filter(_.startsWith("_manifest-")).sorted.toSeq
    assert(mfsAfter1.size == 2, s"expected 2 committed batches, got $mfsAfter1")
    assert(gatedSeqs(root).size == 60)

    // a batch that DIED before its manifest commit: orphan shards on disk
    BlockLz4.writeFile(new Configuration(),
      s"$root/out/batch-99999-part-00000${BlockLz4.Extension}",
      Seq("@orphan", "AAAA", "+", "IIII").iterator)

    // restart with more source data: only the NEW files become batches
    writeSrc(srcDir, "b2", 60, 90)
    runSink(srcDir, root)
    val out = new java.io.File(s"$root/out").listFiles().map(_.getName).sorted
    val mfs = out.filter(_.startsWith("_manifest-")).toSeq
    assert(mfs.size == 3, s"resume re-ran or skipped batches: $mfs")
    // every manifest-listed shard exists exactly once on disk...
    val listed = mfs.flatMap { m =>
      Files.readAllLines(java.nio.file.Paths.get(s"$root/out/$m")).toArray
        .map(_.toString).filter(_.nonEmpty)
    }
    assert(listed.distinct.size == listed.size, "duplicate shard across manifests")
    listed.foreach(sh => assert(out.contains(sh), s"missing committed shard $sh"))
    // ...and the gated read returns each source record exactly once,
    // with the orphan excluded
    val got = gatedSeqs(root)
    val want = (0 until 90).map(i => record(i)(1)).sorted
    assert(got == want, "kill-restart lost or duplicated records")
    assert(!got.contains("AAAA"), "orphan shard leaked into the gated read")
  }

  test("replayed batch is idempotent: same shards, same manifest, same bytes read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gb4z_replay").toString
    val lines = (0 until 40).flatMap(record).toDF("value")
    val s1 = BlockLz4.writeBatch(lines.repartition(2), dir, 7L, blockBytes = 512)
    val r1 = gatedAll(dir)
    // foreachBatch re-delivery after a restart: same batch id, same data
    val s2 = BlockLz4.writeBatch(lines.repartition(2), dir, 7L, blockBytes = 512)
    assert(s2 == s1, "replay produced different shard names")
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("_manifest-")) == 1)
    assert(gatedAll(dir) == r1, "replay changed the committed content")
  }

  private def gatedAll(dir: String): Seq[String] = {
    import spark.implicits._
    BlockLz4.committedShardsGlob(new Configuration(), dir).toSeq.flatMap { g =>
      spark.read.format("fastq").load(g).select("seq").as[String].collect()
    }.sorted
  }
}
