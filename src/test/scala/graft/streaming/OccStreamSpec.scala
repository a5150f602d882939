package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import graft.TestSpark
import graft.sources.OccLog
import java.nio.file.Files

/** es22's durability + concurrency contract, split into its two halves:
  *
  *  - KILL-RESTART: a streaming writer publishing per-batch through the
  *    OccLog CAS dies mid-run (before AND, separately, after its commit)
  *    and is restarted on the same checkpoint. The retried micro-batch
  *    republishes the SAME staged dir, so the table content is identical
  *    to a clean run — no duplicate, missing, or lost commit. A
  *    crash-after-commit costs exactly one extra manifest version
  *    (replace-partition idempotence); a crash-before-commit costs none.
  *
  *  - LATCH-HELD RACE, BOTH ORDERS: two writers of disjoint partitions
  *    both read the same snapshot before either commits; whichever links
  *    first, the loser rebases — versions {2,3} are claimed exactly once
  *    each and both partitions' updates survive, in either forced order.
  */
class OccStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def seedChanges(root: String, nBatches: Int): Unit = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    (0 until nBatches).foreach { i =>
      val scratch = s"$root/_tmp_$i"
      Seq.tabulate(4)(j => (i.toLong * 10 + j, i.toLong))
        .toDF("doc_id", "gen")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      val inDir = new java.io.File(s"$root/changes"); inDir.mkdirs()
      val dst = new java.io.File(inDir, f"b$i%02d.parquet")
      Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(t0 + i * 2000L)
    }
  }

  /** Run the es22-shaped writer over the seeded changes; `boom` fires
    * inside foreachBatch for batch 1 exactly once (before or after the
    * commit), simulating a crash; the query is then RESTARTED on the
    * same checkpoint and must complete. Returns the final manifest. */
  private def runWriter(root: String, failPoint: Option[String]): OccLog.Manifest = {
    val s = spark
    val armed = new java.util.concurrent.atomic.AtomicBoolean(failPoint.isDefined)
    val sch = s.read.parquet(s"$root/changes").schema
    def start() = s.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(s"$root/changes")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val dir = s"$root/data/b$id"
        b.write.mode("overwrite").parquet(dir)
        if (id == 1 && failPoint.contains("before") && armed.getAndSet(false))
          sys.error("injected crash BEFORE commit")
        graft.operators.Lakehouse.occCommitBatch(root, "p", dir)
        if (id == 1 && failPoint.contains("after") && armed.getAndSet(false))
          sys.error("injected crash AFTER commit")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    try { start().awaitTermination() }
    catch { case _: StreamingQueryException => start().awaitTermination() }
    assert(!armed.get(), "the injected crash never fired")
    OccLog.readLatest(root)
  }

  private def content(m: OccLog.Manifest): Seq[(Long, Long)] =
    spark.read.parquet(m.entries("p"))
      .select(col("doc_id"), col("gen"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("streaming OCC writer: kill-restart is exactly-once (both crash sites)") {
    import spark.implicits._
    def init(root: String): Unit = {
      seedChanges(root, 3)
      val v1 = s"$root/data/v1"
      Seq((999L, -1L)).toDF("doc_id", "gen")
        .write.mode("overwrite").parquet(v1)
      OccLog.init(root, Map("p" -> v1))
    }
    val clean = tmp("occ_clean"); init(clean)
    val mClean = runWriter(clean, None)
    assert(mClean.version == 4, s"clean run: 1 init + 3 commits, got $mClean")
    assert(content(mClean) == Seq((20L, 2L), (21L, 2L), (22L, 2L), (23L, 2L)))

    // crash BEFORE the commit: the retry is invisible in the log
    val pre = tmp("occ_pre"); init(pre)
    val mPre = runWriter(pre, Some("before"))
    assert(mPre.version == 4, s"crash-before-commit must add no version, got $mPre")
    assert(content(mPre) == content(mClean), "content diverged after restart")

    // crash AFTER the commit: the retried batch republishes the same
    // staged dir — exactly one extra version, identical content
    val post = tmp("occ_post"); init(post)
    val mPost = runWriter(post, Some("after"))
    assert(mPost.version == 5, s"crash-after-commit costs exactly 1 version, got $mPost")
    assert(content(mPost) == content(mClean), "content diverged after recommit")
    assert(mPost.entries("p") == s"$post/data/b2", mPost.entries.toString)
  }

  test("es23 quarantine writer: kill-restart never double-quarantines (both crash sites)") {
    import spark.implicits._
    // 3 batches of payload rows; id 13 carries the planted bad checksum,
    // id 20 is an empty payload, id 21 a size mismatch (n_chars lies)
    def seedQuar(root: String): Unit = {
      val t0 = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val rows = Seq.tabulate(8) { j =>
          val id = i * 10 + j
          val text = if (id == 20) "" else s"payload-$id"
          val nc = if (id == 21) 999L else text.length.toLong
          (id.toLong, s"src$i", text, nc)
        }
        val scratch = s"$root/_tmp_$i"
        rows.toDF("doc_id", "source", "text", "n_chars")
          .coalesce(1).write.mode("overwrite").parquet(scratch)
        val part = new java.io.File(scratch).listFiles()
          .filter(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).head
        val inDir = new java.io.File(s"$root/changes"); inDir.mkdirs()
        val dst = new java.io.File(inDir, f"b$i%02d.parquet")
        Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(t0 + i * 2000L)
      }
    }
    def runQuar(root: String, failPoint: Option[String]): (OccLog.Manifest, Seq[(Long, String)]) = {
      val s = spark
      val armed = new java.util.concurrent.atomic.AtomicBoolean(failPoint.isDefined)
      val sch = s.read.parquet(s"$root/changes").schema
      def start() = s.readStream.schema(sch).option("maxFilesPerTrigger", "1")
        .parquet(s"$root/changes")
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: DataFrame, id: Long) =>
          val dir = s"$root/data/b$id"
          graft.operators.Lakehouse.quarantineBatch(b)
            .write.mode("overwrite").parquet(dir)
          if (id == 1 && failPoint.contains("before") && armed.getAndSet(false))
            sys.error("injected crash BEFORE commit")
          graft.operators.Lakehouse.occCommitBatch(root, s"b$id", dir)
          if (id == 1 && failPoint.contains("after") && armed.getAndSet(false))
            sys.error("injected crash AFTER commit")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try { start().awaitTermination() }
      catch { case _: StreamingQueryException => start().awaitTermination() }
      assert(!armed.get(), "the injected crash never fired")
      val fin = OccLog.readLatest(root)
      val rows = spark.read
        .schema("doc_id bigint, source string, n_bytes bigint, verdict string")
        .parquet(fin.entries.values.toSeq.sorted: _*)
        .select(col("doc_id"), col("verdict"))
        .as[(Long, String)].collect().toSeq.sorted
      (fin, rows)
    }
    val clean = tmp("quar_clean"); seedQuar(clean); OccLog.init(clean, Map.empty)
    val (mClean, qClean) = runQuar(clean, None)
    assert(mClean.version == 4, s"1 init + 3 commits, got ${mClean.version}")
    // the three planted defects, exactly once each, correctly classified
    assert(qClean == Seq((13L, "checksum_mismatch"), (20L, "empty"),
      (21L, "size_mismatch")), qClean.toString)

    for (site <- Seq("before", "after")) {
      val root = tmp(s"quar_$site"); seedQuar(root); OccLog.init(root, Map.empty)
      val (m, q) = runQuar(root, Some(site))
      // crash-before adds no version; crash-after exactly one (the retry
      // republishes the same staged dir into the same partition key)
      assert(m.version == (if (site == "before") 4 else 5),
        s"$site: version ${m.version}")
      assert(q == qClean, s"$site: quarantine content diverged: $q")
    }
  }

  test("latch-held race, both orders: versions claimed once, both updates survive") {
    import scala.concurrent.{blocking, Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    for (firstIsP <- Seq(true, false)) {
      val root = tmp(s"occ_race_$firstIsP")
      OccLog.init(root, Map("p" -> "d/p0", "q" -> "d/q0"))
      val bothRead = new java.util.concurrent.CountDownLatch(2)
      val winnerDone = new java.util.concurrent.CountDownLatch(1)
      def writer(partition: String, winner: Boolean): Future[Int] = Future {
        val snap = OccLog.readLatest(root).version // both read v1 pre-commit
        bothRead.countDown(); blocking { bothRead.await() }
        if (!winner) blocking { winnerDone.await() } // force the order
        val v = OccLog.commitReplacePartition(
          root, partition, s"d/$partition-new", snap)
        if (winner) winnerDone.countDown()
        v
      }
      val Seq(vp, vq) = Await.result(
        Future.sequence(Seq(
          writer("p", winner = firstIsP), writer("q", winner = !firstIsP))),
        Duration(60, "s"))
      // the forced winner takes v2; the loser REBASES (disjoint
      // partitions) and lands v3 — no version skipped or duplicated
      assert(Set(vp, vq) == Set(2, 3), s"order firstIsP=$firstIsP: ($vp, $vq)")
      assert((if (firstIsP) vp else vq) == 2, "forced winner did not take v2")
      val fin = OccLog.readLatest(root)
      assert(fin.version == 3)
      assert(fin.entries == Map("p" -> "d/p-new", "q" -> "d/q-new"), fin.entries.toString)
    }
  }
}
