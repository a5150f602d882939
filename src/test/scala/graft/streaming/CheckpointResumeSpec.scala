package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import java.nio.file.{Files, Path}

/** Streaming durability: a checkpointed ingestion pipeline (watermarked
  * exact dedup → parquet sink) survives a STOP + RESTART with
  * exactly-once output and recovered dedup state.
  *
  * This is the streaming complement of StageRunner's batch kill-resume
  * test: the first run consumes half the source files and stops; more
  * files arrive (including duplicates of already-emitted rows — the case
  * only the RESTORED state store can catch); the restarted query (same
  * checkpointLocation) must process only the new files, drop the
  * cross-restart duplicates, and never re-emit the first run's rows.
  * At 100 TB/day this is the contract that makes a streaming curator
  * restartable at all — no reprocessing after a crash, no double
  * ingestion, no duplicate leakage across the outage.
  */
class CheckpointResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  /** One single-file parquet batch of (ts, doc_id, text) rows. */
  private def writeBatch(dir: Path, name: String, rows: Seq[(Long, String)],
                         mtime: Long): Unit = {
    import spark.implicits._
    val scratch = dir.resolve(s"_tmp_$name")
    rows.toDF("doc_id", "text")
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id")))
      .select("ts", "doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val ls = Files.list(scratch)
    val part = try ls.filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    finally ls.close()
    Files.move(part, dir.resolve(s"$name.parquet"))
    Files.setLastModifiedTime(dir.resolve(s"$name.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(mtime))
    val walk = Files.walk(scratch)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { Files.deleteIfExists(f); () })
    finally walk.close()
  }

  test("checkpointed dedup stream resumes exactly-once after a stop") {
    val src = tmp("graft_cp_src")
    val cp = tmp("graft_cp_state")
    val out = tmp("graft_cp_out")

    val t0 = System.currentTimeMillis()
    writeBatch(src, "b0", Seq(1L -> "alpha", 2L -> "beta"), t0)
    writeBatch(src, "b1", Seq(3L -> "gamma", 2L -> "beta"), t0 + 2000) // in-run dup

    val schema = spark.read.parquet(src.toString).schema
    def pipeline() = EventStreams.dedupStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString),
      "ts", "text", watermark = "24 hours")

    def runOnce(): Unit = {
      val q = pipeline().writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce() // consumes b0 + b1, then stops — the "crash" point
    val firstRun = spark.read.parquet(out.toString)
    assert(firstRun.count() == 3) // alpha, beta, gamma — in-run dup dropped

    // the outage: new files land, two of them duplicating rows the FIRST
    // run emitted — only the restored state store can know to drop them
    writeBatch(src, "b2", Seq(4L -> "delta", 5L -> "alpha"), t0 + 4000)
    writeBatch(src, "b3", Seq(6L -> "beta", 7L -> "epsilon"), t0 + 6000)

    runOnce() // restart from the same checkpoint
    val resumed = spark.read.parquet(out.toString)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    // exactly-once: first run's rows appear ONCE (not reprocessed), the
    // cross-restart duplicates (alpha@5, beta@6) are dropped by the
    // recovered state, and only the genuinely new texts are appended
    assert(resumed == Set(1L -> "alpha", 2L -> "beta", 3L -> "gamma",
      4L -> "delta", 7L -> "epsilon"))
    assert(spark.read.parquet(out.toString).count() == 5)
  }

  /** One single-file parquet batch of (id, user, ts-epoch-min) rows with
    * the given column names. */
  private def writeEvents(dir: Path, name: String, cols: (String, String, String),
                          rows: Seq[(Long, Long, Int)], mtime: Long): Unit = {
    import spark.implicits._
    val scratch = dir.resolve(s"_tmp_$name")
    rows.toDF("id", "user", "m")
      .select(col("id").as(cols._1), col("user").as(cols._2),
        timestamp_millis(lit(1700000000000L) + col("m") * 60000L).as(cols._3))
      .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val ls = Files.list(scratch)
    val part = try ls.filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    finally ls.close()
    Files.move(part, dir.resolve(s"$name.parquet"))
    Files.setLastModifiedTime(dir.resolve(s"$name.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(mtime))
    val walk = Files.walk(scratch)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { Files.deleteIfExists(f); () })
    finally walk.close()
  }

  test("append session_window restart merges new events into restored open windows") {
    // es18's durability class: run 1 leaves OPEN sessions in the state
    // store (no watermark has passed them — nothing emitted); after the
    // outage a new event lands INSIDE one of those windows' gap, and only
    // the RESTORED session state can merge it instead of opening a fresh
    // window. A later far event drives the watermark past the real
    // sessions, finalizing them exactly once with the merged extents.
    val src = tmp("graft_swa_src")
    val cp = tmp("graft_swa_cp")
    val out = tmp("graft_swa_out")
    import spark.implicits._
    def writeEv(name: String, rows: Seq[(Long, Int)], mtime: Long): Unit = {
      val scratch = src.resolve(s"_tmp_$name")
      rows.toDF("user_id", "m")
        .select(col("user_id"),
          timestamp_millis(lit(1700000000000L) + col("m") * 60000L).as("ts"),
          lit(1.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val ls = Files.list(scratch)
      val part = try ls.filter(p =>
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally ls.close()
      Files.move(part, src.resolve(s"$name.parquet"))
      Files.setLastModifiedTime(src.resolve(s"$name.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
      val walk = Files.walk(scratch)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
    val t0 = System.currentTimeMillis()
    writeEv("b0", Seq(1L -> 0, 2L -> 5), t0)
    writeEv("b1", Seq(1L -> 10), t0 + 2000)
    val schema = spark.read.parquet(src.toString).schema
    def runOnce(): Unit = {
      val q = EventStreams.sessionWindowTotalsAppend(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src.toString))
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce() // both sessions still open — nothing finalized yet
    assert(spark.read.parquet(out.toString).count() == 0,
      "sessions emitted before any watermark passed them")
    // outage: user 1's new event falls within the restored window's gap
    // (m20 < m10 + 30min) and must MERGE; user 3's far event advances the
    // global watermark past both real sessions
    writeEv("b2", Seq(1L -> 20), t0 + 4000)
    writeEv("b3", Seq(3L -> 500), t0 + 6000)
    runOnce()
    val got = spark.read.parquet(out.toString)
      .select(col("user_id"), col("n_events"),
        unix_millis(col("sw.end")) - unix_millis(col("sw.start")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1: ONE merged session of 3 events spanning m0..m20+gap
    // (20 + 30 minutes); user 2: singleton (30-minute window); user 3's
    // far session stays open in state, never emitted
    assert(got == Set((1L, 3L, 50L * 60000), (2L, 1L, 30L * 60000)),
      s"restored session state did not merge across the restart: $got")
  }

  test("checkpointed stream-stream join resumes with recovered buffer state") {
    // the join-state complement of the dedup test: a click buffered
    // BEFORE the stop must still pair with a purchase arriving AFTER the
    // restart — only the restored two-sided join state can make that
    // match; and the pre-stop match must not re-emit.
    val clicksDir = tmp("graft_jcp_clicks")
    val purchDir = tmp("graft_jcp_purch")
    val cp = tmp("graft_jcp_state")
    val out = tmp("graft_jcp_out")

    val t0 = System.currentTimeMillis()
    writeEvents(clicksDir, "c0", ("click_id", "user_id", "cts"),
      Seq((100L, 1L, 0), (200L, 2L, 0)), t0)
    writeEvents(purchDir, "p0", ("purchase_id", "p_user", "pts"),
      Seq((900L, 2L, 5)), t0)

    val cSchema = spark.read.parquet(clicksDir.toString).schema
    val pSchema = spark.read.parquet(purchDir.toString).schema
    def runOnce(): Unit = {
      val clicks = spark.readStream.schema(cSchema)
        .option("maxFilesPerTrigger", "1").parquet(clicksDir.toString)
        .withWatermark("cts", "1 hour")
      val purchases = spark.readStream.schema(pSchema)
        .option("maxFilesPerTrigger", "1").parquet(purchDir.toString)
        .withWatermark("pts", "1 hour")
      val q = EventStreams.clickAttribution(clicks, purchases, 30 * 60000L)
        .select("click_id", "purchase_id")
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce() // click 100 buffered unmatched; (200, 900) emitted; stop
    def emitted() = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted() == Set((200L, 900L)))

    // the outage: user 1's purchase lands in-window for the BUFFERED
    // click, plus an unrelated new click
    writeEvents(purchDir, "p1", ("purchase_id", "p_user", "pts"),
      Seq((901L, 1L, 20)), t0 + 2000)
    writeEvents(clicksDir, "c1", ("click_id", "user_id", "cts"),
      Seq((300L, 3L, 10)), t0 + 2000)

    runOnce() // restart from the same checkpoint
    assert(emitted() == Set((200L, 900L), (100L, 901L)))
  }

  test("fastq connector: streaming resume processes only post-outage shards") {
    // the custom DSv2 source's offset log (files-consumed over the
    // name-sorted listing) must survive a checkpoint restart: shards
    // landing during the outage — named after the committed ones, per the
    // connector's monotone-naming restart contract — are the ONLY thing
    // the resumed query may process.
    val src = tmp("graft_fq_src")
    val cp = tmp("graft_fq_cp")
    val out = tmp("graft_fq_out")
    def shard(name: String, ids: Range): Unit = {
      val recs = ids.map(i => f"@r$i%04d\nACGTACGTACGT\n+\n@IIIIIIIIIII\n")
      Files.writeString(src.resolve(name), recs.mkString)
      ()
    }
    shard("shard_00.fastq", 0 until 10)
    shard("shard_01.fastq", 10 until 20)
    def runOnce(): Unit = {
      val q = spark.readStream.format("fastq")
        .option("maxFilesPerTrigger", "1").load(src.toString)
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce() // consumes shards 00-01, stops — the "crash" point
    assert(spark.read.parquet(out.toString).count() == 20)
    // the outage: two more shards land
    shard("shard_02.fastq", 20 until 30)
    shard("shard_03.fastq", 30 until 35)
    runOnce() // restart from the same checkpoint
    val ids = spark.read.parquet(out.toString)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(ids.length == 35, "resume reprocessed or skipped shards")
    assert(ids.distinct.length == 35, "resume duplicated records")
    assert(ids.sorted == (0 until 35).map(i => f"r$i%04d"))
  }

  test("checkpointed LSH gate re-emits pre-stop verdicts from restored state") {
    // es16's durability class: a COMPLETE-mode aggregation. After a
    // restart, docs whose input files were consumed before the stop can
    // only reappear in the output from the RESTORED aggregation state —
    // the checkpoint marks their files committed, so they are never
    // re-read.
    import spark.implicits._
    val src = tmp("graft_lsh_src")
    val cp = tmp("graft_lsh_cp")
    val t0 = System.currentTimeMillis()
    val idxText = (1 to 12).map(i => s"w$i").mkString(" ")
    val idx = graft.operators.Dedup.bandRows(
      Seq((100L, idxText)).toDF("doc_id", "text")).localCheckpoint()
    // doc 1 duplicates indexed content (all 4 bands hit); doc 2 is novel
    writeBatch(src, "b0",
      Seq(1L -> idxText, 2L -> "zz yy xx ww vv uu tt ss rr"), t0)
    val schema = spark.read.parquet(src.toString).schema
    def gate() = EventStreams.lshGateStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .select("doc_id", "text"), idx)
    def run(name: String): Map[Long, (Long, Int)] = {
      val q = gate().writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", cp.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).as[(Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    val first = run("lsh_cp_1")
    assert(first.keySet == Set(1L, 2L))
    assert(first(1L) == ((4L, 0)), s"dup doc must hit all 4 bands: $first")
    assert(first(2L) == ((0L, 1)), s"novel doc must pass: $first")
    writeBatch(src, "b1", Seq(3L -> "aa bb cc dd ee ff gg"), t0 + 4000)
    val second = run("lsh_cp_2") // restart: only b1 is read
    assert(second.keySet == Set(1L, 2L, 3L),
      "pre-stop verdicts lost across restart")
    assert(second(1L) == first(1L) && second(2L) == first(2L))
    assert(second(3L) == ((0L, 1)))
  }
}
