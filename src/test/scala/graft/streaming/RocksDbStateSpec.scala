package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import java.sql.Timestamp

/** The RocksDB state-store backend as a pure deployment knob: identical
  * results to the default HDFS-backed provider for both a windowed
  * aggregation and an arbitrary-stateful mapGroupsWithState pipeline, and
  * state survives a checkpoint restart. This is the 100 TB state story —
  * when join/session state outgrows executor heaps, the provider swap is
  * the fix, and it must not change a single row. (es13 additionally runs
  * the swap through the DuckDB oracle gate.)
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](cls: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    cls match {
      case Some(c) => spark.conf.set(ProviderKey, c)
      case None => spark.conf.unset(ProviderKey)
    }
    try body finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  /** Runs the stateful running-user-stats pipeline over two microbatches
    * and returns each user's final row. */
  private def runStats(name: String): Map[Long, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      in.addData(
        EventStreams.Event(ts(0), 1L, "view", 2.0),
        EventStreams.Event(ts(1), 1L, "view", 3.0),
        EventStreams.Event(ts(0), 2L, "view", 7.0))
      q.processAllAvailable()
      in.addData(
        EventStreams.Event(ts(2), 1L, "buy", 5.0),
        EventStreams.Event(ts(3), 3L, "view", 1.0))
      q.processAllAvailable()
      spark.table(name).as[EventStreams.UserStats].collect()
        .groupBy(_.userId)
        .map { case (u, rows) =>
          val last = rows.maxBy(_.nEvents)
          u -> ((last.nEvents, last.totalCents))
        }
    } finally q.stop()
  }

  test("mapGroupsWithState on RocksDB equals the default backend row-for-row") {
    val expected = Map(1L -> ((3L, 1000L)), 2L -> ((1L, 700L)), 3L -> ((1L, 100L)))
    val hdfs = withProvider(None) { runStats("rdb_stats_default") }
    val rocks = withProvider(Some(RocksDb)) { runStats("rdb_stats_rocks") }
    assert(hdfs == expected)
    assert(rocks == expected)
  }

  test("RocksDB state survives a checkpoint stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = "/root/repo/target/graft_test/rocksdb_ckpt"
    val root = java.nio.file.Paths.get(ckpt)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    val out = s"$ckpt-out"
    val outRoot = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(outRoot)) {
      val walk = java.nio.file.Files.walk(outRoot)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    withProvider(Some(RocksDb)) {
      val in = MemoryStream[EventStreams.Event]
      // the memory sink cannot recover from a checkpoint, so the restart
      // test sinks through foreachBatch -> parquet (which can)
      def start() =
        EventStreams.runningUserStats(in.toDS())
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreams.UserStats], _: Long) =>
            batch.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
      val q1 = start()
      try {
        in.addData(EventStreams.Event(ts(0), 1L, "view", 2.0))
        q1.processAllAvailable()
      } finally q1.stop()
      // restart from the same checkpoint: the count for user 1 must
      // CONTINUE from the RocksDB-restored state (2 events), not reset
      val q2 = start()
      try {
        in.addData(EventStreams.Event(ts(5), 1L, "view", 3.0))
        q2.processAllAvailable()
        val rows = spark.read.parquet(out).as[EventStreams.UserStats].collect()
        assert(rows.exists(r => r.userId == 1L && r.nEvents == 2 &&
          r.totalCents == 500L), rows.mkString(", "))
      } finally q2.stop()
    }
  }
}
