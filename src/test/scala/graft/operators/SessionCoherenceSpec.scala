package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** e2 (manual lag/cumsum sessionizer, millisecond gap rule) and e8
  * (native session_window, microsecond merge-on-touch) implement the SAME
  * session semantics wherever timestamps are at >= millisecond
  * granularity — this fuzz pins that coherence on random whole-second
  * event sets. (At sub-millisecond granularity the two are DOCUMENTED to
  * differ: e2's rule truncates gaps to ms, e8 compares exact
  * microseconds — both oracle-pinned individually, including the
  * exactly-30:00 equality case planted by tools/patho_check.py.)
  */
class SessionCoherenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("e2 and e8 produce identical sessions on random second-granular events") {
    val rnd = new scala.util.Random(29)
    (0 until 3).foreach { trial =>
      val rows = for {
        u <- 1 to 20
        n = rnd.nextInt(13)
        i <- 0 until n
      } yield (u.toLong * 1000 + i, // unique event_id
        1700000000L + rnd.nextInt(3 * 86400), // whole seconds over 3 days
        u.toLong, "view", 1.0, """{"k": 1}""")
      val dir = java.nio.file.Files.createTempDirectory(s"sess$trial").toString
      rows.toDF("event_id", "tsec", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_seconds(col("tsec"))).drop("tsec")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // (user, session start epoch-second, n_events) is a full session key
      val manual = Events.queries("e2_sessionize")(spark, dir)
        .select(col("user_id"), col("start_ts"), col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      val native = Events.queries("e8_session_window")(spark, dir)
        .select(col("user_id"),
          date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss")
            .as("start_ts"),
          col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(manual == native,
        s"trial $trial: manual and native sessionizers disagree\n" +
          s"only-manual: ${(manual -- native).take(5)}\n" +
          s"only-native: ${(native -- manual).take(5)}")
    }
  }

  test("es17b's deferred replay really plants window-MERGING bridge events") {
    // the es17b gate is only adversarial if the deferred set contains
    // events that arrive AFTER both of their session neighbours and land
    // within the gap of each while the neighbours sit further than one
    // gap apart — exactly the shape that forces the session-window state
    // store to merge two already-open windows. Count those shapes on the
    // gate corpus; zero would mean the out-of-order gate degenerated back
    // to extend-only arrival.
    // independent replica of Replay.eventsDir's deferred-set rule:
    // deferred = (event_id % 5 == 2) UNION bridge-shaped events relative
    // to the mod-kept timeline; then verify that, against the FINAL kept
    // timeline, at least one deferred event still merges two windows
    val sf = "/root/testdata/sf0.001"
    val gapUs = graft.streaming.Replay.DeferGapUs
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def isBridge(t: Long, kept: Seq[Long]): Boolean = {
      val prev = kept.filter(_ < t).lastOption
      val next = kept.find(_ > t)
      (prev, next) match {
        case (Some(p), Some(n)) =>
          n - p > gapUs && t - p <= gapUs && n - t <= gapUs
        case _ => false
      }
    }
    val bridges = evs.groupBy(_._1).valuesIterator.map { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val modKept = sorted.filter(_._3 % 5 != 2)
      val deferred = sorted.filter(r =>
        r._3 % 5 == 2 || isBridge(r._2, modKept.map(_._2).toSeq))
      val deferredIds = deferred.map(_._3).toSet
      val kept = sorted.filterNot(r => deferredIds(r._3)).map(_._2).toSeq
      deferred.count(r => isBridge(r._2, kept))
    }.sum
    assert(bridges > 0,
      "no deferred event bridges two open windows — es17b is not adversarial")
  }
}
