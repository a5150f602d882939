package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the streaming counterparts of the batch
  * event operators ([[graft.operators.Events]]). `readStream` -> these
  * transforms -> `writeStream`; state lives in the state store, so the
  * operators scale with the key space, not the stream length.
  */
object EventStreams {

  case class Event(ts: java.sql.Timestamp, userId: Long, eventType: String, value: Double)
  case class SessState(start: Long, last: Long, n: Long)
  case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Long)
  /** Running totals carry CENTS as a long, not a double: long addition is
    * associative and commutative, so the accumulated state is identical
    * under any microbatch partitioning or within-batch arrival order —
    * double accumulation would drift with the order the shuffle happens
    * to deliver (and could never hash-match a decimal-summing oracle).
    * Per-event rounding mirrors Spark's double→decimal(18,2) cast
    * (BigDecimal.valueOf + HALF_UP), the same convention e1's batch
    * aggregation uses. */
  case class UserStats(userId: Long, nEvents: Long, totalCents: Long)

  /** Streaming analogue of e1: event-time tumbling window with watermark
    * (late data beyond 1 hour is dropped, state is evicted). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("eventType"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("eventType"), col("n"))

  /** Streaming analogue of e2: gap-based sessions via
    * flatMapGroupsWithState — a session closes (and is emitted, Append
    * mode) when a later event for the same user arrives past the gap. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[Event], state: GroupState[SessState]) => {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption
          val out = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case Some(s) if t - s.last > gapMs =>
                out += ClosedSession(uid, s.start, s.last, s.n)
                st = Some(SessState(t, t, 1))
              case Some(s) =>
                st = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case None =>
                st = Some(SessState(t, t, 1))
            }
          }
          st.foreach(state.update)
          out.result().iterator
        })
  }

  /** Streaming mirror of the batch `e1_hourly_agg` query — identical
    * grouping and arithmetic (decimal-summed `total`), expressed as an
    * event-time window aggregation. Run in Complete mode it converges to
    * exactly the batch answer on a bounded input, which is what the
    * `es1_stream_hourly` parity query proves through the oracle gate. */
  def hourlyTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)")
          .cast("double").as("total"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("total"))

  /** Streaming data-quality monitor — the continuous form of the batch
    * dq1 constraint report ([[graft.operators.DataQuality]]): per
    * event_type, running counts of rows violating each declared
    * constraint plus freshness bounds. Every metric is an associative
    * conditional sum (or min/max), so the Complete-mode fixpoint over any
    * microbatch split equals the batch answer — the property that lets
    * one monitor definition serve both the nightly audit and the live
    * ingest dashboard. State is bounded by the event_type vocabulary,
    * never the stream length. */
  def dqMonitor(events: DataFrame): DataFrame = {
    def violations(pred: org.apache.spark.sql.Column) =
      sum(when(pred, 1L).otherwise(0L))
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        violations(col("user_id").isNull).as("v_null_user"),
        violations(col("value").isNull || col("value") < 0 ||
          col("value") > 1e9).as("v_value_range"),
        violations(col("ts").isNull ||
          col("ts") < lit("2020-01-01").cast("timestamp") ||
          col("ts") >= lit("2030-01-01").cast("timestamp")).as("v_ts_window"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast per microbatch — the standard lookup-join shape
    * for reference data at scale). */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(userDim), Seq("userId"), "left")

  /** STREAM-STREAM inner join (the remaining Structured Streaming join
    * class after es8's stream-static broadcast): attribute each purchase
    * to every click by the same user within `windowMs` before it. Both
    * sides carry event-time watermarks and the join condition bounds
    * purchase time to [click, click + window], so Spark derives exact
    * state-retention: a buffered click is evicted once the purchase-side
    * watermark passes click + window — state scales with the in-window
    * event rate, never the stream length (THE requirement at 100 TB/day).
    * Inner-join matches emit as soon as both sides arrive (Append mode);
    * on a bounded ordered replay the emitted set is exactly the batch
    * interval-join answer, which is what the es9 oracle proves.
    *
    * Expects `clicks(click_id, user_id, cts)` / `purchases(purchase_id,
    * p_user, pts)` ALREADY watermarked by the caller (watermark must be
    * >= windowMs or in-window matches could be evicted early). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       windowMs: Long, joinType: String = "inner"): DataFrame =
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr(s"interval $windowMs milliseconds"),
      joinType)

  /** Streaming analogue of e8: NATIVE session_window aggregation — the
    * state store MERGES session windows as events arrive (two sessions
    * that a late bridging event joins collapse into one), which is a
    * different stateful-operator class from the flatMapGroupsWithState
    * sessionizer (es2): there the merge logic is hand-written, here it is
    * Spark's session-window state store. Exact decimal sums, so the
    * merged state is arrival-order-independent and the Complete-mode
    * fixpoint equals the batch session_window answer. */
  def sessionWindowTotals(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)").as("sum_dec"))

  /** APPEND-mode variant of [[sessionWindowTotals]]: the watermark lets
    * the session-window state store FINALIZE — a session row is emitted
    * exactly once, in the microbatch whose watermark first passes the
    * session's end, and its state is evicted (Complete mode above keeps
    * every session resident and re-emits the world each batch). Zero
    * watermark delay is correct on the event-time-ordered replay; the
    * `__flush` sentinel rows (one per user, gap+2ms past the global max)
    * advance the watermark past every real session's end. The sentinels
    * are deliberately NOT filtered out: a pre-aggregation filter on
    * event_type gets pushed below the EventTimeWatermark node, silently
    * un-advancing the watermark (observed: the session holding the
    * global-max event never finalized). They need no filter — a sentinel
    * session starts 2ms after the last real end (never merges) and ends
    * gap past the final watermark (never finalizes), so Append mode
    * self-excludes it; it merely parks in state until shutdown. */
  def sessionWindowTotalsAppend(events: DataFrame,
                                gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)").as("sum_dec"))

  /** Incremental near-dup ADMISSION GATE: band the incoming document
    * stream per row ([[graft.operators.Dedup.bandRows]] — a stateless
    * typed projection, no state store, no shuffle on the stream side)
    * and probe a STATIC MinHash-LSH band index of the already-ingested
    * corpus with a stream-static equi-join on (bid, bh). Per streamed
    * doc: the count of index band hits; `novel = 1` (zero hits in all
    * four bands) means safe to admit. This is how a 100 TB corpus takes
    * deliveries: the index is a bucketed table maintained in batch, each
    * microbatch probes it by hash, and nothing ever compares documents
    * pairwise. The es16 gate proves the emitted classification matches
    * the batch band join exactly. */
  def lshGateStream(docs: DataFrame, indexBands: DataFrame): DataFrame = {
    val sb = graft.operators.Dedup.bandRows(docs)
    val ib = indexBands.select(col("bid").as("ibid"), col("bh").as("ibh"),
      col("doc_id").as("idx_doc"))
    sb.join(ib, sb("bid") === ib("ibid") && sb("bh") === ib("ibh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("idx_doc").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"),
        when(col("n_hits") === 0, 1).otherwise(0).as("novel"))
  }

  /** Streaming exact dedup for an ingestion pipeline: keep the first
    * occurrence of each content hash; the watermark bounds the dedup
    * state (duplicates arriving later than the watermark may pass, which
    * is the standard state-size/completeness trade at 100 TB/day rates —
    * the batch d1 pass downstream catches stragglers). */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("h", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")

  /** Streaming k-mer counter (the `counter` pipeline as a stream): reads
    * arrive continuously, canonical k-mers accumulate in an Update-mode
    * hash aggregation — the state store holds one row per distinct k-mer,
    * exactly the batch shuffle key space. */
  def kmerCountStream(reads: Dataset[String], k: Int): DataFrame = {
    import reads.sparkSession.implicits._
    reads.flatMap(r => graft.core.KmerIter.canonicalLong(r, k))
      .toDF("kv")
      .groupBy("kv").count()
  }

  /** Streaming ingestion curation: the stream-side half of
    * [[graft.operators.Curation.curate]] — per-doc quality gates (same
    * thresholds as the batch `quality_ok` verdict) plus watermark-bounded
    * exact dedup, so a continuously-arriving corpus lands pre-filtered and
    * first-occurrence-only. Near-dup/semantic stages stay batch (they need
    * corpus-global joins); this is the standard split: cheap per-row gates
    * at ingest, global passes in the nightly batch. */
  def curateStream(docs: DataFrame, tsCol: String = "ts",
                   watermark: String = "1 hour"): DataFrame = {
    val ws = split(col("text"), " ")
    val stopwords = Seq("the", "a", "of", "and", "in", "to")
    docs
      .filter(size(ws).between(10, 2000) &&
        size(filter(ws, w => w.isInCollection(stopwords))) >= 1)
      .withColumn("h", md5(col("text").cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")
  }

  case class FunnelState(vUs: Long, cUs: Long, pUs: Long)
  case class FunnelRow(userId: Long, vUs: Long, cUs: Long, pUs: Long, stage: Int)

  /** Exact epoch micros of a Timestamp. `getTime * 1000` silently floors
    * to millisecond precision (testdata timestamps carry sub-ms micros,
    * and the batch e10 compares in exact `unix_micros`); the nanos field
    * holds the full fractional second. */
  private def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming analogue of e10: the per-user view->click->purchase stage
    * machine as mapGroupsWithState (Update mode — each microbatch emits
    * the user's current funnel row). State is three epoch-micro longs per
    * user (-1 = stage not reached), so the store scales with the user
    * space, not the stream. Events inside a microbatch are processed in
    * event-time order; with in-order arrival across batches the fixpoint
    * equals the batch e10 funnel (spec-proven on a replayed stream).
    * Late cross-batch events are the usual streaming trade: an earlier
    * view arriving after a click was consumed cannot retroactively move
    * the click — the nightly batch e10 is the reconciler. */
  /** `idleTimeoutMs > 0` bounds the state store at 100 TB/day rates: a
    * user idle past the timeout is evicted (emitted once more with their
    * final stage) and restarts from stage 0 if they return — the usual
    * streaming state/completeness trade; the nightly batch e10
    * reconciles. 0 = keep state forever. */
  def funnelStream(events: Dataset[Event],
                   idleTimeoutMs: Long = 0L): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .mapGroupsWithState(timeoutConf)(
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            FunnelRow(uid, st.vUs, st.cUs, st.pUs,
              (if (st.vUs >= 0) 1 else 0) + (if (st.cUs >= 0) 1 else 0) +
                (if (st.pUs >= 0) 1 else 0))
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            it.toSeq.sortBy(e => (tsMicros(e.ts), e.eventType)).foreach { e =>
              val t = tsMicros(e.ts) // exact micros, matching e10's unix_micros
              e.eventType match {
                case "view" if st.vUs < 0 => st = st.copy(vUs = t)
                case "click" if st.vUs >= 0 && st.cUs < 0 && t > st.vUs =>
                  st = st.copy(cUs = t)
                case "purchase" if st.cUs >= 0 && st.pUs < 0 && t > st.cUs =>
                  st = st.copy(pUs = t)
                case _ =>
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            FunnelRow(uid, st.vUs, st.cUs, st.pUs,
              (if (st.vUs >= 0) 1 else 0) + (if (st.cUs >= 0) 1 else 0) +
                (if (st.pUs >= 0) 1 else 0))
          }
        })
  }

  /** Per-event cents under the exact double→decimal(18,2) convention. */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** Running per-user aggregates via mapGroupsWithState (Update mode).
    * Emits the user's cumulative row each microbatch; nEvents is
    * monotone, so the final state is the max-nEvents row per user. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[Event], state: GroupState[UserStats]) => {
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L))
          var n = 0L; var c = 0L
          it.foreach { e => n += 1; c += cents(e.value) }
          val next = UserStats(uid, prev.nEvents + n, prev.totalCents + c)
          state.update(next)
          next
        })
  }
}
