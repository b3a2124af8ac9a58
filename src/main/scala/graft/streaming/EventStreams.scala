package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table, Structured-Streaming
  * first: every transform here works identically on a batch DataFrame and a
  * `readStream` DataFrame (windowed aggregation and `session_window` are
  * streaming-native operators), so the registered queries run the *same
  * code* the streaming path runs — the batch run is the oracle-checkable
  * execution of the streaming semantics.
  *
  * Scale notes: hourly windows shuffle once on (window, event_type) with
  * partial aggregation map-side; sessionization shuffles once on user_id.
  * With watermarks the state store holds only open windows/sessions, so
  * state is bounded by active keys — the 100 TB concern is key cardinality
  * (users), not event volume.
  */
object EventStreams {

  /** events schema with a caller-supplied physical type for `ts` —
    * readStream can't infer, so we probe the batch footer first (see
    * [[readEventsStream]]) and build the stream schema to match whichever
    * layout (legacy INT64-nanos or native timestamp[us]) is on disk. */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Open the events table as a file stream, schema-adaptive on the
    * physical `ts` type: a one-off batch footer probe decides whether the
    * on-disk column is legacy INT64 nanos or a native timestamp, then the
    * stream declares that exact type and normalizes to TimestampType via
    * the same [[graft.Tables.eventsNormalizeTs]] the batch path uses —
    * one conversion rule, two execution modes.
    *
    * An empty or not-yet-populated directory (normal at stream-definition
    * time — the writer may start after the reader) can't be probed; fall
    * back to the native timestamp layout, today's writer default.
    *
    * The probed layout is declared for the stream's LIFETIME: a streamed
    * directory must be layout-homogeneous. A later file written with the
    * OTHER physical type fails the declared schema loudly at scan time
    * (parquet conversion error in that micro-batch) rather than decoding
    * nonsense — mixed-writer lakes must split layouts into separate
    * directories (or rewrite) before streaming them; TablesSpec pins the
    * batch path's behavior on a mixed directory. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampType }
    Tables.eventsNormalizeTs(
      spark.readStream.schema(rawSchema(tsType)).parquet(dir))
  }

  /** Drop duplicate events by id — the at-least-once → exactly-once
    * repair stage of a streaming ingest. Batch and stream share this
    * code; streaming callers add a watermark so dedup state expires. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Row shape for the stateful threshold detector. */
  final case class Ev(user_id: Long, event_id: Long, ms: Long, value: Double)
  /** First event at which a user's cumulative value crossed the threshold. */
  final case class Alert(user_id: Long, event_id: Long, ms: Long, cum: Double)
  /** Running state per user across micro-batches. */
  final case class RunState(cum: Double, fired: Boolean)

  /** Custom stateful operator: emit ONE alert per user — the first event
    * where the running sum of `value` crosses `threshold`. Not expressible
    * with windows (the emission depends on a cross-batch accumulator).
    *
    * Two execution paths with identical semantics (proven stream==batch in
    * StreamingSpec):
    *   - streaming: `flatMapGroupsWithState` — state = (running total,
    *     fired?) carried across micro-batches; the in-memory sort is
    *     bounded by one micro-batch's slice of one group, not the group's
    *     full history.
    *   - batch: `flatMapSortedGroups` — a *secondary sort* delivers each
    *     group's iterator already (ms, event_id)-ordered, and [[consume]]
    *     reads it streamingly and stops at the first crossing, so a hot
    *     user with 10⁷ events never materializes (the previous
    *     `it.toSeq.sortBy` buffered whole groups — an executor OOM at
    *     power-law scale). */
  def thresholdAlerts(events: DataFrame, threshold: Double = 500.0): Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val evs = events.select(col("user_id"), col("event_id"),
      unix_millis(col("ts")).as("ms"), col("value")).as[Ev]

    // Shared core: consume time-ordered events, return (end state, alert).
    // Stops pulling the iterator once fired — no further alert is possible
    // and cum is only carried for un-fired state.
    def consume(user: Long, prior: RunState, ordered: Iterator[Ev]): (RunState, Option[Alert]) =
      if (prior.fired) (prior, None)
      else {
        var cum = prior.cum
        var alert = Option.empty[Alert]
        while (ordered.hasNext && alert.isEmpty) {
          val e = ordered.next()
          cum += e.value
          if (cum >= threshold) alert = Some(Alert(user, e.event_id, e.ms, cum))
        }
        (RunState(cum, alert.nonEmpty), alert)
      }

    if (events.isStreaming)
      evs.groupByKey(_.user_id)
        .flatMapGroupsWithState[RunState, Alert](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          case (user, it, state: GroupState[RunState]) =>
            val prior = state.getOption.getOrElse(RunState(0.0, fired = false))
            val (next, alert) =
              consume(user, prior, it.toSeq.sortBy(e => (e.ms, e.event_id)).iterator)
            state.update(next)
            alert.iterator
        }
    else
      evs.groupByKey(_.user_id)
        .flatMapSortedGroups(col("ms"), col("event_id")) { (user, it) =>
          consume(user, RunState(0.0, fired = false), it)._2
        }
  }

  /** Row shape for the disorder audit's stateful path. */
  final case class AEv(user_id: Long, event_id: Long, us: Long, arr: Long)
  /** Per-user disorder state across micro-batches. */
  final case class AuditState(maxUs: Long, n: Long, l1: Long, l10: Long,
    l30: Long, maxDis: Long)
  /** Per-user audit row (cumulative as of the last processed batch). */
  final case class Audit(user_id: Long, n_events: Long, n_late_1m: Long,
    n_late_10m: Long, n_late_30m: Long, max_disorder_s: Long)

  /** Ingest-disorder audit — the watermark-SIZING operator: before you
    * pick `withWatermark("ts", X)`, this measures how out-of-order the
    * feed actually is, per key: for each event in arrival order, its
    * disorder is how far its event time lags the maximum event time
    * already seen for that user; the output counts events a 1m/10m/30m
    * watermark would have dropped, plus the worst lag. Spark's own
    * late-row drop is arrival-dependent and so unverifiable by a batch
    * oracle; the audit is the deterministic ground truth those drops
    * converge to under the same replay order.
    *
    * The fixture's `event_id` order IS its event-time order, so arrival
    * is modeled as event time plus a deterministic ingest delay — the
    * portable md5 hash of the event id, bounded below one hour (network
    * jitter, not clock skew). Everything is integer micros; the oracle
    * replays the identical permutation.
    *
    * Two execution paths, proven equal in StreamingSpec:
    *  - batch (registered, oracle-gated): running `max(us)` over a
    *    per-user arrival-ordered window — partitioned by user_id, so no
    *    single-task sort at scale;
    *  - streaming: `flatMapGroupsWithState`, state = (max event time,
    *    counts); each micro-batch slice is sorted by arrival within the
    *    group (bounded by the batch, as in [[thresholdAlerts]]) and
    *    emits the refreshed cumulative audit row per touched user. */
  def disorderAudit(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val D1 = 60L * 1000000; val D10 = 600L * 1000000; val D30 = 1800L * 1000000
    val us = unix_micros(col("ts"))
    val evs = events.select(col("user_id"), col("event_id"), us.as("us"),
      (us + pmod(graft.functions.PortableHash.baseHash(col("event_id").cast("string")),
        lit(3600L)) * 1000000L).as("arr"))

    def fold(st: AuditState, e: AEv): AuditState = {
      val dis = if (st.n > 0 && st.maxUs > e.us) st.maxUs - e.us else 0L
      AuditState(math.max(st.maxUs, e.us), st.n + 1,
        st.l1 + (if (dis > D1) 1 else 0), st.l10 + (if (dis > D10) 1 else 0),
        st.l30 + (if (dis > D30) 1 else 0), math.max(st.maxDis, dis))
    }

    if (events.isStreaming)
      evs.as[AEv].groupByKey(_.user_id)
        .flatMapGroupsWithState[AuditState, Audit](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          case (user, it, state: GroupState[AuditState]) =>
            val prior = state.getOption.getOrElse(AuditState(Long.MinValue, 0, 0, 0, 0, 0))
            val next = it.toSeq.sortBy(e => (e.arr, e.event_id)).foldLeft(prior)(fold)
            state.update(next)
            Iterator.single(Audit(user, next.n, next.l1, next.l10, next.l30,
              next.maxDis / 1000000L))
        }.toDF()
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("arr"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      evs.withColumn("pm", max(col("us")).over(w))
        .withColumn("dis",
          when(col("pm").isNull || col("pm") < col("us"), 0L)
            .otherwise(col("pm") - col("us")))
        .groupBy(col("user_id")).agg(
          count(lit(1)).as("n_events"),
          sum((col("dis") > D1).cast("long")).as("n_late_1m"),
          sum((col("dis") > D10).cast("long")).as("n_late_10m"),
          sum((col("dis") > D30).cast("long")).as("n_late_30m"),
          expr("max(dis) div 1000000").as("max_disorder_s"))
    }
  }

  /** Tumbling 1-hour windows per event type. Works on batch or stream;
    * streaming callers add `.withWatermark("ts", ...)` upstream. */
  def hourlyByType(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding windows: 1-hour span every 15 minutes (each event lands in 4
    * windows). Streaming-native like [[hourlyByType]]. */
  def slidingByType(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessions (30-min inactivity) per user: one row per session
    * with event count and duration in epoch millis (engine-portable
    * integers). `session_window` is the streaming-native operator — this
    * single stateful aggregation runs unchanged under `readStream`. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("ms", unix_millis(col("ts")))
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("ne"), (max(col("ms")) - min(col("ms"))).as("dur"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        col("ne"), col("dur"))

  /** Stream-stream interval join: each left-type event paired with every
    * right-type event by the same user within `(lts, lts + maxGap]`.
    * Batch and streaming run the SAME join; streaming callers add
    * `.withWatermark` on both inputs (state is then bounded by the gap +
    * watermark — the canonical Structured Streaming interval-join shape;
    * StreamingSpec proves stream==batch on it). Output is in portable
    * epoch millis. */
  def intervalJoin(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase", maxGapMin: Int = 60): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
    // the range condition stays on the event-time columns (not derived
    // epoch longs): that is what lets Structured Streaming bound the join
    // state to the gap + watermark instead of keeping both sides forever
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGapMin MINUTES"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_millis(col("r_ts")) - unix_millis(col("l_ts"))).as("gap_ms"))
  }

  /** LEFT OUTER interval join — attribution with the NON-converters
    * emitted: every click row appears, matched purchases (within the gap)
    * attach their ids and latency, unmatched clicks carry NULLs and
    * `converted = 0`. The outer arm is what funnel/attribution analyses
    * need and the inner join ([[intervalJoin]]) structurally drops.
    *
    * Streaming semantics worth pinning (StreamingSpec proves
    * stream==batch under replay): an unmatched click can only be declared
    * unmatched once its match window CLOSES — Structured Streaming emits
    * the NULL row when the watermark passes `l_ts + gap`, which is
    * exactly why the range condition stays on the event-time columns (so
    * the join state and the outer-emission deadline are both
    * watermark-bounded). */
  def intervalJoinOuter(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase", maxGapMin: Int = 60): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGapMin MINUTES"),
        "left_outer")
      .select(col("user_id"), col("l_id"), col("r_id"),
        when(col("r_id").isNotNull,
          unix_millis(col("r_ts")) - unix_millis(col("l_ts"))).as("gap_ms"),
        col("r_id").isNotNull.cast("int").as("converted"))
  }

  /** Stream-static enrichment join + aggregation: events joined to a
    * STATIC dimension (nation, keyed by user_id % 25) and rolled up per
    * nation. The canonical lookup-enrichment shape: the static side
    * broadcasts and each micro-batch joins against it with NO join state
    * at all (unlike stream-stream joins) — at 100 TB the dimension
    * refreshes by restarting the query, the stream never shuffles for
    * the join. The summed measure is integer cents so the result is
    * engine-portable and identical at any micro-batch slicing. */
  def enrichByNation(events: DataFrame, nation: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("value"), pmod(col("user_id"), lit(25)).as("nk"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("nk") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Per-user session statistics (batch rollup of [[sessions]]; a second
    * stateful aggregation, so streaming callers stop at [[sessions]]).
    * The averages are EXACT fixed-point integers (events ×10⁴, ms ×10²),
    * not round(avg(..)): sum/n in doubles can land exactly on a
    * representable .xx5 and the engines' tie rules then disagree — the
    * hostile fuzz corpus produced such a tie (2594.325 → 2594.32 vs
    * 2594.33). Integer division is the same number everywhere. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    sessions(events, gap).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("ne")).as("total_events"),
        sum(col("dur")).as("sum_dur"))
      .select(col("user_id"), col("n_sessions"), col("total_events"),
        expr("total_events * 10000 div n_sessions").as("avg_events_e4"),
        expr("sum_dur * 100 div n_sessions").as("avg_ms_e2"))
  }

  val queries: Seq[Q] = Seq(

    // ---- st01: tumbling-window aggregation -----------------------------
    Q("st01_window_hourly",
      (s, dir) => hourlyByType(Tables.load(s, dir, "events"))
        .orderBy(col("win_start"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events
             |GROUP BY date_trunc('hour', ts), event_type
             |ORDER BY win_start, event_type""".stripMargin)),

    // ---- st02: sessionization (session_window) -------------------------
    Q("st02_sessionize",
      (s, dir) => sessionStats(Tables.load(s, dir, "events"))
        .orderBy(col("user_id")),
      // boundary semantics: session_window intervals are HALF-OPEN
      // [ts, ts+gap), so a gap of EXACTLY the gap length starts a NEW
      // session — the oracle's break test is therefore >=, not >. (The
      // fixture never contains an exact 30-minute gap; the hostile fuzz
      // corpus produced one and caught the > form diverging.)
      // The running session-id sum uses a RANGE frame, NOT ROWS: when a
      // session-OPENING timestamp is duplicated (hostile resampling
      // produced exactly that at sf0.1), exactly one tied row carries
      // new_s=1 and a ROWS frame assigns its tie-PEERS to the previous
      // session in whatever order the engine traverses ties — inflating
      // that session's duration by the whole gap, nondeterministically.
      // RANGE includes all peers in the frame, so every tied row lands
      // in the NEW session — deterministic, and exactly session_window's
      // semantics (identical timestamps can never straddle a session
      // boundary).
      Some("""WITH x AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
             |o AS (SELECT user_id, ms,
             |        CASE WHEN lag(ms) OVER w IS NULL
             |               OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS new_s
             |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
             |s AS (SELECT user_id, ms,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
             |                         RANGE UNBOUNDED PRECEDING) AS sid
             |      FROM o),
             |g AS (SELECT user_id, sid, count(*) AS ne, max(ms) - min(ms) AS dur
             |      FROM s GROUP BY user_id, sid)
             |SELECT user_id, count(*) AS n_sessions,
             |  CAST(sum(ne) AS BIGINT) AS total_events,
             |  CAST(sum(ne) * 10000 // count(*) AS BIGINT) AS avg_events_e4,
             |  CAST(sum(dur) * 100 // count(*) AS BIGINT) AS avg_ms_e2
             |FROM g GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- st06: sliding windows (1h span / 15min slide) -----------------
    // Oracle: every event belongs to the 4 windows starting at its 15-min
    // bucket minus {0,1,2,3} slides. Spark's window() epoch alignment
    // (1970) and DuckDB's time_bucket origin differ by a whole number of
    // 15-min steps, so bucket boundaries coincide.
    Q("st06_window_sliding",
      (s, dir) => slidingByType(Tables.load(s, dir, "events"))
        .orderBy(col("win_start"), col("event_type")),
      Some("""SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
             |                - n * INTERVAL '15 minutes',
             |                '%Y-%m-%d %H:%M:%S') AS win_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events
             |CROSS JOIN (VALUES (0), (1), (2), (3)) AS shifts(n)
             |GROUP BY 1, event_type
             |ORDER BY win_start, event_type""".stripMargin)),

    // ---- st04: streaming dedup (exactly-once ingest semantics) ---------
    // The batch query doubles the input then deduplicates on event_id —
    // the oracle checks the end state equals the original stream. The
    // same dropDuplicates runs stateful under readStream (StreamingSpec);
    // with a watermark the dedup state is bounded to the watermark window.
    Q("st04_stream_dedup",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        dedupEvents(ev.unionAll(ev))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- st05: custom stateful operator (flatMapGroupsWithState) -------
    Q("st05_threshold_alert",
      (s, dir) => thresholdAlerts(Tables.load(s, dir, "events"), 500.0).toDF()
        .select(col("user_id"), col("event_id"), col("ms"),
          round(col("cum"), 2).as("cum"))
        .orderBy(col("user_id")),
      Some("""WITH x AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
             |            sum(value) OVER (PARTITION BY user_id
             |                             ORDER BY epoch_ms(ts), event_id) AS cum
             |           FROM events),
             |crossed AS (SELECT user_id, event_id, ms, cum,
             |              row_number() OVER (PARTITION BY user_id
             |                                 ORDER BY ms, event_id) AS rn
             |            FROM x WHERE cum >= 500.0)
             |SELECT user_id, event_id, ms, round(cum, 2) AS cum
             |FROM crossed WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),

    // ---- st10: ingest-disorder audit (watermark sizing) ----------------
    // The oracle replays the identical deterministic arrival permutation
    // (event time + bounded md5 ingest delay) and computes the same
    // per-user running-max disorder in integer micros.
    Q("st10_disorder_audit",
      (s, dir) => disorderAudit(Tables.load(s, dir, "events"))
        .orderBy(col("user_id")),
      Some(s"""WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us,
              |    epoch_us(ts)
              |      + (${graft.functions.PortableHash.baseHashSql("CAST(event_id AS VARCHAR)")}
              |         % 3600) * 1000000 AS arr
              |  FROM events),
              |w AS (SELECT user_id, us,
              |    max(us) OVER (PARTITION BY user_id ORDER BY arr, event_id
              |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
              |  FROM x),
              |d AS (SELECT user_id,
              |    CASE WHEN pm IS NULL OR pm < us THEN 0 ELSE pm - us END AS dis
              |  FROM w)
              |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              |  CAST(sum(CASE WHEN dis > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1m,
              |  CAST(sum(CASE WHEN dis > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_10m,
              |  CAST(sum(CASE WHEN dis > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_30m,
              |  CAST(max(dis) // 1000000 AS BIGINT) AS max_disorder_s
              |FROM d GROUP BY user_id
              |ORDER BY user_id""".stripMargin)),

    // ---- st03: as-of join (latest prior click per purchase) ------------
    Q("st03_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        graft.operators.AsOf.asofJoin(purchases, clicks, "user_id", "ts")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
            date_format(col("matched.ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
            round(col("value"), 2).as("value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
             |           WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
             |  round(p.value, 2) AS value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ---- st12: FORWARD as-of join with tolerance -----------------------
    // The merge_asof direction/tolerance surface: each click matched to
    // the EARLIEST purchase at-or-after it, nulled beyond a 60-minute
    // tolerance. The right side is pre-collapsed to one row per
    // (user, ts) so ties can't make the match nondeterministic. Oracle =
    // DuckDB's native ASOF LEFT JOIN with the <= direction plus the same
    // tolerance CASE.
    Q("st12_asof_forward",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("l_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(min(col("event_id")).as("r_id"))
        graft.operators.AsOf.asofJoin(clicks, purchases, "user_id", "ts",
            direction = "forward", toleranceMs = Some(3600000L))
          .select(col("user_id"), col("l_id"),
            col("matched.r_id").as("r_id"),
            (unix_millis(col("matched.ts")) - unix_millis(col("ts"))).as("gap_ms"))
          .orderBy(col("user_id"), col("l_id"))
      },
      Some("""WITH c AS (SELECT event_id AS l_id, user_id, ts FROM events
             |           WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts, min(event_id) AS r_id FROM events
             |      WHERE event_type = 'purchase' GROUP BY user_id, ts)
             |SELECT c.user_id, c.l_id,
             |  CASE WHEN epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
             |       THEN p.r_id END AS r_id,
             |  CASE WHEN epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
             |       THEN epoch_ms(p.ts) - epoch_ms(c.ts) END AS gap_ms
             |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
             |ORDER BY c.user_id, c.l_id""".stripMargin)),

    // ---- st08: strict-sequence funnel (view -> click -> purchase) ------
    // Per user: earliest view, earliest click strictly after it, earliest
    // purchase strictly after that; stage flags + completion latency.
    // One pass of conditional aggregation per stage — no self-joins, so
    // at 100 TB it is three map-side-combined aggs on the same user key
    // (one shuffle, reused partitioning).
    Q("st08_funnel",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ms")).as("t1"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ms") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("t1")).as("t1"), min(col("ms")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ms") > col("t2"))
          .groupBy(col("user_id"))
          .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("ms")).as("t3"))
        v.join(c.select(col("user_id"), col("t2")), Seq("user_id"), "left")
          .join(p.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .select(col("user_id"),
            lit(1).as("viewed"),
            col("t2").isNotNull.cast("int").as("clicked"),
            col("t3").isNotNull.cast("int").as("purchased"),
            coalesce(col("t3") - col("t1"), lit(-1L)).as("funnel_ms"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
             |v AS (SELECT user_id, min(ms) AS t1 FROM e
             |      WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(v.t1) AS t1, min(e.ms) AS t2
             |      FROM e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ms > v.t1
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(c.t1) AS t1, min(c.t2) AS t2, min(e.ms) AS t3
             |      FROM e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ms > c.t2
             |      GROUP BY e.user_id)
             |SELECT v.user_id, 1 AS viewed,
             |  CAST(c.user_id IS NOT NULL AS INT) AS clicked,
             |  CAST(p.user_id IS NOT NULL AS INT) AS purchased,
             |  coalesce(p.t3 - v.t1, -1) AS funnel_ms
             |FROM v
             |LEFT JOIN c ON v.user_id = c.user_id
             |LEFT JOIN p ON v.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // ---- st07: stream-stream interval join (click -> purchase <= 1h) ---
    Q("st07_interval_join",
      (s, dir) => intervalJoin(Tables.load(s, dir, "events"))
        .orderBy(col("user_id"), col("l_id"), col("r_id")),
      Some("""WITH l AS (SELECT user_id, event_id AS l_id, ts AS l_ts
             |           FROM events WHERE event_type = 'click'),
             |r AS (SELECT user_id AS r_user, event_id AS r_id, ts AS r_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT user_id, l_id, r_id,
             |  epoch_ms(r_ts) - epoch_ms(l_ts) AS gap_ms
             |FROM l JOIN r ON user_id = r_user
             |  AND r_ts > l_ts AND r_ts <= l_ts + INTERVAL 60 MINUTES
             |ORDER BY user_id, l_id, r_id""".stripMargin)),

    // ---- st11: LEFT OUTER interval join (attribution) ------------------
    Q("st11_attribution",
      (s, dir) => intervalJoinOuter(Tables.load(s, dir, "events"))
        .orderBy(col("user_id"), col("l_id"), col("r_id")),
      Some("""WITH l AS (SELECT user_id, event_id AS l_id, ts AS l_ts
             |           FROM events WHERE event_type = 'click'),
             |r AS (SELECT user_id AS r_user, event_id AS r_id, ts AS r_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT user_id, l_id, r_id,
             |  CASE WHEN r_id IS NOT NULL
             |       THEN epoch_ms(r_ts) - epoch_ms(l_ts) END AS gap_ms,
             |  CASE WHEN r_id IS NOT NULL THEN 1 ELSE 0 END AS converted
             |FROM l LEFT JOIN r ON user_id = r_user
             |  AND r_ts > l_ts AND r_ts <= l_ts + INTERVAL 60 MINUTES
             |ORDER BY user_id, l_id, r_id""".stripMargin)),

    // ---- st09: stream-static enrichment join ---------------------------
    Q("st09_enrich_static",
      (s, dir) => enrichByNation(Tables.load(s, dir, "events"),
          Tables.load(s, dir, "nation"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events JOIN nation ON user_id % 25 = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ---- st13: streaming sketch maintenance (HLL register fold) --------
    // The incremental-pipeline bridge for the mergeable-sketch family: the
    // 512-row HLL register table (p08/p12's persisted artifact) maintained
    // LIVE over the event stream — max(rho) per bucket is a streaming-
    // supported complete-mode aggregation, so the same operator runs
    // unchanged under readStream (StreamingSpec proves streamed registers
    // == batch registers; the registered query gates the batch form
    // against a pure integer-SQL register rebuild). At 100 TB the stream
    // version replaces the daily fold: distinct-user reach is one 512-row
    // table away at any moment, never a rescan.
    Q("st13_sketch_registers",
      (s, dir) => graft.operators.Profile.hllRegisters(
          Tables.load(s, dir, "events"), col("user_id"))
        .orderBy(col("bucket")),
      Some(s"""WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
              |h AS (SELECT ${graft.functions.PortableHash.baseHashSql("k")} AS h FROM k),
              |b AS (SELECT CAST(h >> 23 AS INT) AS bucket, h & 8388607 AS r FROM h),
              |rr AS (SELECT bucket,
              |    CASE WHEN r = 0 THEN 24
              |         ELSE 24 - length(format('{:b}', r)) END AS rho
              |  FROM b)
              |SELECT bucket, CAST(max(rho) AS INTEGER) AS m
              |FROM rr GROUP BY bucket ORDER BY bucket""".stripMargin)),
  )
}
