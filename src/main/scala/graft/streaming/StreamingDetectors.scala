package graft.streaming

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Event shape for the stateful streaming path: the key is already
  * string-coerced (missing -> "__unknown__", matching
  * StreamSentinelJob.java:121-124), `tsSec` is the detector clock in epoch
  * seconds (the reference uses ingestion time — EventDeserializationSchema
  * .java:36; tests substitute event time exactly like the reference's own
  * unit tests do), `eventId` is the arrival sequence used for
  * deterministic intra-batch ordering. */
final case class SEvent(key: String, eventId: Long, tsSec: Long,
    fields: Map[String, Double] = Map.empty, original: String = "{}")

object SEvent {
  /** Single-measure convenience (tests/tools): the measure lands under the
    * field name "value". Rules that read other fields use the map form —
    * the reference's detectors each pull their OWN field from the event
    * map (ThresholdDetector.java:52, StatisticalOutlierDetector.java:83),
    * so a faithful stream event carries every rule-referenced measure,
    * not one anointed value. */
  def apply(key: String, eventId: Long, tsSec: Long,
      value: Option[Double]): SEvent =
    SEvent(key, eventId, tsSec, value.map("value" -> _).toMap)
}

/** Alert shape mirroring Alert.java:31-43 — `original_event` is the full
  * source event inline as a JSON string (the reference embeds the event
  * map in every alert, defensive copy at Alert.java:114), so an alerts
  * consumer never needs a join back to the event stream. */
final case class SAlert(rule_name: String, key: String, ts_sec: Long,
    event_id: Long, value: Double, details: String, original_event: String)

/** Per-key detector state: one timestamp deque per rate rule and one value
  * deque per statistical rule (the Spark analog of the reference's
  * `ValueState<List<AnomalyDetector>>`, AnomalyProcessFunction.java:87-90,
  * holding just the data, not the detector objects). */
final case class DetState(rate: Map[String, Seq[Long]],
    stat: Map[String, Seq[Double]])

/** Structured Streaming formulation of the engine: exact per-event
  * trailing-window semantics via `flatMapGroupsWithState`, reproducing the
  * reference's `KeyedProcessFunction` behavior
  * (AnomalyProcessFunction.java:106-143):
  *  - every event is evaluated by every rule, in rule-config order;
  *  - rate: evict timestamps < t - windowSeconds from the deque HEAD
  *    (the reference's pop-while loop — head-only, amortized O(1)),
  *    append, fire on count > threshold (strict;
  *    RateSpikeDetector.java:85-94);
  *  - statistical: evaluate against the previous <=windowSize values
  *    (check-before-insert), population sigma, >=2 history, sigma==0
  *    fires on any deviation (StatisticalOutlierDetector.java:92-127);
  *  - threshold: stateless strict > (ThresholdDetector.java:59).
  *
  * Scale posture: state per key is bounded (windowSeconds of timestamps +
  * windowSize doubles per rule); keys are hash-partitioned by the
  * groupByKey exchange; an optional processing-time TTL evicts idle keys —
  * an improvement over the reference, whose keyed state grows without
  * bound (no TTL anywhere in it).
  */
object StreamingDetectors {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(StreamingDetectors.getClass)

  /** Default per-rule error handler: log and move on — the reference's
    * exact containment (AnomalyProcessFunction.java:130-134: "Detector
    * [{}] threw an exception – continuing with next detector"). */
  private def logRuleError(ruleName: String, t: Throwable): Unit =
    log.error(s"Detector [$ruleName] threw an exception - " +
      "continuing with next detector", t)

  /** Per-rule containment: run `body` (one rule's evaluation against one
    * event), swallowing NonFatal failures through `onError` so the other
    * rules still run — fatal JVM errors and interrupts propagate. The
    * typed [[SEvent]] makes the three built-in rule arms total (field
    * coercion happened at ingest via try_cast), so this is defensive
    * parity with the reference's catch, kept for the day a rule arm gains
    * a genuinely partial operation. On failure the failing rule's state
    * update is skipped too — its deque stays at the pre-event value,
    * exactly like the reference, whose detector mutates state only on a
    * successful evaluate(). */
  private[graft] def guarded[A](ruleName: String,
      onError: (String, Throwable) => Unit)(body: => A): Option[A] =
    try Some(body)
    catch { case scala.util.control.NonFatal(t) => onError(ruleName, t); None }

  /** Pure per-event state transition — shared by the streaming operator
    * and directly unit-testable. Returns (alerts, newState). Each rule
    * evaluates under [[guarded]]. */
  def processEvent(rules: Seq[DetectionRule], e: SEvent, st: DetState,
      onRuleError: (String, Throwable) => Unit = logRuleError)
      : (Seq[SAlert], DetState) = {
    var rate = st.rate
    var stat = st.stat
    val out = Seq.newBuilder[SAlert]
    rules.foreach { rule =>
      // transactional per rule: a failing rule contributes no alerts AND
      // no state mutation for this event (rolled back below); the other
      // rules' updates stand
      val rate0 = rate
      val stat0 = stat
      val alerts = Seq.newBuilder[SAlert]
      guarded(rule.name, onRuleError) { rule match {
      case r: ThresholdRule =>
        e.fields.get(r.field).foreach { v =>
          if (v > r.threshold) alerts += SAlert(r.name, e.key, e.tsSec,
            e.eventId, v,
            f"Threshold exceeded: ${r.field}%s=$v%.2f (threshold: ${r.threshold}%.2f)",
            e.original)
        }
      case r: RateRule =>
        val windowStart = e.tsSec - r.windowSeconds
        // Head-only eviction — EXACTLY the reference's deque loop
        // (RateSpikeDetector.java:85-87: pop while head < windowStart)
        // and amortized O(1) per event. NOTE: head-only is equivalent to
        // full eviction only when per-key ts is nondecreasing (the
        // reference's ingestion clock guarantees it; jsonPipeline's
        // event-time clock does not) — an out-of-order ts leaves expired
        // entries mid-deque and inflates later counts, identically in the
        // reference and here; pinned by DequeDifferentialSpec's
        // out-of-order differential. The previous filter(...) scanned
        // the whole deque per event, quadratic on a hot key whose window
        // never evicts: StateScaleBench's hot phase measured 273 s for
        // one 125k-event key vs ~2 s uniform. Vector keeps append and
        // size O(1); state deserialized as another Seq converts once per
        // batch, not per event.
        val prior = rate.getOrElse(r.name, Vector.empty[Long])
        val pv = prior match {
          case v: Vector[Long] => v
          case s => s.toVector
        }
        // count expired head entries, then ONE structural drop: Vector's
        // drop is O(log n) where the generic dropWhile (and the old
        // filter) rebuilds the whole vector per event — the difference
        // between O(1) amortized and quadratic on a non-evicting hot key
        var k = 0
        while (k < pv.length && pv(k) < windowStart) k += 1
        val kept = (if (k == 0) pv else pv.drop(k)) :+ e.tsSec
        rate = rate.updated(r.name, kept)
        if (kept.size > r.threshold) alerts += SAlert(r.name, e.key, e.tsSec,
          e.eventId, kept.size.toDouble,
          f"Rate spike: ${kept.size}%d events in ${r.windowSeconds}%d seconds (threshold: ${r.threshold}%.0f)",
          e.original)
      case r: StatisticalRule =>
        e.fields.get(r.field).foreach { v =>
          val window = stat.getOrElse(r.name, Nil)
          if (window.size >= 2) { // MIN_HISTORY_SIZE (:45)
            // Exact integer-space moments over the quantized history —
            // operation-for-operation the same sequence as the batch
            // window formulation (Detectors.statisticalAlerts) so the two
            // paths agree bit-for-bit on ANY input, not just 2-decimal
            // domains (quantScale contract, Rules.scala).
            val sf = math.pow(10, r.quantScale)
            val cs = window.map(x => math.floor(x * sf + 0.5).toLong)
            val n = cs.size
            val s1 = cs.sum
            val s2 = cs.map(c => c * c).sum
            val mean = s1.toDouble / n / sf
            val dd = (n * s2 - s1 * s1).toDouble
            val sigma = math.sqrt(dd) / n / sf // population sigma (:149-156)
            val dev = math.abs(v - mean)
            val fires = if (dd == 0.0) dev > 0.0
              else dev > r.deviationFactor * sigma
            if (fires) alerts += SAlert(r.name, e.key, e.tsSec, e.eventId, v,
              f"Statistical outlier: ${r.field}%s=$v%.2f (mean=$mean%.2f, stddev=$sigma%.2f, factor=${r.deviationFactor}%.1f)",
              e.original)
          }
          // insert AFTER the check (StatisticalOutlierDetector.java:124-127)
          val appended = window :+ v
          stat = stat.updated(r.name,
            if (appended.size > r.windowSize) appended.drop(appended.size - r.windowSize)
            else appended)
        }
      } } match {
        case Some(_) => out ++= alerts.result()
        case None => rate = rate0; stat = stat0
      }
    }
    (out.result(), DetState(rate, stat))
  }

  /** The stateful streaming operator. `idleTtl` (processing-time) evicts
    * state for keys silent longer than the TTL; None = unbounded state
    * like the reference.
    *
    * NOTE: with a TTL the query MUST run with a non-zero processing-time
    * trigger (e.g. `.trigger(Trigger.ProcessingTime("10 seconds"))`).
    * Under the default zero-interval trigger, registered timeouts make
    * Spark schedule empty micro-batches back-to-back to re-evaluate them —
    * a busy loop that also never lets `processAllAvailable` settle. */
  def alerts(events: Dataset[SEvent], rules: Seq[DetectionRule],
      idleTtl: Option[java.time.Duration] = None): Dataset[SAlert] = {
    import events.sparkSession.implicits._
    val timeout =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DetState, SAlert](OutputMode.Append(), timeout) {
        (key: String, it: Iterator[SEvent], state: GroupState[DetState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(DetState(Map.empty, Map.empty))
            // deterministic arrival order inside the micro-batch
            val out = it.toSeq.sortBy(e => (e.eventId, e.tsSec, e.original)).flatMap { e =>
              val (alerts, next) = processEvent(rules, e, st)
              st = next
              alerts
            }
            state.update(st)
            idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.iterator
          }
      }
  }

  /** Spark 4 `transformWithState` formulation of the same operator — the
    * successor API to `flatMapGroupsWithState` (typed per-state TTL,
    * timers, RocksDB-backed state). Semantics are IDENTICAL by
    * construction: both paths drive [[processEvent]], the same pure
    * per-event transition the reference's processElement performs
    * (AnomalyProcessFunction.java:106-143).
    *
    * `ttl` evicts idle-key state in the state store itself (no per-key
    * timers), but a TTL query still schedules a micro-batch EVERY
    * trigger to advance its processing-time clock — so (a) give it a
    * non-zero `Trigger.ProcessingTime` or the empty batches run
    * back-to-back, and (b) `processAllAvailable` NEVER settles on it
    * (each trigger is a new batch; the no-new-data condition is never
    * reached — observed on Spark 4.1, tools/StateScaleBench): tests and
    * drains must poll the sink / `lastProgress` instead.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — transformWithState does not
    * run on the default HDFS-backed store. */
  def alertsTws(events: Dataset[SEvent], rules: Seq[DetectionRule],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[SAlert] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.key)
      .transformWithState(new DetectorProcessor(rules, ttl), timeMode,
        OutputMode.Append())
  }

  /** Adapter: the fixture `events` DataFrame (from
    * [[graft.sources.Tables.events]] or a streaming source with the same
    * columns) -> typed [[SEvent]] stream keyed like the batch operators. */
  /** The per-key processor behind [[alertsTws]]: one ValueState slot
    * holding the same [[DetState]] the flatMapGroupsWithState path keeps
    * (the Spark-4 analog of the reference's
    * `ValueState<List<AnomalyDetector>>`, AnomalyProcessFunction.java:
    * 87-90 — data only, no detector objects). */
  final class DetectorProcessor(rules: Seq[DetectionRule], ttl: TTLConfig)
      extends StatefulProcessor[String, SEvent, SAlert] {

    @transient private var state: ValueState[DetState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DetState]("detectors",
        Encoders.product[DetState], ttl)

    override def handleInputRows(key: String, rows: Iterator[SEvent],
        timerValues: TimerValues): Iterator[SAlert] = {
      var st = Option(state.get()).getOrElse(DetState(Map.empty, Map.empty))
      // deterministic arrival order inside the micro-batch (same contract
      // as the flatMapGroupsWithState path)
      val out = rows.toSeq.sortBy(e => (e.eventId, e.tsSec, e.original)).flatMap { e =>
        val (alerts, next) = processEvent(rules, e, st)
        st = next
        alerts
      }
      state.update(st)
      out.iterator
    }
  }

  /** [[SEvent]] plus the event-time column the watermark tracks (epoch
    * seconds `tsSec` as a timestamp) — input shape of the event-time
    * mode. */
  final case class SEventT(key: String, eventId: Long, tsSec: Long,
      fields: Map[String, Double], original: String, ets: java.sql.Timestamp)

  /** EVENT-TIME detection mode — a documented improvement over the
    * reference, which declares a watermark strategy and then never uses
    * it (StreamSentinelJob.java:116-117: `forMonotonousTimestamps` with
    * a no-op timestamp assigner; every detector runs on arrival order).
    * Here the `ts`-driven mode buffers events per key and only processes
    * them once the watermark passes, in (tsSec, eventId) order — so a
    * stream with bounded disorder (≤ `maxDisorder`) produces EXACTLY the
    * alerts of the batch formulation, which is by definition event-time
    * ordered. Arrival-order mode ([[alerts]]/[[alertsTws]]) stays the
    * reference-faithful default.
    *
    * Mechanics (`transformWithState`, `TimeMode.EventTime`):
    *  - `handleInputRows` only appends to a per-key ListState buffer and
    *    arms an event-time timer just past the current watermark;
    *  - `handleExpiredTimer` drains buffered events with
    *    `tsSec*1000 < watermark` (strict: a row AT the watermark can
    *    still legally arrive, Spark's late filter admits `>=`), sorted by
    *    (tsSec, eventId, original), through the same [[processEvent]]
    *    transition, and re-arms while anything stays buffered. Each drain
    *    is wholly later in event time than the last (late rows below the
    *    previous watermark were filtered), so per-key processing order is
    *    globally event-time sorted — the batch order.
    *
    * State per key is O(events inside the disorder window) + the
    * detector deques — bounded by the watermark delay, evicted as it
    * advances. Requires the RocksDB state store provider like
    * [[alertsTws]]. */
  def alertsEventTime(events: Dataset[SEvent], rules: Seq[DetectionRule],
      maxDisorder: java.time.Duration): Dataset[SAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withColumn("ets", timestamp_seconds(col("tsSec")))
      .withWatermark("ets", s"${maxDisorder.getSeconds} seconds")
      .as[SEventT]
      .groupByKey(_.key)
      .transformWithState(new EventTimeDetectorProcessor(rules),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final class EventTimeDetectorProcessor(rules: Seq[DetectionRule])
      extends StatefulProcessor[String, SEventT, SAlert] {

    @transient private var buf: ListState[SEvent] = _
    @transient private var det: ValueState[DetState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[SEvent]("buf",
        Encoders.product[SEvent], TTLConfig.NONE)
      det = getHandle.getValueState[DetState]("detectors",
        Encoders.product[DetState], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[SEventT],
        timerValues: TimerValues): Iterator[SAlert] = {
      rows.foreach(e =>
        buf.appendValue(SEvent(e.key, e.eventId, e.tsSec, e.fields, e.original)))
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1L)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SAlert] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val (ready, rest) = buf.get().toSeq.partition(_.tsSec * 1000L < wm)
      if (rest.nonEmpty) getHandle.registerTimer(wm + 1L)
      if (ready.isEmpty) Iterator.empty
      else {
        var st = Option(det.get()).getOrElse(DetState(Map.empty, Map.empty))
        val out = ready.sortBy(e => (e.tsSec, e.eventId, e.original)).flatMap { e =>
          val (alerts, next) = processEvent(rules, e, st)
          st = next
          alerts
        }
        det.update(st)
        buf.clear()
        if (rest.nonEmpty) buf.put(rest.toArray)
        out.iterator
      }
    }
  }

  /** Rules-aware variant — carries exactly the fields the rule set
    * measures, so a rule over any field fires. Prefer this over the
    * fieldNames form: the Seq("value") default there silently drops
    * measures for rules reading other fields. */
  def toSEventsFor(df: DataFrame, rules: Seq[DetectionRule],
      keyField: String = "user_id"): Dataset[SEvent] =
    toSEvents(df, keyField, measuredFields(rules))

  def toSEvents(df: DataFrame, keyField: String = "user_id",
      fieldNames: Seq[String] = Seq("value")): Dataset[SEvent] = {
    import df.sparkSession.implicits._
    // one map entry per rule-referenced field; try_cast = the reference's
    // Number-or-parseable-string coercion, and map_filter drops the
    // missing/garbage ones (= Optional.empty skip semantics)
    val entries = fieldNames.flatMap { f =>
      Seq(lit(f), expr(s"try_cast(`${f.replace("`", "``")}` AS DOUBLE)"))
    }
    df.select(
        coalesce(col(keyField).cast("string"), lit("__unknown__")).as("key"),
        col("event_id").cast("long").as("eventId"),
        col("ts_sec").cast("long").as("tsSec"),
        (if (entries.isEmpty) map().cast("map<string,double>")
         else map_filter(map(entries: _*), (_, v) => v.isNotNull)).as("fields"),
        graft.operators.Detectors.originalEvent(df.columns.toSeq).as("original"))
      .as[SEvent]
  }

  /** The fields a rule set actually measures (rate rules count, they don't
    * read a measure). */
  def measuredFields(rules: Seq[DetectionRule]): Seq[String] =
    rules.collect {
      case t: ThresholdRule => t.field
      case s: StatisticalRule => s.field
    }.distinct

  /** The reference's full EP1 topology as one composable streaming (or
    * batch — the plan is identical) transform, mirroring
    * StreamSentinelJob.buildPipeline (StreamSentinelJob.java:102-140):
    *
    *   raw JSON lines -> deserialize (null on malformed) -> null filter ->
    *   keyBy(keyField, missing -> "__unknown__") -> stateful multi-rule
    *   process -> JSON alert serialization (ISO-8601 free: the alert
    *   carries the integer ts_sec clock plus the full original event).
    *
    * Works on any DataFrame with a raw-JSON string column — a file/socket
    * stream, a MemoryStream[String], or a Kafka `value` column once a
    * kafka connector jar is on the classpath (SURVEY §2 op 1).
    * `original_event` is the raw JSON itself — byte-for-byte the event
    * that fired, the strongest form of the reference's inline
    * originalEvent copy (Alert.java:31-43).
    *
    * Clock (`ingestionClock = false`, default): the event's own numeric
    * `ts` field when present (the deterministic-test substitution the
    * reference's own unit tests use), else the ingestion timestamp —
    * EventDeserializationSchema.java:36. Unlike the reference's
    * always-ingestion clock, the event-time path admits per-key ts
    * REGRESSIONS; the rate deque's head-only eviction then leaves expired
    * entries mid-deque and can over-count (possible spurious rate
    * alerts) — the same thing the reference's own loop would do on a
    * non-monotone clock. Pinned, with a deterministic witness, by
    * DequeDifferentialSpec's out-of-order differential.
    *
    * `ingestionClock = true` stamps `ingest_ts` for EVERY event (the
    * reference's exact clock, EventDeserializationSchema.java:36) —
    * per-key nondecreasing by construction, so head-only eviction is
    * exact and the over-count space above is unreachable. Choose it when
    * strict reference-clock parity matters more than deterministic
    * replay. */
  /** The ingest half of [[jsonPipeline]]: raw JSON → typed [[SEvent]]s
    * (parse, null filter, key coercion, measured-field projection) —
    * exposed so callers can choose the detector formulation behind it
    * (`alerts` / [[alertsTws]]) and what sink-side serialization to
    * append (the throughput bench drives the full topology through the
    * RocksDB-backed transformWithState operator). */
  def parsedEvents(raw: DataFrame, rules: Seq[DetectionRule],
      keyField: String, rawCol: String = "value",
      ingestionClock: Boolean = false): Dataset[SEvent] = {
    import raw.sparkSession.implicits._
    val parsed = graft.sources.EventJson.parsed(raw, rawCol)
    val fieldEntries = measuredFields(rules).flatMap { f =>
      Seq(lit(f), col("fields").getItem(f).try_cast("double"))
    }
    val clock =
      if (ingestionClock) unix_timestamp(col("ingest_ts"))
      else coalesce(col("fields").getItem("ts").try_cast("long"),
        unix_timestamp(col("ingest_ts")))
    parsed.select(
        coalesce(col("fields").getItem(keyField), lit("__unknown__")).as("key"),
        coalesce(col("fields").getItem("event_id").try_cast("long"), lit(0L))
          .as("eventId"),
        clock.as("tsSec"),
        (if (fieldEntries.isEmpty) map().cast("map<string,double>")
         else map_filter(map(fieldEntries: _*), (_, v) => v.isNotNull))
          .as("fields"),
        col(rawCol).cast("string").as("original"))
      .as[SEvent]
  }

  def jsonPipeline(raw: DataFrame, rules: Seq[DetectionRule],
      keyField: String, rawCol: String = "value",
      ingestionClock: Boolean = false): DataFrame = {
    val sev = parsedEvents(raw, rules, keyField, rawCol, ingestionClock)
    graft.sources.EventJson.serializeAlerts(alerts(sev, rules).toDF())
  }
}
