package graft

import graft.model._
import graft.streaming.StreamingDetectors
import org.apache.spark.sql.functions._

/** Pins the r14 pruned-schema ingest ([[StreamingDetectors.narrowParse]])
  * to the full-map form it replaces: on an adversarial JSON corpus
  * (string-coded numbers, missing/null/garbage fields, nested objects,
  * extra unreferenced fields, malformed rows, non-object JSON, empty
  * objects, numeric keys) the two parses produce the SAME wire rows, and
  * the end-to-end pipelines built on them produce byte-identical alert
  * JSON. */
class NarrowParseSpec extends SparkSpec {
  import spark.implicits._

  private val rules: Seq[DetectionRule] = Seq(
    ThresholdRule("thr", "value", 50.0),
    RateRule("rate", "user_id", 30, 2.0),
    StatisticalRule("stat", "aux", 4, 1.5))

  /** Adversarial corpus: every event-id is distinct and increasing so
    * intra-batch order is deterministic; all rows carry an explicit
    * integer `ts` except the marked clock-fallback rows. */
  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(1414)
    val shaped = (0 until 120).map { i =>
      val ts = 1000L + i * 3L
      rnd.nextInt(12) match {
        case 0 => s"""{"user_id":"u${i % 5}","event_id":$i,"ts":$ts,"value":${rnd.nextInt(100)},"aux":${rnd.nextInt(40) / 4.0}}"""
        case 1 => s"""{"user_id":"u${i % 5}","event_id":$i,"ts":$ts,"value":"${rnd.nextInt(100)}","aux":"${rnd.nextInt(10)}.25"}""" // string-coded numbers
        case 2 => s"""{"user_id":${i % 5},"event_id":$i,"ts":$ts,"value":${rnd.nextInt(100)}}""" // numeric key, aux missing
        case 3 => s"""{"event_id":$i,"ts":$ts,"value":${rnd.nextInt(100)},"aux":null}""" // key missing, aux null
        case 4 => s"""{"user_id":"u${i % 5}","event_id":$i,"ts":$ts,"value":"garbage","aux":{"nested":1}}""" // uncastable values
        case 5 => s"""{"user_id":"u${i % 5}","event_id":$i,"ts":$ts,"aux":${rnd.nextInt(10)},"extra1":"x","extra2":[1,2,3],"extra3":{"deep":{"er":true}}}""" // extra fields
        case 6 => s"""{"user_id":"u${i % 5}","event_id":"$i","ts":"$ts","value":${rnd.nextInt(100)}}""" // string event_id/ts
        case 7 => s"""{"user_id":"u${i % 5}","event_id":$i,"ts":$ts,"value":true,"aux":1e1}""" // boolean / exponent literals
        // duplicate-key rows are deliberately NOT in the parity corpus:
        // the parses DIVERGE there by design (struct keeps the LAST
        // occurrence = the reference's Jackson-Map semantics; the map
        // form's getItem surfaces the FIRST) — pinned by the dedicated
        // duplicate-key test below
        case 8 => "this is not json at all {"
        case 9 => Seq("[1,2,3]", "123", "null", "\"str\"")(rnd.nextInt(4))
        // keep the clock deterministic: every VALID row carries ts (the
        // wall-clock fallback rows are covered by the dedicated test,
        // whose assertions don't compare tsSec across evaluation times)
        // object with no key and no measures (carries event_id so the
        // batch arrival sort and the chunked stream agree on intra-key
        // order — a duplicate-id row would be hoisted by the batch-wide
        // sort but is pinned to its micro-batch in the stream)
        case 10 => s"""{"event_id":$i,"ts":$ts}"""
        case _ => s"""{"user_id":"u${i % 5}","event_id":$i,"ts":$ts,"value":${rnd.nextInt(100) / 3.0},"aux":${-rnd.nextInt(20)}}"""
      }
    }
    shaped
  }

  test("narrowParse == map parse -> narrowEvents on the wire columns") {
    val c = new StreamingDetectors.CompiledRules(rules.toIndexedSeq)
    val raw = corpus.toDF("value")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select(col("key"), col("eventId"), col("tsSec"), col("vals"),
        col("present"), col("original"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Double](3).map(d => if (d.isNaN) "NaN" else d.toString),
        r.getSeq[Boolean](4), r.getString(5)).toString)
      .sorted.toSeq
    val narrow = rows(StreamingDetectors.narrowParse(raw, c, "user_id"))
    val mapped = rows(StreamingDetectors.narrowEvents(
      StreamingDetectors.parsedEvents(raw, rules, "user_id").toDF(), c))
    assert(narrow.nonEmpty && narrow == mapped)
    // the malformed population really was dropped, not zero-parsed
    assert(narrow.size < corpus.size)
  }

  test("clock-fallback rows (no ts) survive both parses with equal keys") {
    val c = new StreamingDetectors.CompiledRules(rules.toIndexedSeq)
    val raw = Seq(
      """{"user_id":"a","event_id":1,"value":60}""",
      """{"user_id":"b","event_id":2}""",
      """{"user_id":"c","event_id":3.5,"value":1}""", // float id -> 0
      "{}",
      "not json").toDF("value")
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "eventId").as[(String, Long)].collect().sorted.toSeq
    val n = StreamingDetectors.narrowParse(raw, c, "user_id")
    assert(keys(n) ==
      Seq(("__unknown__", 0L), ("a", 1L), ("b", 2L), ("c", 0L)))
    assert(keys(n) == keys(StreamingDetectors.narrowEvents(
      StreamingDetectors.parsedEvents(raw, rules, "user_id").toDF(), c)))
    // ingestion clock engaged: tsSec is a real recent timestamp
    assert(n.select(min("tsSec")).as[Long].head() > 1700000000L)
  }

  test("duplicate JSON keys: struct parse keeps LAST (reference), map getItem keeps FIRST") {
    val c = new StreamingDetectors.CompiledRules(rules.toIndexedSeq)
    val raw = Seq(
      """{"user_id":"d","event_id":1,"ts":10,"value":1,"value":2}""")
      .toDF("value")
    val narrow = StreamingDetectors.narrowParse(raw, c, "user_id")
      .select("vals").collect().head.getSeq[Double](0)
    val mapped = StreamingDetectors.narrowEvents(
        StreamingDetectors.parsedEvents(raw, rules, "user_id").toDF(), c)
      .select("vals").collect().head.getSeq[Double](0)
    assert(narrow.head == 2.0, "struct parse must keep the last occurrence")
    assert(mapped.head == 1.0, "map getItem surfaces the first occurrence")
  }

  test("jsonPipelineTws (pruned parse, streamed) == jsonPipeline (map parse, batch) byte-for-byte") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val lines = corpus
      val ref = StreamingDetectors.jsonPipeline(lines.toDF("value"), rules,
        "user_id").as[String].collect().sorted.toSeq
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[String]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-npx").toString
      val q = StreamingDetectors.jsonPipelineTws(ms.toDS().toDF("value"),
          rules, "user_id")
        .writeStream.format("memory").queryName("np_tws")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      val got =
        try {
          lines.grouped(17).foreach { g => ms.addData(g); q.processAllAvailable() }
          spark.table("np_tws").as[String].collect().sorted.toSeq
        } finally q.stop()
      assert(ref.nonEmpty && got == ref,
        s"\nonly-got: ${(got.toSet -- ref.toSet).take(3)}\n" +
          s"only-ref: ${(ref.toSet -- got.toSet).take(3)}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("jsonPipelineFused == staged throttled(alertsTws(map parse)) on a storm replay") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      // alert storm: hot keys fire every event, so the throttle state is
      // exercised on nearly every row
      val lines = (0 until 200).map { i =>
        s"""{"user_id":"h${i % 3}","event_id":$i,"ts":${1000 + i * 5},"value":${60 + i % 40},"aux":${i % 7}}"""
      }
      implicit val sqlCtx = spark.sqlContext
      def run(tag: String, mk: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame): Seq[String] = {
        val ms = MemoryStream[String]
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-npf$tag").toString
        val q = mk(ms.toDS().toDF("value"))
          .writeStream.format("memory").queryName(s"np_f$tag")
          .outputMode("append").option("checkpointLocation", ckpt).start()
        try {
          lines.grouped(23).foreach { g => ms.addData(g); q.processAllAvailable() }
          spark.table(s"np_f$tag").as[String].collect().sorted.toSeq
        } finally q.stop()
      }
      val fused = run("a", df =>
        StreamingDetectors.jsonPipelineFused(df, rules, "user_id", 60L))
      val staged = run("b", df => graft.sources.EventJson.serializeAlerts(
        graft.streaming.StreamingThrottle.throttled(
          StreamingDetectors.alertsTws(
            StreamingDetectors.parsedEvents(df, rules, "user_id"),
            rules), 60L).toDF()))
      assert(fused.nonEmpty && fused == staged)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
