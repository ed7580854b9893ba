package graft

import graft.streaming.StreamingJoins
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class SImp(ad_id: Long, imp_ts: Timestamp, campaign: String)
case class SClick(click_ad_id: Long, click_ts: Timestamp, click_id: Long)

/** Stream-stream interval join: clicks attribute to the impression at
  * most 30 s before them; the watermark + interval bound is what keeps
  * both sides' join state finite. */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("clicks join impressions within the attribution window only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[SImp]
    val clicks = MemoryStream[SClick]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    val out = StreamingJoins.clickAttribution(imps.toDF(), clicks.toDF())
      .select("ad_id", "click_id", "campaign")
    val q = out.writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      imps.addData(
        SImp(1L, ts(100), "c1"),
        SImp(2L, ts(100), "c2"),
        SImp(1L, ts(500), "c1b"))
      clicks.addData(
        SClick(1L, ts(110), 1000L), // within 30 s of imp@100 -> joins c1
        SClick(1L, ts(140), 1001L), // 40 s after imp@100 -> NO match
        SClick(2L, ts(99), 1002L),  // before the impression -> NO match
        SClick(1L, ts(520), 1003L)) // joins the second ad_id=1 imp (c1b)
      q.processAllAvailable()
      val got = spark.table("attrib_out").as[(Long, Long, String)]
        .collect().toSet
      assert(got == Set((1L, 1000L, "c1"), (1L, 1003L, "c1b")))
    } finally q.stop()
  }

  test("the join plan carries watermarks on both sides (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[SImp]
    val clicks = MemoryStream[SClick]
    val plan = StreamingJoins.clickAttribution(imps.toDF(), clicks.toDF())
      .queryExecution.analyzed
    val watermarks = plan.collect {
      case e if e.nodeName == "EventTimeWatermark" => e
    }
    assert(watermarks.size == 2, plan.toString)
  }
}
