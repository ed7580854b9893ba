package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Dev-only per-stage profile of a registered query — the "profile
  * on-host instead of re-adjudicating" instrument the r16 verdict asked
  * for when a quiet-bench regression survives a second capture. For
  * each named query: one warm pass (JIT + page cache), then a timed
  * pass with a listener recording per-stage task-time totals, so a
  * sustained slowdown can be attributed to a SPECIFIC stage (one
  * exploded exchange = plan/code drift; uniform inflation across
  * stages = the host's per-core throughput) rather than argued from
  * wall clock alone.
  *
  * Usage: runMain graft.tools.StageProfile <q1,q2> [sfDir] [topN]
  */
object StageProfile {

  private case class St(id: Int, name: String, tasks: Int, runMs: Long,
    cpuMs: Long, gcMs: Long, shufReadMb: Double, shufWriteMb: Double)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val topN = if (args.length > 2) args(2).toInt else 10
    val spark = graft.sources.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name, i.numTasks, m.executorRunTime,
            m.executorCpuTime / 1000000L, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0)
        }
      }
    })

    names.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val warm = once() // warm pass: JIT + page cache, not recorded
      stages.synchronized(stages.clear())
      val wall = once()
      val snap = stages.synchronized(stages.toVector)
      val totRun = snap.map(_.runMs).sum
      val totGc = snap.map(_.gcMs).sum
      println(f"\n[stageprofile] $n wall=$wall%.2f s (warm $warm%.2f)  " +
        f"stages=${snap.size}  taskTime=${totRun / 1000.0}%.1f s  " +
        f"gc=${totGc / 1000.0}%.1f s")
      snap.sortBy(-_.runMs).take(topN).foreach { s =>
        println(f"  stage ${s.id}%4d run=${s.runMs / 1000.0}%7.2f s " +
          f"cpu=${s.cpuMs / 1000.0}%7.2f s gc=${s.gcMs / 1000.0}%5.2f s " +
          f"tasks=${s.tasks}%3d shufR=${s.shufReadMb}%8.1fMB " +
          f"shufW=${s.shufWriteMb}%8.1fMB  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
