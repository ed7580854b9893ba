package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared guards for OFFLINE maintenance passes over the
  * [[PartitionedBase]] layouts (forget rewrites, compaction): both
  * kinds perform read->swap cycles that must not interleave with a
  * live stream's onBatch or with each other
  * ([[PartitionedBase.replace]]'s crash contract). Extracted from
  * ForgetRun (r17) so every maintenance runner refuses the same way.
  *
  *  - [[preflightCheckpoints]]: refuse while any supplied stream
  *    checkpoint shows an in-flight batch (`offsets/<id>` with no
  *    `commits/<id>`) or wrote an offset inside the quiesce window (a
  *    clean batch boundary still means a live driver that will start
  *    the next batch).
  *  - [[withLock]]: one advisory `_maintenance.lock` under the root,
  *    created atomically, removed on exit — two passes cannot
  *    interleave. A crashed pass leaves it behind deliberately: the
  *    operator must check for half-swapped `<dir>_old` dirs before
  *    removing it.
  */
object Maintenance {

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Refuse while any stream checkpoint looks live. */
  def preflightCheckpoints(spark: SparkSession, checkpoints: Seq[String],
      quiesceSecs: Long): Unit = checkpoints.foreach { cp =>
    val f = fs(spark, cp)
    def entries(sub: String): Seq[(Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(s"$cp/$sub")
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq
        .flatMap(s => s.getPath.getName.toLongOption
          .map(id => (id, s.getModificationTime)))
    }
    val offsets = entries("offsets")
    val commits = entries("commits").map(_._1).toSet
    val inFlight = offsets.map(_._1).filterNot(commits.contains)
    require(inFlight.isEmpty,
      s"maintenance refused: checkpoint $cp has in-flight batch" +
        s" ${inFlight.min} (offsets written, no commit) — the stream is" +
        " mid-batch; stop it and re-run")
    val newest = offsets.map(_._2).maxOption.getOrElse(0L)
    val age = (System.currentTimeMillis() - newest) / 1000L
    require(quiesceSecs <= 0 || offsets.isEmpty || age >= quiesceSecs,
      s"maintenance refused: checkpoint $cp wrote an offset ${age}s ago" +
        s" (quiesce ${quiesceSecs}s) — a live driver may start the next" +
        " batch mid-rewrite; stop the stream or wait")
  }

  /** Run `body` under the root's advisory maintenance lock. */
  def withLock[T](spark: SparkSession, root: String)(body: => T): T = {
    val lock = s"$root/_maintenance.lock"
    val created =
      try fs(spark, root).createNewFile(new org.apache.hadoop.fs.Path(lock))
      catch { case _: java.io.IOException => false }
    require(created,
      s"maintenance refused: $lock exists — another maintenance pass is" +
        " running (or crashed mid-swap: check for <table>_old dirs" +
        " before removing the lock)")
    try body
    finally fs(spark, root)
      .delete(new org.apache.hadoop.fs.Path(lock), false)
  }
}
