package graft.tools

import graft.operators.Forget
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational entry point for an RTBF pass over the persisted
  * streaming bases (r16 verdict #3): the [[graft.operators.Forget]]
  * rewriters are the executable delete, but a deployment needs a runner
  * that ENFORCES the must-not-run-concurrently-with-the-stream
  * constraint ([[graft.streaming.PartitionedBase.replace]]'s crash
  * contract) instead of documenting it, and prints the before/after
  * accounting the `corpus_forget`/`state_forget` oracle queries define.
  *
  * Layout convention: `root/<family>/` holds each twin's base dir —
  * `incremental/{digests,shingles}`, `span/spans`, `embedding/cells`,
  * `url/canon`, `cdc/chunks`, `winnow/fps`, `recrawl/state`,
  * `crossmodal/labels`. The selector `all` rewrites every family whose
  * directory exists; naming a family whose directory is absent fails
  * loudly (a kill request silently skipping an artifact is the one
  * outcome an RTBF runner must never produce).
  *
  * Concurrency enforcement, two independent guards, both preflight
  * (nothing is rewritten if either trips):
  *
  *  1. `--checkpoints c1,c2` — the streams' checkpointLocations. Refuse
  *     if any shows an IN-FLIGHT batch (an `offsets/<id>` entry with no
  *     matching `commits/<id>` — the stream is mid-batch, possibly
  *     mid-write into a `batch=<id>` partition this pass would swap
  *     away), or if its newest offsets entry is younger than
  *     `--quiesce-secs` (default 60; 0 disables) — a stream at a clean
  *     batch boundary still has a live driver that will start the next
  *     batch; demanding a quiet period makes "I stopped the stream"
  *     checkable. Passing the checkpoints is the operator's contract;
  *     the runner cannot discover them (base dirs don't record which
  *     checkpoint drives them).
  *  2. `root/_maintenance.lock` ([[graft.streaming.Maintenance]], shared
  *     with [[CompactRun]]) — an advisory lock created atomically before
  *     the first rewrite and removed on exit, so two maintenance passes
  *     (forget, compaction) cannot interleave their read→swap cycles. A
  *     crashed pass leaves the lock behind deliberately: the operator
  *     must inspect for a half-swapped `<dir>_old` before removing it.
  *
  * Inputs: `kill` parquet with any of `doc_id` / `vec_id` / `page` —
  * each family uses its key column and fails loudly if the column is
  * missing. Optional corpus access: `--docs <parquet>` (doc_id, text)
  * enables span attestation and digest/chunk re-keying; `--urls
  * <parquet>` (doc_id, url) enables canonical-URL re-keying; `--edges
  * <parquet>` (d1, d2 — SURVIVING edges) enables the component-aware
  * crossmodal relabel (without it the conservative min-survivor relabel
  * runs, per [[Forget.forgetCrossmodalLabels]]).
  *
  * Usage: runMain graft.tools.ForgetRun <root> <killParquet> <families>
  *   [--checkpoints c1,c2] [--quiesce-secs N] [--docs p] [--urls p]
  *   [--edges p]
  */
object ForgetRun {

  /** Per-table accounting line: rows before and after the rewrite. */
  final case class Accounting(family: String, table: String,
      before: Long, after: Long)

  /** family -> (subdir tables, kill-key column). */
  private val families: Seq[(String, Seq[String], String)] = Seq(
    ("incremental", Seq("digests", "shingles"), "doc_id"),
    ("span", Seq("spans"), "doc_id"),
    ("embedding", Seq("cells"), "vec_id"),
    ("url", Seq("canon"), "doc_id"),
    ("cdc", Seq("chunks"), "doc_id"),
    ("winnow", Seq("fps"), "doc_id"),
    ("recrawl", Seq("state"), "page"),
    ("crossmodal", Seq("labels"), "doc_id"))

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, p: String): Boolean =
    fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  /** The full pass: preflight both guards, then rewrite each selected
    * family and return the accounting. Nothing is touched if a guard
    * refuses. */
  def run(spark: SparkSession, root: String, kill: DataFrame,
      selector: Seq[String], docs: Option[DataFrame] = None,
      urls: Option[DataFrame] = None, edges: Option[DataFrame] = None,
      checkpoints: Seq[String] = Seq.empty,
      quiesceSecs: Long = 60L): Seq[Accounting] = {
    val all = selector == Seq("all")
    val known = families.map(_._1).toSet
    val unknown = selector.filterNot(s => s == "all" || known.contains(s))
    require(unknown.isEmpty, s"unknown families: ${unknown.mkString(",")}" +
      s" (known: ${families.map(_._1).mkString(",")},all)")
    val selected = families.filter { case (name, _, _) =>
      if (all) exists(spark, s"$root/$name")
      else selector.contains(name)
    }
    selected.foreach { case (name, tables, keyCol) =>
      require(exists(spark, s"$root/$name/${tables.head}"),
        s"forget refused: family '$name' requested but" +
          s" $root/$name/${tables.head} does not exist")
      require(kill.columns.contains(keyCol),
        s"forget refused: family '$name' needs kill column '$keyCol';" +
          s" kill list has ${kill.columns.mkString(",")}")
    }
    require(selected.nonEmpty, "no families selected")
    require(!selected.exists(_._1 == "span") || docs.nonEmpty,
      "family 'span' needs --docs: span attestation requires the" +
        " surviving corpus (the artifact stores bare digests)")
    graft.streaming.Maintenance.preflightCheckpoints(spark, checkpoints,
      quiesceSecs)
    graft.streaming.Maintenance.withLock(spark, root) {
      val survDocs = docs.map(d =>
        d.join(broadcast(kill.select("doc_id").distinct()),
          Seq("doc_id"), "left_anti"))
      selected.flatMap { case (name, tables, _) =>
        val dir = s"$root/$name"
        def count(t: String): Long =
          graft.streaming.PartitionedBase.all(spark, s"$dir/$t").count()
        val before = tables.map(t => t -> count(t)).toMap
        name match {
          case "incremental" =>
            Forget.forgetIncrementalBase(spark, dir, kill, survDocs)
          case "span" =>
            Forget.forgetSpanBase(spark, dir,
              killedDocs = docs.get.join(
                broadcast(kill.select("doc_id").distinct()),
                Seq("doc_id"), "left_semi"),
              survivors = survDocs.get)
          case "embedding" => Forget.forgetEmbeddingBase(spark, dir, kill)
          case "url" =>
            Forget.forgetUrlBase(spark, dir, kill,
              urls.map(_.join(broadcast(kill.select("doc_id").distinct()),
                Seq("doc_id"), "left_anti")))
          case "cdc" => Forget.forgetCdcBase(spark, dir, kill, survDocs)
          case "winnow" => Forget.forgetWinnowBase(spark, dir, kill)
          case "recrawl" => Forget.forgetRecrawlState(spark, dir, kill)
          case "crossmodal" =>
            Forget.forgetCrossmodalLabels(spark, dir, kill, edges)
        }
        tables.map { t =>
          val a = Accounting(name, t, before(t), count(t))
          println(f"[forget] ${a.family}/${a.table}: ${a.before}%d ->" +
            f" ${a.after}%d (${a.after - a.before}%+d)")
          a
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ForgetRun <root> <killParquet> <families>" +
        " [--checkpoints c1,c2] [--quiesce-secs N] [--docs p] [--urls p]" +
        " [--edges p]")
    val (root, killPath, selector) = (args(0), args(1),
      args(2).split(",").map(_.trim).toSeq)
    val opts = args.drop(3).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Sessions
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(k: String): Option[DataFrame] =
      opts.get(k).map(spark.read.parquet(_))
    val acc = run(spark, root, spark.read.parquet(killPath), selector,
      docs = read("--docs"), urls = read("--urls"), edges = read("--edges"),
      checkpoints = opts.get("--checkpoints")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      quiesceSecs = opts.get("--quiesce-secs").map(_.toLong).getOrElse(60L))
    println(s"[forget] done: ${acc.size} tables rewritten")
    spark.stop()
  }
}
