package graft

import graft.operators.TextAnalysis

/** Pins [[TextAnalysis.cdcChunks]]/[[TextAnalysis.cdcDedup]]: exact
  * sequential recompute of the content-defined boundaries, the
  * SHIFT-ROBUSTNESS property fixed windows lack (a prepended token
  * perturbs only the first chunk), and the dedup table's consistency
  * with the chunk table.
  */
class CdcSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def reference(text: String): Seq[(Long, Long, String)] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var chunk = Vector.empty[String]
    var idx = 1L
    toks.zipWithIndex.foreach { case (w, i) =>
      chunk :+= w
      val h = java.lang.Long.parseLong(hex(w).take(10), 16)
      if (h % TextAnalysis.cdcMod == 0L || i == toks.length - 1) {
        out += ((idx, chunk.length.toLong, hex(chunk.mkString(" "))))
        chunk = Vector.empty; idx += 1
      }
    }
    out.toSeq
  }

  private lazy val docs = graft.sources.Tables.documents(spark, dir)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("chunks match the sequential reference exactly") {
    val got = TextAnalysis.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).map { case (id, a) =>
        id -> a.map(_._2).sortBy(_._1).toSeq
      }
    val ref = docs.map { case (id, t) => id -> reference(t) }
      .filter(_._2.nonEmpty)
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, chunks) => assert(chunks == ref(id), s"doc $id") }
    assert(got.values.map(_.size).sum > got.size,
      "fixture must produce multi-chunk docs")
  }

  test("shift robustness: a prepended token perturbs only the head") {
    val long = docs.values.filter(_.split(" ").length > 60).take(10)
    assert(long.nonEmpty)
    long.foreach { t =>
      val orig = reference(t).map(_._3)
      val shifted = reference("zzshift " + t).map(_._3)
      val shared = orig.toSet & shifted.toSet
      // every chunk after the first boundary is content-identical; only
      // the head chunk (and the injected token's chunk) can differ
      assert(shared.size >= orig.size - 1,
        s"CDC must preserve all but the head chunk: ${shared.size}/${orig.size}")
      // the fixed-window CONTRAST: offset-shifted windows share nothing
      val fixed = t.sliding(200, 150).map(hex).toSet
      val fixedShifted = ("zzshift " + t).sliding(200, 150).map(hex).toSet
      assert((fixed & fixedShifted).size < fixed.size,
        "fixed windows must lose chunks under the same shift")
    }
  }

  test("dedup table consistent with the chunk table, duplicates exist") {
    val chunks = TextAnalysis.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val byMd5 = chunks.groupBy(_._2)
    val expected = byMd5.filter(_._2.length > 1).map { case (md5, xs) =>
      md5 -> ((xs.map(_._1).distinct.length.toLong, xs.length.toLong))
    }
    val got = TextAnalysis.cdcDedup(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain duplicate CDC chunks")
  }
}
