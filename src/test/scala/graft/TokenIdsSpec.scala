package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the round-9 additions: tokenizer application (`token_ids`) and
  * the IVF index-health profile (`ivf_cell_profile`). Hash-exactness vs
  * DuckDB is the oracle gate's job; these pin the SEMANTICS on controlled
  * inputs (vocab ranking ties, OOV, the position cap) and the plan shape. */
class TokenIdsSpec extends SparkSpec {
  import spark.implicits._

  test("token_ids: rank-by-count ids, term tie-break, OOV, position cap") {
    // corpus: "b" x3, "a" x2, "c" x2, singletons d..s push vocab past 16.
    // With vocabSize=16: ids are count-desc/term-asc -> b=0, a=1, c=2,
    // then the 13 smallest singletons d..p get 3..15; q/r/s fall to OOV 16.
    val docs = Seq(
      (1L, "b a c b"),
      (2L, "a b c"),
      (3L, "d e f g h i j k l m n o p q r s")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenIdsOf(docs)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val expect = Seq(
      (1L, 0L, 0L), (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 0L),
      (2L, 0L, 1L), (2L, 1L, 0L), (2L, 2L, 2L)) ++
      // doc 3: d..p -> ids 3..15 (alphabetical among tied singletons),
      // q, r, s -> OOV 16
      (0 until 13).map(i => (3L, i.toLong, (3 + i).toLong)) ++
      Seq((3L, 13L, 16L), (3L, 14L, 16L), (3L, 15L, 16L))
    assert(got == expect)
  }

  test("token_ids: position cap truncates long docs at 32") {
    val long = Seq((1L, (0 until 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenIdsOf(long)
    assert(got.count() == 32)
    assert(got.agg(max("pos")).as[Long].head() == 31L)
  }

  test("token_ids plan: corpus side never shuffles for the encode join") {
    val plan = TextAnalysis.tokenIds(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast, not shuffle the exploded corpus:\n$plan")
  }

  test("ivf_cell_profile: occupancy sums to the corpus, all cells balanced") {
    val prof = Similarity.ivfCellProfile(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toSeq
    val n = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .count()
    assert(prof.map(_._2).sum == n, "every vector lands in exactly one cell")
    assert(prof.forall(_._2 > 0), "profile only lists occupied cells")
    // health: no cell may hold the whole corpus (the degenerate index the
    // stat exists to expose); the near-random fixture spreads far better
    // than this loose bound, which only guards catastrophic collapse
    assert(prof.map(_._2).max < n, "index collapsed into one cell")
  }

  test("bpe_encode: pieces round-trip to the original token stream; merges applied") {
    val dir = "/root/testdata/sf0.001"
    val pieces = TextAnalysis.bpeEncode(spark, dir)
      .as[(Long, Int, String)].collect()
    assert(pieces.nonEmpty)
    // merged pieces carry interior spaces; splitting them back must
    // reproduce each document's exact original token sequence
    val rebuilt = pieces.groupBy(_._1).map { case (id, ps) =>
      id -> ps.sortBy(_._2).flatMap(_._3.split(" ")).toSeq
    }
    val original = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.operators.Dedup.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
      .filter(_._2.nonEmpty)
    assert(rebuilt.keySet == original.keySet)
    rebuilt.foreach { case (id, toks) =>
      assert(toks == original(id), s"doc $id round-trip broke")
    }
    // the trained merges actually applied: multi-token pieces exist and
    // every one is a contiguous run of >= 2 original tokens
    val merged = pieces.filter(_._3.contains(" "))
    assert(merged.nonEmpty, "no merge ever applied")
    // piece positions are dense from 0 per doc
    pieces.groupBy(_._1).foreach { case (id, ps) =>
      assert(ps.map(_._2).sorted.toSeq == (0 until ps.length).toSeq, s"doc $id")
    }
  }
}
