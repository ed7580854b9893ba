package graft

import graft.operators.Crawl
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property coverage of the RFC 9309 longest-match verdict
  * core ([[Crawl.robotsVerdict]]): random per-host rule sets (prefix
  * paths over a small segment alphabet, random Allow/Disallow bits,
  * including duplicate-length and duplicate-path collisions) and random
  * URL paths, checked against an independent driver-side brute force —
  * all matching rules, longest wins, Allow wins a length tie, no match
  * means allowed. All cases evaluate in ONE DataFrame pass (the plan,
  * not a Scala re-implementation, is under test). Seeded, so runs are
  * deterministic. */
class RobotsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val segs = List("a", "b", "cc", "d1", "private", "pub")

  private val genRule: Gen[(String, Long)] = for {
    depth <- Gen.choose(0, 3)
    parts <- Gen.listOfN(depth, Gen.oneOf(segs))
    allow <- Gen.oneOf(0L, 1L)
  } yield ("/" + parts.mkString("/"), allow)

  private val genHostRules: Gen[List[(String, Long)]] =
    Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, genRule))

  private val genPath: Gen[String] = for {
    depth <- Gen.choose(0, 4)
    parts <- Gen.listOfN(depth, Gen.oneOf(segs))
  } yield "/" + parts.mkString("/")

  private def brute(path: String, rules: Seq[(String, Long)]): (Boolean, Long) = {
    val matching = rules.filter { case (rp, _) => path.startsWith(rp) }
    if (matching.isEmpty) (true, -1L)
    else {
      val best = matching.map { case (rp, al) => rp.length * 2L + al }.max
      (best % 2 == 1, best)
    }
  }

  test("random rule sets: verdict == driver-side longest-match brute force") {
    val nHosts = 40
    val urlsPerHost = 8
    val seed0 = Seed(20260816L)
    var seed = seed0
    def next[A](g: Gen[A]): A = {
      val (v, s2) = (g.pureApply(Gen.Parameters.default, seed), seed.next)
      seed = s2; v
    }
    val hostRules = (0 until nHosts).map { k =>
      s"h$k.test" -> next(genHostRules)
    }
    val urls = for {
      (h, _) <- hostRules
      i <- 0 until urlsPerHost
    } yield (h, next(genPath))

    val frontier = urls.zipWithIndex
      .map { case ((h, p), i) => (i.toLong, h, p) }
      .toDF("doc_id", "host", "path")
    val rules = hostRules
      .flatMap { case (h, rs) => rs.map { case (rp, al) => (h, rp, al) } }
      .toDF("host", "rule_path", "is_allow")

    val got = Crawl.robotsVerdict(frontier, rules)
      .select("doc_id", "allowed", "rule_path")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val ruleMap = hostRules.toMap
    urls.zipWithIndex.foreach { case ((h, p), i) =>
      val (wantAllowed, wantRank) = brute(p, ruleMap(h))
      val (gotAllowed, gotRule) = got(i.toLong)
      assert(gotAllowed == wantAllowed,
        s"url $h$p rules=${ruleMap(h)} got $gotAllowed want $wantAllowed")
      // the reported winning rule has exactly the winning rank (its PATH
      // may differ under equal-rank collisions — the verdict may not)
      if (wantRank >= 0) {
        val al = if (wantAllowed) 1L else 0L
        assert(gotRule.exists(rp => rp.length * 2L + al == wantRank),
          s"url $h$p rule $gotRule does not carry winning rank $wantRank")
      } else assert(gotRule.isEmpty, s"url $h$p matched $gotRule, want none")
    }
    // both verdicts occur across 320 random urls
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
  }
}
