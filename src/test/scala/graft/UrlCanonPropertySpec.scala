package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property coverage of [[Corpus.canonicalUrl]] on
  * adversarial URL shapes (VERDICT r13 #5 / ADVICE r13): structured
  * generators build a DECORATED variant (scheme/host case, leading
  * www., scheme-default port, trailing slashes, shuffled params,
  * tracking params with and without `=value`, fragments) next to an
  * independently-computed expected canonical, plus a scheme-less /
  * garbage population that must pass through byte-unchanged. All cases
  * evaluate in ONE DataFrame pass (the expression, not a Scala
  * re-implementation, is under test). Seeded: deterministic runs. */
class UrlCanonPropertySpec extends SparkSpec {
  import spark.implicits._

  private val nCases = 300

  private final case class Shape(
      scheme: String, www: Boolean, host: String, port: String,
      keptPort: String, segs: List[String], trailingSlashes: Int,
      params: List[String], tracking: List[String], frag: Option[String],
      shuffleSeed: Long)

  private val genHost = Gen.oneOf(
    "example.com", "news.site.org", "a-b.c2.io", "x.y", "sub.dom.example.net")

  private val genParam = for {
    k <- Gen.oneOf("id", "b", "page", "q", "ref", "a")
    v <- Gen.oneOf("", "1", "2", "7", "zz", "a%20b")
  } yield s"$k=$v"

  private val genTracking = Gen.oneOf(
    "utm_source=crawler", "utm_campaign=x", "utm_=y", "fbclid=abc",
    "gclid=z9", "gclid", "utm_medium", "fbclid=")

  private val genShape: Gen[Shape] = for {
    scheme <- Gen.oneOf("http", "https")
    www <- Gen.oneOf(true, false)
    host <- genHost
    // (decorated port, surviving port): default-for-scheme strips, any
    // other port — including the OTHER scheme's default — survives
    portPair <- Gen.oneOf(
      ("", ""),
      (if (scheme == "http") ":80" else ":443", ""),
      (":8080", ":8080"),
      (if (scheme == "http") ":443" else ":80",
        if (scheme == "http") ":443" else ":80"))
    segs <- Gen.listOfN(2, Gen.oneOf("page", "Item", "7", "x-y", "z.html"))
      .flatMap(l => Gen.choose(0, 2).map(l.take))
    slashes <- Gen.choose(0, 3)
    params <- Gen.listOfN(3, genParam).flatMap(l => Gen.choose(0, 3).map(l.take))
    tracking <- Gen.listOfN(2, genTracking)
      .flatMap(l => Gen.choose(0, 2).map(l.take))
    frag <- Gen.option(Gen.oneOf("#sec", "#", "#a/b?c=1"))
    sh <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield Shape(scheme, www, host, portPair._1, portPair._2, segs, slashes,
    params, tracking, frag, sh)

  private def mixCase(s: String, seed: Long): String = {
    val r = new scala.util.Random(seed)
    s.map(c => if (r.nextBoolean()) c.toUpper else c).mkString
  }

  private def decorated(u: Shape): String = {
    val r = new scala.util.Random(u.shuffleSeed)
    val qs = r.shuffle(u.params ++ u.tracking)
    mixCase(u.scheme, u.shuffleSeed) + "://" +
      (if (u.www) "www." else "") + mixCase(u.host, u.shuffleSeed + 1) +
      u.port +
      (if (u.segs.nonEmpty) u.segs.mkString("/", "/", "") else "") +
      "/" * u.trailingSlashes +
      (if (qs.nonEmpty) qs.mkString("?", "&", "") else "") +
      u.frag.getOrElse("")
  }

  /** Independent expected canonical (never calls the code under test). */
  private def expected(u: Shape): String = {
    val path = (if (u.segs.nonEmpty) u.segs.mkString("/", "/", "") else "")
      .reverse.dropWhile(_ == '/').reverse
    val q = u.params.sorted.mkString("&")
    u.scheme + "://" + u.host + u.keptPort + path +
      (if (q.isEmpty) "" else "?" + q)
  }

  private def canonAll(urls: Seq[String]): Seq[String] =
    urls.toDF("url").select(Corpus.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("decorated variant canonicalizes to the independent expected form") {
    val params = Gen.Parameters.default
    val shapes = (0 until nCases).map(i =>
      genShape.pureApply(params, Seed(20260815L + i)))
    val got = canonAll(shapes.map(decorated))
    shapes.zip(got).foreach { case (u, g) =>
      assert(g == expected(u), s"decorated=${decorated(u)}")
    }
  }

  test("param order never matters: two shuffles of one URL collide") {
    val params = Gen.Parameters.default
    val shapes = (0 until nCases).map(i =>
      genShape.pureApply(params, Seed(77L + i)))
    val a = canonAll(shapes.map(decorated))
    val b = canonAll(shapes.map(u => decorated(u.copy(shuffleSeed = ~u.shuffleSeed))))
    // case-mixing differs per seed too, so this also covers scheme/host case
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("scheme-less and garbage rows pass through byte-unchanged") {
    val fixed = Seq("", "example.com/page?x=1", "/relative/path",
      "not a url at all", "ftp:/missing-slash", "://nohost",
      "1http://leading-digit", "page/7?utm_source=x#f", "?", "#", "a b c")
    val genGarbage = Gen.oneOf(
      Gen.alphaNumStr.map(s => s.take(20)),
      Gen.listOfN(8, Gen.oneOf('/', '?', '&', '#', '=', 'a', '7', ' ', '.'))
        .map(_.mkString))
    val params = Gen.Parameters.default
    val rnd = (0 until nCases).map(i =>
      genGarbage.pureApply(params, Seed(909L + i)))
      .filterNot(_.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
    val all = fixed ++ rnd
    canonAll(all).zip(all).foreach { case (g, in) =>
      assert(g == in, s"input '$in' must pass through unchanged")
    }
  }

  test("bare tracking params strip; fragments never survive") {
    val got = canonAll(Seq(
      "http://example.com/p?gclid",
      "http://example.com/p?utm_source&b=2",
      "http://example.com/p?fbclid&gclid=1&utm_x",
      "https://example.com/p?gclidx=1", // NOT a tracking param (no boundary)
      "http://example.com/p#frag?notquery=1"))
    assert(got == Seq(
      "http://example.com/p",
      "http://example.com/p?b=2",
      "http://example.com/p",
      "https://example.com/p?gclidx=1",
      "http://example.com/p"))
  }
}
