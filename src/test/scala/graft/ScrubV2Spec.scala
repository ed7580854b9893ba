package graft

import graft.operators.TextAnalysis

/** Boundary-format pins for the PII scrub v2 pass
  * ([[TextAnalysis.corpusScrubV2]]): card formats the Luhn validator must
  * accept and reject, octet-boundary IPv4s, phone separators, and the
  * URL-before-email ordering rule. Uses the package-private
  * [[TextAnalysis.corpusScrubV2On]] entry that keeps the cleaned text
  * (the shipped query exposes only its md5). Note every doc also carries
  * the deterministic doc_id-derived PII augmentation, so assertions here
  * are substring contains/not-contains on the CRAFTED spans plus count
  * deltas relative to that baseline (1 url, 1 email, 1 valid card, 1
  * phone, 1 valid IP for these doc_ids).
  */
class ScrubV2Spec extends SparkSpec {

  private def clean(cases: (Long, String)*): Map[Long, (String, Map[String, Long])] = {
    import spark.implicits._
    val df = cases.toDF("doc_id", "text")
    TextAnalysis.corpusScrubV2On(spark, df)
      .collect()
      .map { r =>
        r.getLong(0) -> (r.getString(8), Map(
          "urls" -> r.getLong(1), "emails" -> r.getLong(2),
          "cards" -> r.getLong(3), "phones" -> r.getLong(4),
          "ips" -> r.getLong(5)))
      }.toMap
  }

  test("card boundary formats: Luhn-valid scrubbed in every grouping, Luhn-fail survives") {
    val out = clean(
      0L -> "pay 4111 1111 1111 1111 now",
      1L -> "pay 4111-1111-1111-1111 now",
      2L -> "pay 4111111111111111 now",
      3L -> "amex 3782 8224 6310 005 end",     // 15-digit Amex, valid Luhn
      4L -> "mixed 4111 1111-1111 1111 end",   // mixed separators, same digits
      5L -> "bad 1234 5678 9012 3456 end")     // Luhn check fails -> survives
    for (id <- Seq(0L, 1L, 2L, 3L, 4L)) {
      val (txt, n) = out(id)
      assert(txt.contains("pay <CARD> now") || txt.contains("<CARD> end") ||
        txt.contains("amex <CARD>"), s"doc $id: $txt")
      assert(n("cards") == 2L, s"doc $id: crafted + injected = 2, got ${n("cards")}")
    }
    val (bad, nBad) = out(5L)
    assert(bad.contains("bad 1234 5678 9012 3456 end"), bad)
    assert(nBad("cards") == 1L) // only the injected card validates
  }

  test("IPv4 octet boundaries: 255 in, 256 and 999 out") {
    val out = clean(
      6L -> "a 255.255.255.255 b 256.0.0.1 c 10.0.0.1 d 999.1.2.3 e")
    val (txt, n) = out(6L)
    assert(txt.contains("a <IP> b 256.0.0.1 c <IP> d 999.1.2.3 e"), txt)
    assert(n("ips") == 3L, s"2 crafted valid + 1 injected, got ${n("ips")}") // 255.. + 10.. + injected
  }

  test("phone separators: dash and space forms both scrubbed") {
    val out = clean(7L -> "call 415-555-2671 or 415 555 2671 end")
    val (txt, n) = out(7L)
    assert(txt.contains("call <PHONE> or <PHONE> end"), txt)
    assert(n("phones") == 3L)
  }

  test("URL and email passes: both scrubbed, counts include the injected pair") {
    val out = clean(
      8L -> "see https://x.io/p?a=1 go mail bob.smith+x@ex.co end")
    val (txt, n) = out(8L)
    assert(txt.contains("see <URL> go mail <EMAIL> end"), txt)
    assert(n("urls") == 2L && n("emails") == 2L) // crafted + injected each
  }

  test("card pass runs before phone: separator-grouped card is not half-eaten") {
    // if phones ran first, '111-1111' spans inside the dashed card would
    // partially match; the scrubbed text must contain ONE whole <CARD>
    val out = clean(9L -> "x 4111-1111-1111-1111 y")
    val (txt, _) = out(9L)
    assert(txt.contains("x <CARD> y"), txt)
  }
}
