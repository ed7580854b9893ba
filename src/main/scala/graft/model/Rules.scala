package graft.model

/** Declarative detection-rule model.
  *
  * Semantics derived from the reference's rule POJO + validation
  * (reference: core-engine/src/main/java/com/streamsentinel/core/model/
  * DetectionRule.java:29-224) re-expressed as a sealed Scala ADT so that
  * rule dispatch is exhaustive at compile time (the reference dispatches on
  * a lowercased type string in DetectorFactory.java:44-51).
  *
  * Rules drive *query construction*, not runtime rows: each rule compiles
  * to a `DataFrame => DataFrame` transform (batch, [[graft.operators.Detectors]])
  * or a state-update closure (streaming, [[graft.streaming.StreamingDetectors]]).
  */
sealed trait DetectionRule {
  def name: String
  /** Rule-type tag as the reference spells it (DetectionRule.java:141-143
    * lowercases on set). */
  def ruleType: String
}

/** Fires when `field` (coerced to double; string-encoded numbers accepted,
  * Event.java:101-114) is strictly greater than `threshold`
  * (ThresholdDetector.java:59 — strict `>`). `threshold` itself is
  * deliberately NOT validated (DetectionRule.java:93-97 skips it). */
final case class ThresholdRule(name: String, field: String, threshold: Double)
    extends DetectionRule { val ruleType = "threshold" }

/** Fires when strictly more than `threshold` events for the same key fall in
  * the trailing window [t - windowSeconds, t] ending at each event
  * (RateSpikeDetector.java:85-94: evict `< windowStart`, strict `>` count). */
final case class RateRule(name: String, keyField: String, windowSeconds: Int,
    threshold: Double) extends DetectionRule { val ruleType = "rate" }

/** Fires when |v - mean| strictly exceeds deviationFactor * sigma, where
  * mean/sigma are computed over the previous `windowSize` values of `field`
  * for the key, EXCLUDING the current value (check-before-insert,
  * StatisticalOutlierDetector.java:92-127), sigma is the POPULATION stddev
  * (/N, :149-156), at least 2 history values are required (:45), and
  * sigma == 0 fires on any nonzero deviation (:98).
  *
  * `quantScale` (engine extension, not in the reference): history values
  * are quantized to `10^-quantScale` before the moments are computed, in
  * BOTH the batch and streaming formulations — integer-space S1/S2 sums
  * make every derived double the same IEEE operation sequence in any
  * engine, so fire decisions and formatted details are bit-deterministic
  * (the reference accumulates raw doubles, which no two engines reproduce
  * at the ulp level). The default 2 is lossless for money-like 2-decimal
  * domains; finer domains raise it. Valid range 0..6; the integer moments
  * need |value|*10^quantScale below ~3e8 to stay exact in a long. The
  * current value itself is compared raw (only its baseline is quantized). */
final case class StatisticalRule(name: String, field: String,
    windowSize: Int = 10, deviationFactor: Double = 2.0, quantScale: Int = 2)
    extends DetectionRule {
  require(quantScale >= 0 && quantScale <= 6, "quantScale must be in [0, 6]")
  val ruleType = "statistical"
}

final case class RulesConfig(rules: Seq[DetectionRule])

object DetectionRule {
  /** Raw, pre-validation shape as YAML/maps bind it (mirrors the mutable
    * POJO fields and defaults: windowSize=10 DetectionRule.java:55,
    * deviationFactor=2.0 :58). */
  final case class Raw(
      name: String = null,
      `type`: String = null,
      keyField: String = null,
      windowSeconds: Int = 0,
      field: String = null,
      threshold: Double = 0.0,
      windowSize: Int = 10,
      deviationFactor: Double = 2.0,
      quantScale: Int = 2)

  /** Validate one raw rule into the ADT, or return the error messages.
    * Error strings mirror DetectionRule.java:70-118 so behavior is
    * comparable test-for-test. */
  def validate(r: Raw): Either[List[String], DetectionRule] = {
    val errs = scala.collection.mutable.ListBuffer.empty[String]
    val blank = (s: String) => s == null || s.trim.isEmpty
    if (blank(r.name)) errs += "rule name must not be blank"
    val tpe = Option(r.`type`).map(_.toLowerCase).orNull
    tpe match {
      case "rate" =>
        if (blank(r.keyField)) errs += s"rule [${r.name}]: keyField is required for rate rules"
        if (r.windowSeconds <= 0) errs += s"rule [${r.name}]: windowSeconds must be > 0 for rate rules"
        if (r.threshold <= 0) errs += s"rule [${r.name}]: threshold must be > 0 for rate rules"
      case "threshold" =>
        if (blank(r.field)) errs += s"rule [${r.name}]: field is required for threshold rules"
        // threshold value intentionally unvalidated (DetectionRule.java:93-97)
      case "statistical" =>
        if (blank(r.field)) errs += s"rule [${r.name}]: field is required for statistical rules"
        if (r.windowSize < 2) errs += s"rule [${r.name}]: windowSize must be >= 2 for statistical rules"
        if (r.deviationFactor <= 0) errs += s"rule [${r.name}]: deviationFactor must be > 0 for statistical rules"
        if (r.quantScale < 0 || r.quantScale > 6) errs += s"rule [${r.name}]: quantScale must be in [0, 6] for statistical rules"
      case null => errs += s"rule [${r.name}]: type must not be blank"
      case other => errs += s"rule [${r.name}]: unknown rule type [$other]"
    }
    if (errs.nonEmpty) Left(errs.toList)
    else Right(tpe match {
      case "rate" => RateRule(r.name, r.keyField, r.windowSeconds, r.threshold)
      case "threshold" => ThresholdRule(r.name, r.field, r.threshold)
      case "statistical" => StatisticalRule(r.name, r.field, r.windowSize, r.deviationFactor, r.quantScale)
    })
  }
}
