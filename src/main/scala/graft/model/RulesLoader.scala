package graft.model

import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import java.io.{FileInputStream, InputStream}
import scala.jdk.CollectionConverters._

/** YAML rule-config loader.
  *
  * Same contract as the reference loader (core-engine/src/main/java/com/
  * streamsentinel/core/config/RulesLoader.java:63-136): resolution order is
  * explicit path -> env `RULES_CONFIG_PATH` -> classpath `rules.yml`;
  * duplicate YAML keys are rejected (:121-123); a null/empty document is
  * tolerated as an empty config with a warning (:126-129); validation is
  * fail-fast and collects ALL errors before throwing
  * (RulesConfig.java:67-85).
  *
  * Uses SnakeYAML (ships in /opt/spark/jars) via `SafeConstructor` into
  * plain maps, then binds manually — no reflective POJO construction.
  */
object RulesLoader {

  final class RulesValidationException(val errors: List[String])
      extends RuntimeException(
        "invalid rules configuration:\n" + errors.mkString("\n"))

  def load(): RulesConfig =
    sys.env.get("RULES_CONFIG_PATH") match {
      case Some(p) => fromFile(p)
      case None => fromClasspath("rules.yml")
    }

  def fromFile(path: String): RulesConfig = {
    val in = new FileInputStream(path)
    try parseAndValidate(in) finally in.close()
  }

  def fromClasspath(resource: String): RulesConfig = {
    val in = getClass.getClassLoader.getResourceAsStream(resource)
    if (in == null)
      throw new IllegalArgumentException(s"rules resource not found on classpath: $resource")
    try parseAndValidate(in) finally in.close()
  }

  def fromString(yaml: String): RulesConfig =
    parseAndValidate(new java.io.ByteArrayInputStream(
      yaml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def parseAndValidate(in: InputStream): RulesConfig = {
    val opts = new LoaderOptions
    opts.setAllowDuplicateKeys(false) // RulesLoader.java:121-123
    val root = new Yaml(new SafeConstructor(opts)).load[Any](in)
    if (root == null) return RulesConfig(Nil) // empty doc tolerated (:126-129)
    val rulesNode = root match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Any]].asScala.getOrElse("rules", null)
      case _ => throw new IllegalArgumentException("rules config root must be a mapping")
    }
    if (rulesNode == null) return RulesConfig(Nil)
    val rawRules = rulesNode match {
      case l: java.util.List[_] => l.asScala.toList
      case _ => throw new IllegalArgumentException("'rules' must be a list")
    }
    val bound = rawRules.map(bindOne)
    val (errs, ok) = bound.map(DetectionRule.validate).partitionMap(identity)
    if (errs.nonEmpty) throw new RulesValidationException(errs.flatten)
    RulesConfig(ok)
  }

  private def bindOne(node: Any): DetectionRule.Raw = node match {
    case m: java.util.Map[_, _] =>
      val f = m.asInstanceOf[java.util.Map[String, Any]].asScala
      def str(k: String): String = f.get(k).map(_.toString).orNull
      def int(k: String, d: Int): Int =
        f.get(k).map(v => v.toString.trim.toInt).getOrElse(d)
      def dbl(k: String, d: Double): Double =
        f.get(k).map(v => v.toString.trim.toDouble).getOrElse(d)
      DetectionRule.Raw(
        name = str("name"),
        `type` = str("type"),
        keyField = str("keyField"),
        windowSeconds = int("windowSeconds", 0),
        field = str("field"),
        threshold = dbl("threshold", 0.0),
        windowSize = int("windowSize", 10),
        deviationFactor = dbl("deviationFactor", 2.0),
        quantScale = int("quantScale", 2))
    case other =>
      throw new IllegalArgumentException(s"each rule must be a mapping, got: $other")
  }
}
