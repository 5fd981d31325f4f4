package graft.ingest

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml
import graft.ops.Scoring.{Bucket, ScoringConfig}

/** YAML scoring-config source (SURVEY §2 A8, §1.4): parses the reference's
  * etl_config.yaml shape into a ScoringConfig. Implements the keys the
  * reference CODE reads — the partially-dead YAML keys documented in
  * SURVEY §1.5 (min_impressions, write_slices, the unreachable `default`
  * bucket, inputs.* naming mismatch) are intentionally ignored exactly like
  * the reference ignores them.
  */
object YamlConfig {

  def parseScoring(yamlText: String): ScoringConfig = {
    val root = Option(new Yaml().load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala).getOrElse(Map.empty[String, Object])
    def section(name: String): Map[String, Object] =
      root.get(name).collect { case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
      }.getOrElse(Map.empty)
    val scoring = section("scoring")
    val thresholds = section("thresholds")
    val mappings = section("mappings")
    def num(m: Map[String, Object], k: String, d: Double): Double =
      m.get(k).map(v => v.toString.toDouble).getOrElse(d)
    val buckets = scoring.get("expected_ctr_by_position")
      .collect { case m: java.util.Map[_, _] =>
        // LinkedHashMap preserves YAML order — bucket declaration order is
        // semantic (first match wins)
        m.asScala.toSeq.map { case (k, v) => k.toString -> v.toString.toDouble }
      }.getOrElse(Seq.empty)
    val intents = scoring.get("intent_multipliers")
      .collect { case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> v.toString.toDouble }.toMap
      }.getOrElse(Map.empty[String, Double])
    val hints = mappings.get("url_intent_hints")
      .collect { case m: java.util.Map[_, _] =>
        m.asScala.toSeq.map { case (k, v) => k.toString -> v.toString }
      }.getOrElse(Seq.empty)
    ScoringConfig(
      buckets = Bucket.fromConfig(buckets),
      units = scoring.get("expected_ctr_units").map(_.toString).getOrElse("fraction"),
      uplift = num(scoring, "expected_ctr_uplift", 0.0),
      margin = num(thresholds, "ctr_underperf_margin", 0.0),
      maxPosition = num(scoring, "max_position_for_ctr_eval", 5.0),
      minClicks = num(scoring, "min_clicks_for_ctr_eval", 0.0),
      intentMultipliers = intents,
      urlIntentHints = hints)
  }

  private def section(yamlText: String, name: String): Map[String, Object] = {
    val root = Option(new Yaml().load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala).getOrElse(Map.empty[String, Object])
    root.get(name).collect { case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
    }.getOrElse(Map.empty)
  }

  /** The `inputs:` section as strings — fed to the A4 resolution ladder
    * (`cfg.get("inputs", {})` in `_resolve_input_from_config`,
    * `etl_merge.py:43`). The demo config's key names (`screaming_frog`,
    * not `screaming_frog_csv`) never match the ladder's lookup keys — a
    * reference quirk (SURVEY §1.5) the ladder reproduces by falling
    * through to the defaults.
    */
  def parseInputs(yamlText: String): Map[String, String] =
    section(yamlText, "inputs").map { case (k, v) => k -> v.toString }

  /** `output.merged_csv` with the reference default (`etl_merge.py:752`). */
  def mergedCsvPath(yamlText: String): String =
    section(yamlText, "output").get("merged_csv").map(_.toString)
      .getOrElse("merged/merged_visibility.csv")
}
