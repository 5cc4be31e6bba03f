package graft.config

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Environment target profiles — the analog of the reference bundle's
  * `targets:` section (`config/databricks.yml:31-49`): named per-environment
  * overlays (dev/prod/...) of the pipeline variables, one marked
  * `default: true`.
  *
  * JSON shape (`dp_targets.json`, kept next to the job like the bundle
  * YAML — NOT under `source_location`, which is itself a per-target
  * variable):
  * {{{
  * { "dev":  { "default": true,
  *             "variables": { "source_location": "/data/dev/raw",
  *                            "catalog_name": "dev_catalog" } },
  *   "prod": { "variables": { "source_location": "/data/prod/raw",
  *                            "catalog_name": "prod_catalog" } } }
  * }}}
  *
  * Precedence mirrors the bundle: the selected target's variables are the
  * environment's values, but anything passed explicitly on the command
  * line (`--conf spark.catalog_name=...`) wins — [[applyTo]] only fills
  * keys the session conf doesn't already carry. Config is driver-side
  * metadata; nothing here touches executors.
  */
object TargetProfiles {

  final case class Profile(name: String, default: Boolean,
      variables: Map[String, String])

  def load(spark: SparkSession, path: String): Map[String, Profile] =
    parse(ConfigLoader.readText(spark, path))

  def parse(jsonText: String): Map[String, Profile] =
    JsonMethods.parse(jsonText) match {
      case JObject(targets) =>
        targets.map { case JField(name, body) =>
          val fields = body match {
            case JObject(fs) => fs.toMap
            case _ => throw new IllegalArgumentException(
              s"target '$name' must be a JSON object")
          }
          // accept the stringified boolean too — the same YAML-to-JSON
          // tolerance the variables map has; a string-flagged default
          // silently selecting the wrong environment is the bug this
          // module exists to prevent
          val default = fields.get("default").exists {
            case JBool(b) => b
            case JString(s) => s.equalsIgnoreCase("true")
            case _ => false
          }
          val vars = fields.get("variables") match {
            case Some(JObject(vs)) =>
              // scalar values stringify (YAML-ish configs write bare
              // booleans/ints); nested values fail LOUD — silently
              // dropping a variable is the silently-wrong-environment
              // bug this module exists to prevent
              vs.map {
                case JField(k, JString(v)) => k -> v
                case JField(k, JBool(v)) => k -> v.toString
                case JField(k, JInt(v)) => k -> v.toString
                case JField(k, JLong(v)) => k -> v.toString
                case JField(k, JDouble(v)) => k -> v.toString
                case JField(k, v) => throw new IllegalArgumentException(
                  s"target '$name'.variables.$k must be a scalar, got $v")
              }.toMap
            case None => Map.empty[String, String]
            case _ => throw new IllegalArgumentException(
              s"target '$name'.variables must be a string-valued object")
          }
          name -> Profile(name, default, vars)
        }.toMap
      case _ => throw new IllegalArgumentException(
        "targets file must be a JSON object keyed by target name")
    }

  /** Select by name, or the single `default: true` profile when no name is
    * given. Fails loud on unknown names and ambiguous/missing defaults —
    * a silently-wrong environment is the one config bug that destroys
    * production data. */
  def select(profiles: Map[String, Profile], name: Option[String]): Profile =
    name match {
      case Some(n) => profiles.getOrElse(n, throw new IllegalArgumentException(
        s"unknown target '$n' (have: ${profiles.keys.toSeq.sorted.mkString(", ")})"))
      case None =>
        profiles.values.filter(_.default).toSeq match {
          case Seq(p) => p
          case Seq() => throw new IllegalArgumentException(
            "no target named and none marked \"default\": true")
          case many => throw new IllegalArgumentException(
            s"multiple default targets: ${many.map(_.name).sorted.mkString(", ")}")
        }
    }

  /** Overlay the profile's variables onto the session conf so
    * [[PipelineParams.fromConf]] sees them — skipping any key the caller
    * already set explicitly (as `spark.<key>`, the CLI spelling). */
  def applyTo(spark: SparkSession, profile: Profile): Unit =
    profile.variables.foreach { case (k, v) =>
      if (spark.conf.getOption(s"spark.$k").isEmpty &&
          spark.conf.getOption(k).isEmpty)
        spark.conf.set(k, v)
    }
}
