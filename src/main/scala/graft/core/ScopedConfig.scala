package graft.core

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Layered configuration with per-job scoping.
  * Resolution order (reference core/config/ScopedConfig.java:80-105):
  * system property → environment variable → `.env` file → json config
  * `[activeJob]` section → `[common]` section → default.
  */
class ScopedConfig(
    jsonPath: String = "graft.json",
    envPath: String = ".env",
    env: Map[String, String] = sys.env
) extends Serializable {

  @volatile private var activeJob: Option[String] = None

  private lazy val dotEnv: Map[String, String] =
    if (!Files.exists(Paths.get(envPath))) Map.empty
    else
      Files
        .readAllLines(Paths.get(envPath))
        .asScala
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
        .map { l =>
          val i = l.indexOf('=')
          l.substring(0, i).trim -> l.substring(i + 1).trim
        }
        .toMap

  private lazy val jsonConf: Map[String, Map[String, String]] =
    if (!Files.exists(Paths.get(jsonPath))) Map.empty
    else {
      val root = new ObjectMapper().readTree(Files.readString(Paths.get(jsonPath)))
      root
        .properties()
        .asScala
        .map { e =>
          val section = e.getValue
            .properties()
            .asScala
            .map(f => f.getKey -> (if (f.getValue.isValueNode) f.getValue.asText else f.getValue.toString))
            .toMap
          e.getKey -> section
        }
        .toMap
    }

  def activateJob(name: String): Unit = { activeJob = Some(name) }

  def resolve(key: String): Option[String] =
    sys.props
      .get(key)
      .orElse(env.get(key))
      .orElse(dotEnv.get(key))
      .orElse(activeJob.flatMap(j => jsonConf.get(j)).flatMap(_.get(key)))
      .orElse(jsonConf.get("common").flatMap(_.get(key)))

  def require(key: String): String =
    resolve(key).getOrElse(throw new IllegalArgumentException(s"missing required config: $key"))

  def getOrDefault(key: String, default: String): String = resolve(key).getOrElse(default)

  def getGlobalOrDefault(key: String, default: String): String =
    sys.props
      .get(key)
      .orElse(env.get(key))
      .orElse(dotEnv.get(key))
      .orElse(jsonConf.get("common").flatMap(_.get(key)))
      .getOrElse(default)
}
