package graft.operators

import java.io.FileInputStream
import java.nio.file.{Files, Paths}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Layered key-value configuration (reference
  * `src/main/utility/config_loader.py`: base YAML + environment
  * overlay + process env).
  *
  * Resolution order (later wins):
  *   1. `base.properties`
  *   2. `<env>.properties` (e.g. dev/prod overlay)
  *   3. process environment variables prefixed `GRAFT_`
  *      (`GRAFT_PATHS_BRONZE` overrides key `paths.bronze`).
  *
  * Dotted keys replace the reference's nested-dict access; no YAML
  * dependency needed (zero-egress build).
  */
final class GraftConfig private (values: Map[String, String]) {
  def get(key: String): Option[String] = values.get(key)
  def apply(key: String): String =
    values.getOrElse(key, throw new NoSuchElementException(s"config key not found: $key"))
  def getOrElse(key: String, default: String): String = values.getOrElse(key, default)
  def keys: Set[String] = values.keySet
}

object GraftConfig {
  def load(configDir: String, env: String = sys.env.getOrElse("GRAFT_ENV", "dev"),
           processEnv: Map[String, String] = sys.env): GraftConfig = {
    def props(name: String): Map[String, String] = {
      val p = Paths.get(configDir, s"$name.properties")
      if (!Files.exists(p)) Map.empty
      else {
        val pr = new Properties()
        val in = new FileInputStream(p.toFile)
        try pr.load(in) finally in.close()
        pr.asScala.toMap
      }
    }
    val fromEnv = processEnv.collect {
      case (k, v) if k.startsWith("GRAFT_") && k != "GRAFT_ENV" =>
        k.stripPrefix("GRAFT_").toLowerCase.replace('_', '.') -> v
    }
    new GraftConfig(props("base") ++ props(env) ++ fromEnv)
  }
}
