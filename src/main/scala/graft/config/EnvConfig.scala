package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * Environment-based remote configuration — the reference's documented
 * remote-mode entry point (`remote_downloader.py:742-799`):
 *
 *  - `ERA_BASE_URL`     — base URL for era files (required for env mode)
 *  - `ERA_DOWNLOAD_DIR` — local download/cache directory (optional)
 *  - a `.env` file in the working directory supplies `KEY=VALUE` defaults;
 *    the real process environment always wins (load_env_file semantics:
 *    "only set if not already in environment").
 *
 * The `.env` path is overridable with the `graft.env.file` system property
 * (tests point it at a temp file — a JVM cannot mutate its own env).
 */
object EnvConfig {

  val BaseUrlKey = "ERA_BASE_URL"
  val DownloadDirKey = "ERA_DOWNLOAD_DIR"

  private def envFilePath: String =
    sys.props.getOrElse("graft.env.file", ".env")

  /** KEY=VALUE lines; blank lines and `#` comments ignored; first `=` splits
    * (values may contain `=`). */
  private[config] def parseEnvFile(path: String): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    Files.readAllLines(p).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> unquote(l.substring(i + 1).trim)
      }
      .toMap
  }

  /** `KEY="value"` / `KEY='value'` dotenv quoting → bare value. */
  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** Effective config: `.env` file defaults overridden by the process env. */
  def all: Map[String, String] = parseEnvFile(envFilePath) ++ sys.env

  def get(key: String): Option[String] = all.get(key).filter(_.nonEmpty)
}
