package graft.ingest

/** S20: structured JSON logging — the reference's `pkg/customLogger/
  * logger.go:9-50` emits `{"status":…,"message":…,"description":…}` lines
  * to stdout/stderr with levels Error/Info/Warning/Debug and an env-gated
  * debug level (`prepare-functions.go:30-35`). Same contract here, with
  * proper JSON escaping (jackson) rather than hand-concatenation.
  *
  * For the *framework* logs (Spark's own log4j2 output) the repo ships a
  * `JsonTemplateLayout` configuration at `config/log4j2-json.properties`
  * (the layout jar is in `/opt/spark/jars`); launch with
  * `-Dlog4j2.configurationFile=config/log4j2-json.properties` to get every
  * Spark log line as JSON too. Application-level events use this object.
  */
object GraftLog {
  val ERROR = "Error"
  val INFO = "Info"
  val WARNING = "Warning"
  val DEBUG = "Debug"

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One `{status,message,description}` JSON line, like the reference's
    * `LogJSON` struct. */
  def render(status: String, message: String, description: String): String = {
    val node = mapper.createObjectNode()
    node.put("status", status)
    node.put("message", message)
    node.put("description", description)
    mapper.writeValueAsString(node)
  }

  def stdout(status: String, message: String, description: String): Unit =
    System.out.println(render(status, message, description))

  def stderr(status: String, message: String, description: String): Unit =
    System.err.println(render(status, message, description))

  def info(message: String, description: String = ""): Unit =
    stdout(INFO, message, description)
  def warn(message: String, description: String = ""): Unit =
    stdout(WARNING, message, description)
  def error(message: String, description: String = ""): Unit =
    stderr(ERROR, message, description)

  /** Debug lines are emitted only when `Debug=true` in the environment —
    * the reference's `isDebugMode` gate. */
  def debug(message: String, description: String = ""): Unit =
    if (Pipeline.debugMode) stdout(DEBUG, message, description)
}
