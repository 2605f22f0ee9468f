package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.types._

/** HTTP surface over a MultiDb instance (reference: HTTP_CLIENT.md):
  * `POST /query`, `GET /health`, `POST /validate/query` (zero-I/O), with
  * error status mapping Validation/Config→400, Planner→422, Execution→500,
  * Connection/Provider→503 and `toJSON` bodies so clients can reconstruct
  * typed errors from `code`. Zero dependencies: the JDK's HttpServer.
  */
final class MultiDbHttpServer(db: MultiDb, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def start(): Int = {
    server.createContext("/query", (ex: HttpExchange) => handle(ex) {
      val (defn, ctx) = Json.parseQuery(readBody(ex))
      (200, Json.writeResult(db.query(defn, ctx)))
    })
    server.createContext("/health", (ex: HttpExchange) => handle(ex) {
      val h = db.healthCheck()
      val status = if (h.values.forall(identity)) 200 else 503
      (status, Json.mapper.writeValueAsString(Json.toNode(h)))
    })
    server.createContext("/validate/query", (ex: HttpExchange) => handle(ex) {
      // zero-I/O validation endpoint: runs the validator only
      val (defn, ctx) = Json.parseQuery(readBody(ex))
      db.validateOnly(defn, ctx)
      (200, """{"valid":true}""")
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def statusOf(e: MultiDbError): Int = e match {
    case _: ValidationError | _: ConfigError  => 400
    case _: PlannerError                       => 422
    case _: ExecutionError                     => 500
    case _: ConnectionError | _: ProviderError => 503
  }

  private def handle(ex: HttpExchange)(body: => (Int, String)): Unit = {
    val (status, payload) =
      try body
      catch {
        case e: MultiDbError => (statusOf(e), Json.writeError(e))
        case e: IllegalArgumentException =>
          (400, s"""{"code":"BAD_REQUEST","message":${Json.mapper.writeValueAsString(e.getMessage)}}""")
        case e: Exception =>
          (500, s"""{"code":"INTERNAL","message":${Json.mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
      }
    val bytes = payload.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}

/** Client-side error reconstruction (HTTP_CLIENT.md:78-83): rebuild typed
  * errors from the `code` field so callers can pattern-match across the
  * wire exactly as in-process.
  */
object MultiDbClient {

  def reconstructError(json: String): MultiDbError = {
    val n = Json.mapper.readTree(json)
    val code = Option(n.get("code")).map(_.asText()).getOrElse("INTERNAL")
    def issues: Seq[ValidationIssue] =
      Option(n.get("errors")).map(_.elements()).map { it =>
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map(e =>
          ValidationIssue(e.get("code").asText(), e.get("message").asText())).toSeq
      }.getOrElse(Nil)
    code match {
      case "VALIDATION_FAILED" =>
        ValidationError(Option(n.get("fromTable")).map(_.asText()).getOrElse(""), issues)
      case "CONFIG_INVALID" =>
        ConfigError(issues.map(i => ConfigIssue(i.code, i.message)))
      case "UNREACHABLE_TABLES" | "TRINO_DISABLED" | "NO_CATALOG" | "FRESHNESS_UNMET" =>
        PlannerError(code, Option(n.get("fromTable")).map(_.asText()).getOrElse(""))
      case "EXECUTOR_MISSING" | "CACHE_PROVIDER_MISSING" | "QUERY_FAILED" | "QUERY_TIMEOUT" =>
        ExecutionError(code)
      case "METADATA_LOAD_FAILED" | "ROLE_LOAD_FAILED" =>
        ProviderError(code, "metadata")
      case other => ConnectionError(other)
    }
  }
}
