package graft.types

/** Typed error hierarchy with JSON-safe serialization
  * (reference: README.md:326-446). Multi-error types collect every issue
  * into one exception (never fail-fast).
  */
sealed abstract class MultiDbError(val code: String, message: String)
    extends RuntimeException(message) {

  def detailsJson: Map[String, Any] = Map.empty

  /** Plain-map serialization safe for JSON transports/loggers. */
  def toJson: Map[String, Any] = {
    val base = Map[String, Any]("code" -> code, "message" -> getMessage)
    val cause = Option(getCause)
      .map(c => Map[String, Any]("cause" -> c.getMessage))
      .getOrElse(Map.empty[String, Any])
    base ++ detailsJson ++ cause
  }
}

final case class ConfigIssue(
    code: String, // INVALID_API_NAME | DUPLICATE_API_NAME | INVALID_REFERENCE | INVALID_RELATION | INVALID_SYNC | INVALID_CACHE
    message: String,
    details: Map[String, String] = Map.empty,
)

final case class ConfigError(errors: Seq[ConfigIssue])
    extends MultiDbError("CONFIG_INVALID", s"Config invalid: ${errors.size} errors") {
  override def detailsJson: Map[String, Any] =
    Map("errors" -> errors.map(e =>
      Map("code" -> e.code, "message" -> e.message, "details" -> e.details)))
}

final case class ValidationIssue(
    code: String, // UNKNOWN_TABLE | UNKNOWN_COLUMN | UNKNOWN_ROLE | ACCESS_DENIED | INVALID_FILTER | INVALID_VALUE | INVALID_JOIN | INVALID_GROUP_BY | INVALID_HAVING | INVALID_ORDER_BY | INVALID_BY_IDS | INVALID_LIMIT | INVALID_EXISTS | INVALID_AGGREGATION
    message: String,
    details: Map[String, Any] = Map.empty, // table/column/role/alias/operator/refColumn/refTable/filterIndex/expected/actual
)

final case class ValidationError(fromTable: String, errors: Seq[ValidationIssue])
    extends MultiDbError("VALIDATION_FAILED", s"Validation failed: ${errors.size} errors") {
  override def detailsJson: Map[String, Any] = Map(
    "fromTable" -> fromTable,
    "errors" -> errors.map(e =>
      Map("code" -> e.code, "message" -> e.message, "details" -> e.details)))
}

final case class PlannerError(
    override val code: String, // UNREACHABLE_TABLES | TRINO_DISABLED | NO_CATALOG | FRESHNESS_UNMET
    fromTable: String,
    details: Map[String, Any] = Map.empty,
) extends MultiDbError(code, s"Planning failed ($code) for query from '$fromTable'") {
  override def detailsJson: Map[String, Any] =
    Map("fromTable" -> fromTable, "details" -> (details + ("code" -> code)))
}

final case class ExecutionError(
    override val code: String, // EXECUTOR_MISSING | CACHE_PROVIDER_MISSING | QUERY_FAILED | QUERY_TIMEOUT
    details: Map[String, Any] = Map.empty,
    causeOpt: Option[Throwable] = None,
) extends MultiDbError(code, s"Execution failed: $code") {
  causeOpt.foreach(initCause)
  override def detailsJson: Map[String, Any] =
    Map("details" -> (details + ("code" -> code)))
}

final case class ConnectionError(
    override val code: String, // CONNECTION_FAILED | NETWORK_ERROR | REQUEST_TIMEOUT
    details: Map[String, Any] = Map.empty,
) extends MultiDbError(code, s"Connection failed: $code") {
  override def detailsJson: Map[String, Any] = Map("details" -> details)
}

final case class ProviderError(
    override val code: String, // METADATA_LOAD_FAILED | ROLE_LOAD_FAILED
    provider: String,          // metadata | role
    causeOpt: Option[Throwable] = None,
) extends MultiDbError(code, s"Provider load failed: $provider") {
  causeOpt.foreach(initCause)
  override def detailsJson: Map[String, Any] = Map("details" -> Map("provider" -> provider))
}
