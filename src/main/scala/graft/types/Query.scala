package graft.types

/** Typed query-definition DSL — the engine's sole query surface (no SQL
  * parser by design). Mirrors the reference DSL semantics
  * (reference: QUERY.md:8-112) re-expressed as Scala ADTs.
  */
sealed trait QueryFilterNode

/** Column-vs-literal predicate. `table` omitted = `from` table, except inside
  * QueryJoin.filters where it defaults to the joined table (QUERY.md:54-66).
  */
final case class QueryFilter(
    column: String,
    operator: String,
    value: Option[Any] = None,
    table: Option[String] = None,
) extends QueryFilterNode

/** Column-vs-column comparison (QUERY.md:85-91). */
final case class QueryColumnFilter(
    column: String,
    operator: String,
    refColumn: String,
    table: Option[String] = None,
    refTable: Option[String] = None,
) extends QueryFilterNode

/** Recursive and/or group, optionally negated (QUERY.md:93-97). */
final case class QueryFilterGroup(
    logic: String, // "and" | "or"
    conditions: Seq[QueryFilterNode],
    not: Boolean = false,
) extends QueryFilterNode

/** EXISTS / NOT EXISTS / counted correlated subquery on a related table
  * (QUERY.md:99-112). `exists` ignored when `count` present.
  */
final case class QueryExistsFilter(
    table: String,
    exists: Boolean = true,
    filters: Seq[QueryFilterNode] = Nil,
    count: Option[CountCond] = None,
) extends QueryFilterNode

final case class CountCond(operator: String, value: Long)

final case class QueryAggregation(
    column: String, // apiName or "*" for count(*)
    fn: String,     // count | sum | avg | min | max
    alias: String,
    table: Option[String] = None,
)

final case class QueryOrderBy(
    column: String,
    direction: String = "asc", // asc | desc
    table: Option[String] = None,
)

final case class QueryGroupBy(column: String, table: Option[String] = None)

final case class QueryJoin(
    table: String,
    joinType: String = "left", // inner | left
    columns: Option[Seq[String]] = None, // None = all allowed; Some(Nil) = none
    filters: Seq[QueryFilterNode] = Nil,
)

final case class QueryDefinition(
    from: String,
    columns: Option[Seq[String]] = None,
    distinct: Boolean = false,
    filters: Seq[QueryFilterNode] = Nil,
    joins: Seq[QueryJoin] = Nil,
    groupBy: Seq[QueryGroupBy] = Nil,
    aggregations: Seq[QueryAggregation] = Nil,
    having: Seq[QueryFilterNode] = Nil,
    limit: Option[Long] = None,
    offset: Option[Long] = None,
    orderBy: Seq[QueryOrderBy] = Nil,
    freshness: Option[String] = None, // realtime | seconds | minutes | hours
    byIds: Option[Seq[Any]] = None,
    executeMode: String = "execute", // sql-only | execute | count
    debug: Boolean = false,
)

/** Scoped role lists; union within a scope, intersection between scopes.
  * `None` scope = unrestricted; `Some(Nil)` = zero permissions (QUERY.md:118-126).
  */
final case class ExecutionContext(
    userRoles: Option[Seq[String]] = None,
    serviceRoles: Option[Seq[String]] = None,
)

// ---------------------------------------------------------------------------
// Results (QUERY.md:128-191)
// ---------------------------------------------------------------------------

final case class ResultColumnMeta(
    apiName: String,
    columnType: String,
    nullable: Boolean,
    fromTable: String,
    masked: Boolean,
)

final case class TableUsed(
    tableId: String,
    source: String, // original | materialized | cache
    database: String,
    physicalName: String,
)

final case class Timing(
    planningMs: Long,
    generationMs: Long,
    executionMs: Option[Long],
)

final case class QueryResultMeta(
    strategy: String, // direct | cache | materialized | trino-cross-db
    targetDatabase: String,
    dialect: Option[String],
    tablesUsed: Seq[TableUsed],
    columns: Seq[ResultColumnMeta],
    timing: Timing,
)

final case class DebugLogEntry(
    timestamp: Long,
    phase: String,
    message: String,
    details: Option[String] = None,
)

sealed trait QueryResult {
  def meta: QueryResultMeta
  def debugLog: Option[Seq[DebugLogEntry]]
}

final case class SqlResult(
    sql: String,
    params: Seq[Any],
    meta: QueryResultMeta,
    debugLog: Option[Seq[DebugLogEntry]] = None,
) extends QueryResult

final case class DataResult(
    data: Seq[Map[String, Any]],
    meta: QueryResultMeta,
    debugLog: Option[Seq[DebugLogEntry]] = None,
) extends QueryResult

final case class CountResult(
    count: Long,
    meta: QueryResultMeta,
    debugLog: Option[Seq[DebugLogEntry]] = None,
) extends QueryResult

/** Per-component health probe result (reference C1302: healthy + latency,
  * plus the failure message when unhealthy).
  */
final case class ComponentHealth(
    healthy: Boolean,
    latencyMs: Long,
    error: Option[String] = None,
)

/** Contract-shaped health report (reference C1300-C1304). */
final case class HealthCheckResult(
    healthy: Boolean,
    executors: Map[String, ComponentHealth],
    cacheProviders: Map[String, ComponentHealth],
)
