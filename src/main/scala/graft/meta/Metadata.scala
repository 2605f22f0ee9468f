package graft.meta

import graft.types.{ConfigError, ConfigIssue}

/** Metadata model + registration-time validation + O(1) index
  * (reference: METADATA.md:8-159, README.md:338-347, 420-431).
  */
final case class DatabaseMeta(
    id: String,
    engine: String, // postgres | clickhouse | iceberg
    trinoCatalog: Option[String] = None,
)

final case class ColumnMeta(
    apiName: String,
    physicalName: String,
    columnType: String, // string int decimal boolean uuid date timestamp + "[]" forms
    nullable: Boolean = false,
    maskingFn: Option[String] = None, // email phone name uuid number date full
)

final case class RelationMeta(
    column: String, // FK column apiName on this table
    refTable: String,
    refColumn: String,
    relationType: String = "many-to-one", // many-to-one | one-to-many | one-to-one
)

final case class TableMeta(
    id: String,
    apiName: String,
    database: String,
    physicalName: String,
    columns: Seq[ColumnMeta],
    primaryKey: Seq[String] = Nil,
    relations: Seq[RelationMeta] = Nil,
)

/** CDC-style replica: the same logical table materialized in another DB
  * with a sync lag (METADATA.md:63-70).
  */
final case class ExternalSync(
    sourceTable: String, // table id
    targetDatabase: String,
    targetPhysicalName: String,
    method: String = "debezium",
    estimatedLag: String = "seconds", // seconds | minutes | hours
)

final case class CachedTableMeta(
    tableId: String,
    keyPattern: String, // e.g. "users:{id}"
    columns: Option[Seq[String]] = None, // None = all
)

final case class CacheMeta(
    id: String,
    engine: String = "redis",
    tables: Seq[CachedTableMeta] = Nil,
)

final case class MetadataConfig(
    databases: Seq[DatabaseMeta],
    tables: Seq[TableMeta],
    syncs: Seq[ExternalSync] = Nil,
    caches: Seq[CacheMeta] = Nil,
    trinoEnabled: Boolean = false,
)

final case class TableRoleAccess(
    tableId: String,
    allowedColumns: Option[Seq[String]], // None = '*'
    maskedColumns: Seq[String] = Nil,
)

final case class RoleMeta(
    id: String,
    tables: Option[Seq[TableRoleAccess]], // None = '*' (all tables, no masking)
)

object ApiName {
  private val Format = "^[a-z][a-zA-Z0-9]*$".r
  val Reserved: Set[String] = Set(
    "from", "select", "where", "having", "limit", "offset", "order", "group",
    "join", "distinct", "exists", "null", "true", "false", "and", "or", "not",
    "in", "like", "as", "on", "by", "asc", "desc", "count", "sum", "avg",
    "min", "max")

  def isValid(name: String): Boolean =
    name.length >= 1 && name.length <= 64 &&
      Format.matches(name) && !Reserved.contains(name)
}

object ColumnTypes {
  val Scalars: Set[String] =
    Set("string", "int", "decimal", "boolean", "uuid", "date", "timestamp")

  def isArray(t: String): Boolean = t.endsWith("[]")
  def elementType(t: String): String = t.stripSuffix("[]")
  def isValid(t: String): Boolean =
    Scalars.contains(t) || (isArray(t) && Scalars.contains(elementType(t)))
  def isOrderable(t: String): Boolean =
    Set("string", "int", "decimal", "date", "timestamp").contains(t)
  def family(t: String): String = t match {
    case "int" | "decimal"      => "numeric"
    case "date" | "timestamp"   => "temporal"
    case other                  => other
  }
}

/** Freshness hierarchy: realtime < seconds < minutes < hours (README.md:249-256). */
object Freshness {
  private val order = Map("realtime" -> 0, "seconds" -> 1, "minutes" -> 2, "hours" -> 3)
  def rank(f: String): Int = order.getOrElse(f, Int.MaxValue)
  /** A replica with `lag` satisfies required freshness `req` iff lag ≤ req
    * and req is not realtime (replicas are never realtime). */
  def lagSatisfies(lag: String, req: String): Boolean =
    rank(req) > 0 && rank(lag) <= rank(req)
}

/** Immutable O(1) lookup index over a validated config (README.md:152-158).
  * Rebuilt atomically on reload; in-flight queries keep their snapshot.
  */
final class MetadataIndex private (
    val config: MetadataConfig,
    val databasesById: Map[String, DatabaseMeta],
    val tablesById: Map[String, TableMeta],
    val tablesByApi: Map[String, TableMeta],
    val columnsByTable: Map[String, Map[String, ColumnMeta]],
    val syncsBySource: Map[String, Seq[ExternalSync]],
    val cachesByTable: Map[String, Seq[(CacheMeta, CachedTableMeta)]],
) {
  /** Bidirectional relation lookup: relation from `a` to `b` declared on
    * either side (METADATA.md:50-58). Returns (fkColumn on a, pkColumn on b)
    * as apiNames when found.
    */
  def relationBetween(a: String, b: String): Option[(String, String)] = {
    val ta = tablesByApi.get(a)
    val tb = tablesByApi.get(b)
    val fwd = ta.flatMap(_.relations.find(_.refTable == b)
      .map(r => (r.column, r.refColumn)))
    lazy val bwd = tb.flatMap(_.relations.find(_.refTable == a)
      .map(r => (r.refColumn, r.column))) // flipped: FK lives on b
    fwd.orElse(bwd)
  }

  def column(tableApi: String, colApi: String): Option[ColumnMeta] =
    columnsByTable.get(tableApi).flatMap(_.get(colApi))
}

object MetadataIndex {

  /** Validate a config and build the index. Collects ALL issues into one
    * ConfigError (reference: validateConfig, README.md:338-347).
    */
  def build(config: MetadataConfig): MetadataIndex = {
    val errors = validate(config)
    if (errors.nonEmpty) throw ConfigError(errors)
    val colsByTable = config.tables
      .map(t => t.apiName -> t.columns.map(c => c.apiName -> c).toMap).toMap
    new MetadataIndex(
      config,
      config.databases.map(d => d.id -> d).toMap,
      config.tables.map(t => t.id -> t).toMap,
      config.tables.map(t => t.apiName -> t).toMap,
      colsByTable,
      config.syncs.groupBy(_.sourceTable),
      config.caches
        .flatMap(c => c.tables.map(ct => ct.tableId -> (c, ct)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) },
    )
  }

  def validate(config: MetadataConfig): Seq[ConfigIssue] = {
    val errs = Seq.newBuilder[ConfigIssue]
    def err(code: String, msg: String, details: (String, String)*): Unit =
      errs += ConfigIssue(code, msg, details.toMap)

    val dbIds = config.databases.map(_.id).toSet
    val tableIds = config.tables.map(_.id).toSet
    val tablesByApi = config.tables.groupBy(_.apiName)

    // apiName format + uniqueness
    config.tables.foreach { t =>
      if (!ApiName.isValid(t.apiName))
        err("INVALID_API_NAME", s"invalid table apiName '${t.apiName}'",
          "entity" -> t.id, "field" -> "apiName", "actual" -> t.apiName)
      t.columns.groupBy(_.apiName).foreach { case (api, cols) =>
        if (cols.size > 1)
          err("DUPLICATE_API_NAME", s"duplicate column apiName '$api' in '${t.apiName}'",
            "entity" -> t.id, "field" -> api)
      }
      t.columns.foreach { c =>
        if (!ApiName.isValid(c.apiName))
          err("INVALID_API_NAME", s"invalid column apiName '${c.apiName}' in '${t.apiName}'",
            "entity" -> t.id, "field" -> c.apiName, "actual" -> c.apiName)
        if (!ColumnTypes.isValid(c.columnType))
          err("INVALID_REFERENCE", s"invalid type '${c.columnType}' on '${t.apiName}.${c.apiName}'",
            "entity" -> t.id, "field" -> c.apiName, "actual" -> c.columnType)
      }
      if (!dbIds.contains(t.database))
        err("INVALID_REFERENCE", s"table '${t.apiName}' references unknown database '${t.database}'",
          "entity" -> t.id, "database" -> t.database)
      t.primaryKey.foreach { pk =>
        if (!t.columns.exists(_.apiName == pk))
          err("INVALID_REFERENCE", s"primary key '$pk' not a column of '${t.apiName}'",
            "entity" -> t.id, "field" -> pk)
      }
    }
    tablesByApi.foreach { case (api, ts) =>
      if (ts.size > 1)
        err("DUPLICATE_API_NAME", s"duplicate table apiName '$api'", "field" -> api)
    }

    // relations
    config.tables.foreach { t =>
      t.relations.foreach { r =>
        val target = tablesByApi.get(r.refTable).flatMap(_.headOption)
        if (!t.columns.exists(_.apiName == r.column))
          err("INVALID_RELATION", s"relation column '${r.column}' not in '${t.apiName}'",
            "entity" -> t.id, "field" -> r.column)
        if (target.isEmpty)
          err("INVALID_RELATION", s"relation target table '${r.refTable}' not found",
            "entity" -> t.id, "field" -> r.refTable)
        else if (!target.get.columns.exists(_.apiName == r.refColumn))
          err("INVALID_RELATION", s"relation target column '${r.refTable}.${r.refColumn}' not found",
            "entity" -> t.id, "field" -> r.refColumn)
      }
    }

    // syncs
    config.syncs.foreach { s =>
      if (!tableIds.contains(s.sourceTable))
        err("INVALID_SYNC", s"sync source table '${s.sourceTable}' not found",
          "entity" -> s.sourceTable, "database" -> s.targetDatabase)
      if (!dbIds.contains(s.targetDatabase))
        err("INVALID_SYNC", s"sync target database '${s.targetDatabase}' not found",
          "entity" -> s.sourceTable, "database" -> s.targetDatabase)
    }

    // caches
    config.caches.foreach { c =>
      c.tables.foreach { ct =>
        config.tables.find(_.id == ct.tableId) match {
          case None =>
            err("INVALID_CACHE", s"cache '${c.id}' references unknown table '${ct.tableId}'",
              "cacheId" -> c.id)
          case Some(t) =>
            ct.columns.getOrElse(Nil).foreach { colApi =>
              if (!t.columns.exists(_.apiName == colApi))
                err("INVALID_CACHE", s"cache '${c.id}' references unknown column '${colApi}' of '${t.apiName}'",
                  "cacheId" -> c.id, "field" -> colApi)
            }
        }
      }
    }
    errs.result()
  }
}
