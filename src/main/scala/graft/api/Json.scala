package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._
import graft.types._

/** JSON codec for the HTTP surface (reference: HTTP_CLIENT.md). Hand-rolled
  * over jackson's tree model (already on the Spark classpath) — the wire
  * shapes are the contract's: `{definition, context}` in,
  * kind-discriminated results out, ISO-8601 timestamps, booleans as
  * true/false (CONTRACT_TESTS.md:1175-1177).
  */
object Json {

  val mapper = new ObjectMapper()

  // ---------------- request parsing ----------------

  def parseQuery(body: String): (QueryDefinition, ExecutionContext) = {
    val root = mapper.readTree(body)
    val defn = Option(root.get("definition"))
      .getOrElse(throw new IllegalArgumentException("missing 'definition'"))
    (parseDefinition(defn), parseContext(Option(root.get("context"))))
  }

  def parseContext(node: Option[JsonNode]): ExecutionContext = node match {
    case None => ExecutionContext()
    case Some(n) =>
      val roles = Option(n.get("roles"))
      def scope(name: String): Option[Seq[String]] =
        roles.flatMap(r => Option(r.get(name)))
          .map(_.elements().asScala.map(_.asText()).toSeq)
      ExecutionContext(userRoles = scope("user"), serviceRoles = scope("service"))
  }

  /** Runtime type guard at the wire boundary: Jackson's asLong()/asInt()
    * silently TRUNCATE fractional JSON numbers (2.5 → 2), so a raw payload
    * could smuggle a non-integer past the typed DSL (the reference requires
    * runtime validation of exactly these fields — CONTRACT_TESTS.md §16.1
    * preamble; C933/C998/C1012). Reject with the contract's error code.
    */
  private def strictIntegral(v: JsonNode, from: String, code: String, field: String): Long =
    if (v.isIntegralNumber) v.asLong()
    // 2.0 is an integer to JS (`Number.isInteger(2.0)===true`) — the reference
    // cannot even distinguish it from 2, so accept mathematically-integral
    // floats and reject only true fractions like 2.5.
    else if (v.isNumber && v.canConvertToExactIntegral) v.asLong()
    else throw ValidationError(from, Seq(ValidationIssue(code,
      s"'$field' must be an integer", Map("actual" -> v.toString))))

  def parseDefinition(n: JsonNode): QueryDefinition = {
    def strSeq(field: String): Option[Seq[String]] =
      Option(n.get(field)).map(_.elements().asScala.map(_.asText()).toSeq)
    val from = Option(n.get("from")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException("missing 'from'"))
    QueryDefinition(
      from = from,
      columns = strSeq("columns"),
      distinct = Option(n.get("distinct")).exists(_.asBoolean()),
      filters = Option(n.get("filters")).map(parseFilters(_, from)).getOrElse(Nil),
      joins = Option(n.get("joins")).map(_.elements().asScala.map(parseJoin(_, from)).toSeq)
        .getOrElse(Nil),
      groupBy = Option(n.get("groupBy")).map(_.elements().asScala.map(g =>
        QueryGroupBy(g.get("column").asText(), optText(g, "table"))).toSeq).getOrElse(Nil),
      aggregations = Option(n.get("aggregations")).map(_.elements().asScala.map(a =>
        QueryAggregation(a.get("column").asText(), text(a, "fn"),
          text(a, "alias"), optText(a, "table"))).toSeq).getOrElse(Nil),
      having = Option(n.get("having")).map(parseFilters(_, from)).getOrElse(Nil),
      limit = Option(n.get("limit")).map(strictIntegral(_, from, "INVALID_LIMIT", "limit")),
      offset = Option(n.get("offset")).map(strictIntegral(_, from, "INVALID_LIMIT", "offset")),
      orderBy = Option(n.get("orderBy")).map(_.elements().asScala.map(o =>
        QueryOrderBy(o.get("column").asText(),
          Option(o.get("direction")).map(_.asText()).getOrElse("asc"),
          optText(o, "table"))).toSeq).getOrElse(Nil),
      freshness = optText(n, "freshness"),
      byIds = Option(n.get("byIds"))
        .map(_.elements().asScala.map(jsonValue).toSeq),
      executeMode = Option(n.get("executeMode")).map(_.asText()).getOrElse("execute"),
      debug = Option(n.get("debug")).exists(_.asBoolean()),
    )
  }

  private def text(n: JsonNode, f: String): String =
    Option(n.get(f)).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(s"missing '$f'"))
  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText())

  def parseFilters(arr: JsonNode, from: String = ""): Seq[QueryFilterNode] =
    arr.elements().asScala.map(parseFilterNode(_, from)).toSeq

  /** Discriminate the 4 filter-node shapes the way the reference does:
    * conditions → group; refColumn → column filter; operator+column →
    * scalar filter; bare table → EXISTS.
    */
  def parseFilterNode(n: JsonNode, from: String = ""): QueryFilterNode =
    if (n.has("conditions"))
      QueryFilterGroup(text(n, "logic"), parseFilters(n.get("conditions"), from),
        Option(n.get("not")).exists(_.asBoolean()))
    else if (n.has("refColumn"))
      QueryColumnFilter(text(n, "column"), text(n, "operator"),
        text(n, "refColumn"), optText(n, "table"), optText(n, "refTable"))
    else if (n.has("column")) {
      val op = text(n, "operator")
      val value: Option[Any] = Option(n.get("value")).filterNot(_.isNull).map { v =>
        op match {
          case "between" | "notBetween" =>
            (nullableJsonValue(v.get("from")), nullableJsonValue(v.get("to")))
          case "levenshteinLte" =>
            val t = Option(v.get("text")).filterNot(_.isNull).map(_.asText())
              .getOrElse(throw ValidationError(from, Seq(ValidationIssue(
                "INVALID_VALUE", "levenshteinLte requires 'text'"))))
            val d = Option(v.get("maxDistance")).getOrElse(
              throw ValidationError(from, Seq(ValidationIssue(
                "INVALID_VALUE", "levenshteinLte requires 'maxDistance'"))))
            (t, strictIntegral(d, from, "INVALID_VALUE", "maxDistance").toInt)
          case _ => jsonValue(v)
        }
      }
      QueryFilter(text(n, "column"), op, value, optText(n, "table"))
    } else
      QueryExistsFilter(
        text(n, "table"),
        exists = Option(n.get("exists")).forall(_.asBoolean()),
        filters = Option(n.get("filters")).map(parseFilters(_, from)).getOrElse(Nil),
        count = Option(n.get("count")).map(c =>
          CountCond(text(c, "operator"),
            strictIntegral(c.get("value"), from, "INVALID_EXISTS", "count.value"))))

  def parseJoin(n: JsonNode, from: String = ""): QueryJoin = QueryJoin(
    text(n, "table"),
    joinType = Option(n.get("type")).map(_.asText()).getOrElse("left"),
    columns = Option(n.get("columns"))
      .map(_.elements().asScala.map(_.asText()).toSeq),
    filters = Option(n.get("filters")).map(parseFilters(_, from)).getOrElse(Nil))

  private def nullableJsonValue(n: JsonNode): Any =
    if (n == null || n.isNull) null else jsonValue(n)

  def jsonValue(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isBigDecimal) n.decimalValue() // exactMapper parse path
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isArray) n.elements().asScala.map(jsonValue).toSeq
    else n.asText()

  // ---------------- config parsing (/validate/config) ----------------

  private def arr(n: JsonNode, f: String): Seq[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Nil)

  def parseMetadataConfig(n: JsonNode): graft.meta.MetadataConfig = {
    import graft.meta._
    MetadataConfig(
      databases = arr(n, "databases").map(d =>
        DatabaseMeta(text(d, "id"), text(d, "engine"), optText(d, "trinoCatalog"))),
      tables = arr(n, "tables").map { t =>
        TableMeta(
          text(t, "id"), text(t, "apiName"), text(t, "database"), text(t, "physicalName"),
          arr(t, "columns").map(c => ColumnMeta(
            text(c, "apiName"), text(c, "physicalName"), text(c, "columnType"),
            Option(c.get("nullable")).exists(_.asBoolean()), optText(c, "maskingFn"))),
          primaryKey = arr(t, "primaryKey").map(_.asText()),
          relations = arr(t, "relations").map(r => RelationMeta(
            text(r, "column"), text(r, "refTable"), text(r, "refColumn"),
            Option(r.get("relationType")).map(_.asText()).getOrElse("many-to-one"))))
      },
      syncs = arr(n, "syncs").map(s => ExternalSync(
        text(s, "sourceTable"), text(s, "targetDatabase"), text(s, "targetPhysicalName"),
        Option(s.get("method")).map(_.asText()).getOrElse("debezium"),
        Option(s.get("estimatedLag")).map(_.asText()).getOrElse("seconds"))),
      caches = arr(n, "caches").map(c => CacheMeta(
        text(c, "id"), Option(c.get("engine")).map(_.asText()).getOrElse("redis"),
        arr(c, "tables").map(ct => CachedTableMeta(
          text(ct, "tableId"), text(ct, "keyPattern"),
          Option(ct.get("columns")).filterNot(_.isNull)
            .map(_.elements().asScala.map(_.asText()).toSeq))))),
      trinoEnabled = Option(n.get("trinoEnabled")).exists(_.asBoolean()))
  }

  def parseRoles(n: JsonNode): Seq[graft.meta.RoleMeta] = {
    import graft.meta._
    n.elements().asScala.map { r =>
      RoleMeta(text(r, "id"),
        Option(r.get("tables")).filterNot(_.isNull).map(_.elements().asScala.map { t =>
          TableRoleAccess(text(t, "tableId"),
            Option(t.get("allowedColumns")).filterNot(_.isNull)
              .map(_.elements().asScala.map(_.asText()).toSeq),
            arr(t, "maskedColumns").map(_.asText()))
        }.toSeq))
    }.toSeq
  }

  // ---------------- request writing (client side) ----------------

  /** Serialize a query request to the wire shape parseQuery accepts —
    * the client's outbound half (mirrors parseDefinition field-for-field).
    */
  def writeQueryRequest(q: QueryDefinition, ctx: ExecutionContext): String = {
    def filterNode(f: QueryFilterNode): JsonNode = f match {
      case QueryFilter(column, op, value, table) =>
        val o = mapper.createObjectNode()
        o.put("column", column); o.put("operator", op)
        value.foreach { v =>
          val vn = (op, v) match {
            case ("between" | "notBetween", (from, to)) =>
              val b = mapper.createObjectNode()
              b.set[JsonNode]("from", toNode(from)); b.set[JsonNode]("to", toNode(to)); b
            case ("levenshteinLte", (text, maxD)) =>
              val b = mapper.createObjectNode()
              b.set[JsonNode]("text", toNode(text)); b.set[JsonNode]("maxDistance", toNode(maxD)); b
            case (_, x) => toNode(x)
          }
          o.set[JsonNode]("value", vn)
        }
        table.foreach(o.put("table", _)); o
      case QueryColumnFilter(column, op, refColumn, table, refTable) =>
        val o = mapper.createObjectNode()
        o.put("column", column); o.put("operator", op); o.put("refColumn", refColumn)
        table.foreach(o.put("table", _)); refTable.foreach(o.put("refTable", _)); o
      case QueryFilterGroup(logic, conditions, not) =>
        val o = mapper.createObjectNode()
        o.put("logic", logic)
        val a = mapper.createArrayNode(); conditions.foreach(c => a.add(filterNode(c)))
        o.set[JsonNode]("conditions", a); if (not) o.put("not", true); o
      case QueryExistsFilter(table, exists, filters, count) =>
        val o = mapper.createObjectNode()
        o.put("table", table)
        if (!exists) o.put("exists", false)
        if (filters.nonEmpty) {
          val a = mapper.createArrayNode(); filters.foreach(c => a.add(filterNode(c)))
          o.set[JsonNode]("filters", a)
        }
        count.foreach { c =>
          val cn = mapper.createObjectNode()
          cn.put("operator", c.operator); cn.put("value", c.value)
          o.set[JsonNode]("count", cn)
        }
        o
    }
    val d = mapper.createObjectNode()
    d.put("from", q.from)
    q.columns.foreach { cs =>
      val a = mapper.createArrayNode(); cs.foreach(a.add); d.set[JsonNode]("columns", a)
    }
    if (q.distinct) d.put("distinct", true)
    if (q.filters.nonEmpty) {
      val a = mapper.createArrayNode(); q.filters.foreach(f => a.add(filterNode(f)))
      d.set[JsonNode]("filters", a)
    }
    if (q.joins.nonEmpty) {
      val a = mapper.createArrayNode()
      q.joins.foreach { j =>
        val o = mapper.createObjectNode()
        o.put("table", j.table); o.put("type", j.joinType)
        j.columns.foreach { cs =>
          val ca = mapper.createArrayNode(); cs.foreach(ca.add); o.set[JsonNode]("columns", ca)
        }
        if (j.filters.nonEmpty) {
          val fa = mapper.createArrayNode(); j.filters.foreach(f => fa.add(filterNode(f)))
          o.set[JsonNode]("filters", fa)
        }
        a.add(o)
      }
      d.set[JsonNode]("joins", a)
    }
    if (q.groupBy.nonEmpty) {
      val a = mapper.createArrayNode()
      q.groupBy.foreach { g =>
        val o = mapper.createObjectNode()
        o.put("column", g.column); g.table.foreach(o.put("table", _)); a.add(o)
      }
      d.set[JsonNode]("groupBy", a)
    }
    if (q.aggregations.nonEmpty) {
      val a = mapper.createArrayNode()
      q.aggregations.foreach { ag =>
        val o = mapper.createObjectNode()
        o.put("column", ag.column); o.put("fn", ag.fn); o.put("alias", ag.alias)
        ag.table.foreach(o.put("table", _)); a.add(o)
      }
      d.set[JsonNode]("aggregations", a)
    }
    if (q.having.nonEmpty) {
      val a = mapper.createArrayNode(); q.having.foreach(f => a.add(filterNode(f)))
      d.set[JsonNode]("having", a)
    }
    q.limit.foreach(d.put("limit", _))
    q.offset.foreach(d.put("offset", _))
    if (q.orderBy.nonEmpty) {
      val a = mapper.createArrayNode()
      q.orderBy.foreach { o =>
        val on = mapper.createObjectNode()
        on.put("column", o.column); on.put("direction", o.direction)
        o.table.foreach(on.put("table", _)); a.add(on)
      }
      d.set[JsonNode]("orderBy", a)
    }
    q.freshness.foreach(d.put("freshness", _))
    q.byIds.foreach { ids =>
      val a = mapper.createArrayNode(); ids.foreach(i => a.add(toNode(i)))
      d.set[JsonNode]("byIds", a)
    }
    if (q.executeMode != "execute") d.put("executeMode", q.executeMode)
    if (q.debug) d.put("debug", true)
    val root = mapper.createObjectNode()
    root.set[JsonNode]("definition", d)
    val cn = mapper.createObjectNode()
    val rn = mapper.createObjectNode()
    ctx.userRoles.foreach { rs =>
      val a = mapper.createArrayNode(); rs.foreach(a.add); rn.set[JsonNode]("user", a)
    }
    ctx.serviceRoles.foreach { rs =>
      val a = mapper.createArrayNode(); rs.foreach(a.add); rn.set[JsonNode]("service", a)
    }
    cn.set[JsonNode]("roles", rn)
    root.set[JsonNode]("context", cn)
    mapper.writeValueAsString(root)
  }

  // ---------------- result parsing (client side) ----------------

  /** Float-exact tree parser for result bodies: JSON decimals parse as
    * BigDecimal so a decimal(38,x) column survives the wire without the
    * double round-trip (>53-bit values would silently lose precision).
    */
  private val exactMapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    m
  }

  /** Reconstruct a QueryResult from a server response body — the client's
    * half of the wire contract (HTTP_CLIENT.md: "result is QueryResult",
    * same shape as in-process): columns typed `decimal` in the meta come
    * back as BigDecimal (C1708 parity), other numerics as Long/Double.
    */
  def parseResult(body: String): QueryResult = {
    val n = exactMapper.readTree(body)
    val m = n.get("meta")
    val meta = QueryResultMeta(
      text(m, "strategy"), text(m, "targetDatabase"), optText(m, "dialect"),
      arr(m, "tablesUsed").map(t => TableUsed(text(t, "tableId"),
        text(t, "source"), text(t, "database"), text(t, "physicalName"))),
      arr(m, "columns").map(c => ResultColumnMeta(text(c, "apiName"),
        text(c, "type"), c.get("nullable").asBoolean(),
        text(c, "fromTable"), c.get("masked").asBoolean())),
      Timing(m.get("timing").get("planningMs").asLong(),
        m.get("timing").get("generationMs").asLong(),
        Option(m.get("timing").get("executionMs")).map(_.asLong())))
    val decimalCols = meta.columns
      .filter(c => c.columnType == "decimal" || c.columnType == "decimal[]")
      .map(_.apiName).toSet
    // exactMapper parses every JSON float as BigDecimal; columns not declared
    // decimal must come back as Double — including elements inside arrays
    // (e.g. a double[] embedding column) so wire and in-process rows match.
    def demote(v: Any): Any = v match {
      case bd: java.math.BigDecimal => bd.doubleValue()
      case s: Seq[_] => s.map(demote)
      case x => x
    }
    // debug entries survive the wire (TESTS.md #236): same timestamp/
    // phase/message triple the server serializes
    // an explicit JSON null (NullNode) or a non-array value must parse as
    // absent, not as Some(empty log) — NullNode is non-null and size()==0
    val dbg: Option[Seq[DebugLogEntry]] =
      Option(n.get("debugLog")).filter(_.isArray).map(a =>
        (0 until a.size()).map { i =>
          val e = a.get(i)
          DebugLogEntry(e.get("timestamp").asLong(), text(e, "phase"), text(e, "message"))
        })
    text(n, "kind") match {
      case "data" => DataResult(
        arr(n, "data").map(r =>
          r.fields().asScala.map { e =>
            val v = jsonValue(e.getValue)
            e.getKey -> (if (decimalCols.contains(e.getKey)) v else demote(v))
          }.toMap), meta, dbg)
      case "sql" => SqlResult(text(n, "sql"),
        arr(n, "params").map(jsonValue), meta, dbg)
      case "count" => CountResult(n.get("count").asLong(), meta, dbg)
      case other => throw new IllegalArgumentException(s"unknown result kind '$other'")
    }
  }

  // ---------------- response writing ----------------

  /** Scala/JDBC values → jackson tree; timestamps as ISO-8601 `Z` strings,
    * dates as `YYYY-MM-DD` (CONTRACT_TESTS.md:1176-1177).
    */
  def toNode(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case f: Float => mapper.getNodeFactory.numberNode(f.toDouble)
    case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
    case d: BigDecimal => mapper.getNodeFactory.numberNode(d.bigDecimal)
    case t: java.sql.Timestamp =>
      mapper.getNodeFactory.textNode(t.toInstant.toString)
    case t: java.time.Instant => mapper.getNodeFactory.textNode(t.toString)
    case d: java.sql.Date => mapper.getNodeFactory.textNode(d.toString)
    case d: java.time.LocalDate => mapper.getNodeFactory.textNode(d.toString)
    case m: scala.collection.Map[_, _] =>
      val o = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[JsonNode](String.valueOf(k), toNode(x)) }
      o
    case s: scala.collection.Seq[_] =>
      val a = mapper.createArrayNode()
      s.foreach(x => a.add(toNode(x)))
      a
    case other => mapper.getNodeFactory.textNode(String.valueOf(other))
  }

  /** Contract health shape (C1300-C1304): `{healthy, executors: {id:
    * {healthy, latencyMs, error?}}, cacheProviders: {...}}`. */
  def writeHealth(h: HealthCheckResult): String = {
    def comp(c: ComponentHealth): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("healthy", c.healthy); o.put("latencyMs", c.latencyMs)
      c.error.foreach(o.put("error", _)); o
    }
    def section(m: Map[String, ComponentHealth]): ObjectNode = {
      val o = mapper.createObjectNode()
      m.foreach { case (k, v) => o.set[JsonNode](k, comp(v)) }; o
    }
    val root = mapper.createObjectNode()
    root.put("healthy", h.healthy)
    root.set[JsonNode]("executors", section(h.executors))
    root.set[JsonNode]("cacheProviders", section(h.cacheProviders))
    mapper.writeValueAsString(root)
  }

  def parseHealth(body: String): HealthCheckResult = {
    val n = mapper.readTree(body)
    def section(f: String): Map[String, ComponentHealth] =
      Option(n.get(f)).map(_.fields().asScala.map { e =>
        e.getKey -> ComponentHealth(
          e.getValue.get("healthy").asBoolean(),
          e.getValue.get("latencyMs").asLong(),
          Option(e.getValue.get("error")).map(_.asText()))
      }.toMap).getOrElse(Map.empty)
    HealthCheckResult(n.get("healthy").asBoolean(), section("executors"),
      section("cacheProviders"))
  }

  private def metaNode(meta: QueryResultMeta): ObjectNode = {
    val m = mapper.createObjectNode()
    m.put("strategy", meta.strategy)
    m.put("targetDatabase", meta.targetDatabase)
    meta.dialect.foreach(m.put("dialect", _))
    val tu = mapper.createArrayNode()
    meta.tablesUsed.foreach { t =>
      val o = mapper.createObjectNode()
      o.put("tableId", t.tableId); o.put("source", t.source)
      o.put("database", t.database); o.put("physicalName", t.physicalName)
      tu.add(o)
    }
    m.set[JsonNode]("tablesUsed", tu)
    val cols = mapper.createArrayNode()
    meta.columns.foreach { c =>
      val o = mapper.createObjectNode()
      o.put("apiName", c.apiName); o.put("type", c.columnType)
      o.put("nullable", c.nullable); o.put("fromTable", c.fromTable)
      o.put("masked", c.masked)
      cols.add(o)
    }
    m.set[JsonNode]("columns", cols)
    val t = mapper.createObjectNode()
    t.put("planningMs", meta.timing.planningMs)
    t.put("generationMs", meta.timing.generationMs)
    meta.timing.executionMs.foreach(t.put("executionMs", _))
    m.set[JsonNode]("timing", t)
    m
  }

  def writeResult(r: QueryResult): String = {
    val o = mapper.createObjectNode()
    r match {
      case SqlResult(sql, params, meta, _) =>
        o.put("kind", "sql"); o.put("sql", sql)
        o.set[JsonNode]("params", toNode(params))
        o.set[JsonNode]("meta", metaNode(meta))
      case DataResult(data, meta, _) =>
        o.put("kind", "data")
        o.set[JsonNode]("data", toNode(data))
        o.set[JsonNode]("meta", metaNode(meta))
      case CountResult(count, meta, _) =>
        o.put("kind", "count"); o.put("count", count)
        o.set[JsonNode]("meta", metaNode(meta))
    }
    r.debugLog.foreach { log =>
      val a = mapper.createArrayNode()
      log.foreach { e =>
        val le = mapper.createObjectNode()
        le.put("timestamp", e.timestamp); le.put("phase", e.phase)
        le.put("message", e.message)
        a.add(le)
      }
      o.set[JsonNode]("debugLog", a)
    }
    mapper.writeValueAsString(o)
  }

  def writeError(e: MultiDbError): String =
    mapper.writeValueAsString(toNode(e.toJson))
}
