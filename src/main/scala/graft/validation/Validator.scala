package graft.validation

import graft.meta._
import graft.types._

/** Query validation rules 1-14 (reference: README.md:269-318). Pure Scala,
  * zero Spark imports — unit-testable without a SparkSession and reusable
  * client-side. All issues are collected into one ValidationError, never
  * thrown one at a time.
  */
object Validator {

  val ComparisonOps = Set("=", "!=", ">", "<", ">=", "<=")
  private val OrderingOps = Set(">", "<", ">=", "<=")
  private val PatternOps = Set(
    "like", "notLike", "ilike", "notIlike",
    "contains", "icontains", "notContains", "notIcontains",
    "startsWith", "istartsWith", "endsWith", "iendsWith")
  private val ArrayOps = Set(
    "arrayContains", "arrayContainsAll", "arrayContainsAny",
    "arrayIsEmpty", "arrayIsNotEmpty")
  val AllOperators: Set[String] =
    ComparisonOps ++ Set("in", "notIn", "between", "notBetween",
      "isNull", "isNotNull", "levenshteinLte") ++ PatternOps ++ ArrayOps
  private val HavingOps =
    ComparisonOps ++ Set("in", "notIn", "between", "notBetween", "isNull", "isNotNull")
  val AggFns = Set("count", "sum", "avg", "min", "max")

  /** Does a runtime value conform to a reference column type? */
  def valueMatchesType(v: Any, t: String): Boolean = t match {
    case "string" | "uuid" => v.isInstanceOf[String]
    case "int"             => v.isInstanceOf[Int] || v.isInstanceOf[Long]
    case "decimal" => v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
      v.isInstanceOf[Double] || v.isInstanceOf[Float] || v.isInstanceOf[BigDecimal] ||
      v.isInstanceOf[java.math.BigDecimal]
    case "boolean" => v.isInstanceOf[Boolean]
    case "date" => v.isInstanceOf[java.time.LocalDate] || v.isInstanceOf[java.sql.Date] ||
      (v.isInstanceOf[String] && scala.util.Try(java.time.LocalDate.parse(v.asInstanceOf[String])).isSuccess)
    case "timestamp" => v.isInstanceOf[java.time.Instant] || v.isInstanceOf[java.sql.Timestamp] ||
      (v.isInstanceOf[String] && parseTimestamp(v.asInstanceOf[String]).isDefined)
    case _ => false
  }

  /** ISO 8601, with or without 'Z' / offset / time part
    * (CROSS_DB_NORMALIZATION.md:48-66: `Z`-suffixed ISO strings must bind). */
  def parseTimestamp(s: String): Option[java.time.Instant] = {
    import java.time._
    scala.util.Try(Instant.parse(s)).toOption
      .orElse(scala.util.Try(OffsetDateTime.parse(s).toInstant).toOption)
      .orElse(scala.util.Try(LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)).toOption)
      .orElse(scala.util.Try(LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)).toOption)
  }

  /** Operator/type compatibility matrix (README.md:290-318). */
  def operatorValidForType(op: String, t: String, nullable: Boolean): Boolean = {
    val isArr = ColumnTypes.isArray(t)
    op match {
      case "isNull" | "isNotNull" => nullable
      case _ if isArr             => ArrayOps.contains(op)
      case _ if ArrayOps.contains(op) => false
      case "=" | "!="             => true
      case ">" | "<" | ">=" | "<=" => ColumnTypes.isOrderable(t)
      case "in" | "notIn"         => Set("string", "int", "decimal", "uuid").contains(t)
      case "between" | "notBetween" => ColumnTypes.isOrderable(t)
      case "levenshteinLte"       => t == "string"
      case op if PatternOps.contains(op) => t == "string"
      case _                      => false
    }
  }

  // -------------------------------------------------------------------------

  final case class Ctx(
      index: MetadataIndex,
      rolesById: Map[String, RoleMeta],
      q: QueryDefinition,
  ) {
    val fromTable: Option[TableMeta] = index.tablesByApi.get(q.from)
    /** from + declared joins, in declaration order (valid or not). */
    val joinedApis: Seq[String] = q.joins.map(_.table)
    val scopeApis: Set[String] = (q.from +: joinedApis).toSet
    val aggAliases: Set[String] = q.aggregations.map(_.alias).toSet
  }

  def validate(
      index: MetadataIndex,
      rolesById: Map[String, RoleMeta],
      q: QueryDefinition,
      context: ExecutionContext,
  ): Seq[ValidationIssue] = {
    val errs = Seq.newBuilder[ValidationIssue]
    def err(code: String, msg: String, details: (String, Any)*): Unit =
      errs += ValidationIssue(code, msg, details.toMap)
    val ctx = Ctx(index, rolesById, q)

    // Rule 13: role existence
    (context.userRoles.getOrElse(Nil) ++ context.serviceRoles.getOrElse(Nil))
      .foreach { r =>
        if (!rolesById.contains(r))
          err("UNKNOWN_ROLE", s"unknown role '$r'", "role" -> r)
      }

    // Rule 1: from-table existence
    if (ctx.fromTable.isEmpty) {
      err("UNKNOWN_TABLE", s"unknown table '${q.from}'", "table" -> q.from)
      return errs.result() // nothing else is checkable without the from table
    }

    val access = graft.access.AccessControl.resolve(index, rolesById, context)

    // Rule 3: table-level permission (from + joins + exists tables checked in place)
    def checkTableAccess(api: String, where: String): Boolean =
      index.tablesByApi.get(api) match {
        case Some(t) if !access.tableAllowed(t.apiName) =>
          err("ACCESS_DENIED", s"role denies access to table '$api' ($where)", "table" -> api)
          false
        case _ => true
      }
    checkTableAccess(q.from, "from")

    // Rule 6: join validity (relation to from or an already-joined table)
    var reachable = Set(q.from)
    q.joins.foreach { j =>
      index.tablesByApi.get(j.table) match {
        case None => err("UNKNOWN_TABLE", s"unknown join table '${j.table}'", "table" -> j.table)
        case Some(_) =>
          checkTableAccess(j.table, "join")
          val hasRel = reachable.exists(r => index.relationBetween(j.table, r).isDefined)
          if (!hasRel)
            err("INVALID_JOIN",
              s"no relation path from '${j.table}' to '${q.from}' or any joined table",
              "table" -> j.table)
          if (!Set("inner", "left").contains(j.joinType))
            err("INVALID_JOIN", s"invalid join type '${j.joinType}'",
              "table" -> j.table, "actual" -> j.joinType)
          reachable += j.table
      }
    }

    // Rule 2 + 4: column existence/permission for selected columns
    def checkColumn(tableApi: String, colApi: String, codeUnknown: String,
        details: (String, Any)*): Option[ColumnMeta] =
      index.tablesByApi.get(tableApi) match {
        case None => None
        case Some(_) =>
          index.column(tableApi, colApi) match {
            case None =>
              err(codeUnknown, s"unknown column '$tableApi.$colApi'",
                (details :+ ("table" -> tableApi) :+ ("column" -> colApi)): _*)
              None
            case Some(cm) =>
              if (!access.columnAllowed(tableApi, colApi)) {
                err("ACCESS_DENIED", s"role denies column '$tableApi.$colApi'",
                  "table" -> tableApi, "column" -> colApi)
                None
              } else Some(cm)
          }
      }

    q.columns.getOrElse(Nil).foreach(c => checkColumn(q.from, c, "UNKNOWN_COLUMN"))
    q.joins.foreach(j => j.columns.getOrElse(Nil).foreach(c =>
      if (index.tablesByApi.contains(j.table))
        checkColumn(j.table, c, "UNKNOWN_COLUMN")))

    // resolve a filter's table qualifier against the query scope (rule 5);
    // inside an EXISTS subtree the exists table joins the visible scope
    def resolveQualifier(tOpt: Option[String], defaultTable: String,
        filterIndex: Int, code: String): Option[String] = {
      val visible = ctx.scopeApis + defaultTable
      tOpt match {
        case None => Some(defaultTable)
        case Some(t) if !visible.contains(t) && index.tablesByApi.contains(t) =>
          err(code, s"table '$t' referenced in filter is not in the query",
            "table" -> t, "filterIndex" -> filterIndex)
          None
        case Some(t) if !index.tablesByApi.contains(t) =>
          err("UNKNOWN_TABLE", s"unknown table '$t' in filter",
            "table" -> t, "filterIndex" -> filterIndex)
          None
        case Some(t) => Some(t)
      }
    }

    // Rule 5: filter validity (recursive)
    def checkFilterValue(f: QueryFilter, cm: ColumnMeta, idx: Int): Unit = {
      val t = cm.columnType
      val elem = if (ColumnTypes.isArray(t)) ColumnTypes.elementType(t) else t
      def bad(msg: String, extra: (String, Any)*): Unit =
        err("INVALID_VALUE", msg,
          (extra :+ ("column" -> cm.apiName) :+ ("operator" -> f.operator)
            :+ ("filterIndex" -> idx)): _*)
      f.operator match {
        case "isNull" | "isNotNull" | "arrayIsEmpty" | "arrayIsNotEmpty" =>
          if (f.value.isDefined) bad(s"operator '${f.operator}' takes no value")
        case "in" | "notIn" | "arrayContainsAll" | "arrayContainsAny" =>
          f.value match {
            case Some(xs: Seq[_]) =>
              if (xs.isEmpty) bad("empty array value")
              else {
                if (xs.exists(_ == null))
                  bad("null elements are rejected (SQL 3-valued logic footgun)")
                xs.filter(_ != null).foreach { x =>
                  if (!valueMatchesType(x, elem))
                    bad(s"element '$x' does not match column type '$elem'",
                      "expected" -> elem, "actual" -> String.valueOf(x))
                }
              }
            case _ => bad("expected an array value")
          }
        case "between" | "notBetween" =>
          f.value match {
            case Some((from, to)) =>
              if (from == null || to == null)
                bad("null bounds rejected (BETWEEN NULL yields no rows)")
              else {
                if (!valueMatchesType(from, t))
                  bad(s"'from' bound does not match column type '$t'", "expected" -> t)
                if (!valueMatchesType(to, t))
                  bad(s"'to' bound does not match column type '$t'", "expected" -> t)
              }
            case _ => bad("expected {from, to} bounds")
          }
        case "levenshteinLte" =>
          f.value match {
            case Some((text: String, maxD: Int)) =>
              if (maxD < 0) bad("maxDistance must be a non-negative integer")
              else { val _ = text }
            case _ => bad("expected {text, maxDistance}")
          }
        case "arrayContains" =>
          f.value match {
            case Some(v) if valueMatchesType(v, elem) => ()
            case _ => bad(s"value must match element type '$elem'", "expected" -> elem)
          }
        case op if PatternOps.contains(op) =>
          if (!f.value.exists(_.isInstanceOf[String])) bad("expected a string value")
        case _ => // comparison ops
          f.value match {
            case Some(v) =>
              if (!valueMatchesType(v, t))
                bad(s"value does not match column type '$t'",
                  "expected" -> t, "actual" -> String.valueOf(f.value.get))
            case None => bad("missing value")
          }
      }
    }

    def walkFilters(nodes: Seq[QueryFilterNode], defaultTable: String,
        existsParent: Option[String]): Unit =
      nodes.zipWithIndex.foreach { case (node, idx) =>
        node match {
          case f: QueryFilter =>
            if (!AllOperators.contains(f.operator))
              err("INVALID_FILTER", s"unknown operator '${f.operator}'",
                "operator" -> f.operator, "filterIndex" -> idx)
            else resolveQualifier(f.table, defaultTable, idx, "INVALID_FILTER")
              .foreach { tApi =>
                checkColumn(tApi, f.column, "UNKNOWN_COLUMN", "filterIndex" -> idx)
                  .foreach { cm =>
                    if (!operatorValidForType(f.operator, cm.columnType, cm.nullable))
                      err("INVALID_FILTER",
                        s"operator '${f.operator}' not valid for type '${cm.columnType}'" +
                          (if (Set("isNull", "isNotNull").contains(f.operator)) " (column not nullable)" else ""),
                        "column" -> f.column, "operator" -> f.operator,
                        "filterIndex" -> idx, "table" -> tApi)
                    else checkFilterValue(f, cm, idx)
                  }
              }
          case cf: QueryColumnFilter =>
            if (!ComparisonOps.contains(cf.operator))
              err("INVALID_FILTER", s"operator '${cf.operator}' not valid in column filter",
                "operator" -> cf.operator, "filterIndex" -> idx)
            val lt = resolveQualifier(cf.table, defaultTable, idx, "INVALID_FILTER")
            val rt = resolveQualifier(cf.refTable, defaultTable, idx, "INVALID_FILTER")
            for {
              ltApi <- lt
              rtApi <- rt
              lcm <- checkColumn(ltApi, cf.column, "UNKNOWN_COLUMN", "filterIndex" -> idx)
              rcm <- checkColumn(rtApi, cf.refColumn, "UNKNOWN_COLUMN",
                "refColumn" -> cf.refColumn, "refTable" -> rtApi, "filterIndex" -> idx)
            } {
              val (a, b) = (lcm.columnType, rcm.columnType)
              if (ColumnTypes.isArray(a) || ColumnTypes.isArray(b))
                err("INVALID_FILTER", "array columns not allowed in column filter",
                  "column" -> cf.column, "refColumn" -> cf.refColumn, "filterIndex" -> idx)
              else if (ColumnTypes.family(a) != ColumnTypes.family(b))
                err("INVALID_FILTER", s"incompatible column types '$a' vs '$b'",
                  "column" -> cf.column, "refColumn" -> cf.refColumn,
                  "refTable" -> rtApi, "filterIndex" -> idx)
              else if (OrderingOps.contains(cf.operator) &&
                  (!ColumnTypes.isOrderable(a) || !ColumnTypes.isOrderable(b)))
                err("INVALID_FILTER", s"operator '${cf.operator}' not valid for type '$a'",
                  "column" -> cf.column, "operator" -> cf.operator, "filterIndex" -> idx)
            }
          case g: QueryFilterGroup =>
            if (!Set("and", "or").contains(g.logic))
              err("INVALID_FILTER", s"invalid group logic '${g.logic}'",
                "actual" -> g.logic, "filterIndex" -> idx)
            walkFilters(g.conditions, defaultTable, existsParent)
          case e: QueryExistsFilter =>
            // Rule 12: relation resolved against the exists-parent chain
            val parentApi = existsParent.getOrElse(defaultTable)
            index.tablesByApi.get(e.table) match {
              case None =>
                err("UNKNOWN_TABLE", s"unknown exists table '${e.table}'",
                  "table" -> e.table, "filterIndex" -> idx)
              case Some(_) =>
                checkTableAccess(e.table, "exists")
                if (index.relationBetween(e.table, parentApi).isEmpty)
                  err("INVALID_EXISTS",
                    s"no relation between '${e.table}' and '$parentApi'",
                    "table" -> e.table, "filterIndex" -> idx)
                e.count.foreach { c =>
                  if (!ComparisonOps.contains(c.operator))
                    err("INVALID_EXISTS", s"invalid count operator '${c.operator}'",
                      "operator" -> c.operator, "filterIndex" -> idx)
                  if (c.value < 0)
                    err("INVALID_EXISTS", "count value must be a non-negative integer",
                      "actual" -> c.value, "filterIndex" -> idx)
                }
                // inner filters: unqualified columns resolve against e.table
                walkFilters(e.filters, e.table, Some(e.table))
            }
        }
      }

    walkFilters(q.filters, q.from, None)
    q.joins.foreach { j =>
      if (index.tablesByApi.contains(j.table))
        walkFilters(j.filters, j.table, None)
    }

    // Rule 7: group-by validity
    val groupedCols = q.groupBy.map(g => (g.table.getOrElse(q.from), g.column)).toSet
    q.groupBy.foreach { g =>
      val tApi = g.table.getOrElse(q.from)
      if (g.table.isDefined && !ctx.scopeApis.contains(tApi))
        err("INVALID_GROUP_BY", s"table '$tApi' in groupBy is not in the query", "table" -> tApi)
      else checkColumn(tApi, g.column, "UNKNOWN_COLUMN").foreach { cm =>
        if (ColumnTypes.isArray(cm.columnType))
          err("INVALID_GROUP_BY", s"array column '${g.column}' not allowed in groupBy",
            "column" -> g.column)
      }
    }
    if (q.groupBy.nonEmpty || q.aggregations.nonEmpty) {
      q.columns.getOrElse(Nil).foreach { c =>
        if (!ctx.aggAliases.contains(c) && !groupedCols.contains((q.from, c)))
          err("INVALID_GROUP_BY", s"column '$c' must appear in groupBy", "column" -> c)
      }
      q.joins.foreach(j => j.columns.getOrElse(Nil).foreach { c =>
        if (!groupedCols.contains((j.table, c)))
          err("INVALID_GROUP_BY", s"column '${j.table}.$c' must appear in groupBy",
            "table" -> j.table, "column" -> c)
      })
    }

    // Rule 14: aggregation validity
    val dupAliases = q.aggregations.groupBy(_.alias).collect { case (a, xs) if xs.size > 1 => a }
    dupAliases.foreach(a =>
      err("INVALID_AGGREGATION", s"duplicate aggregation alias '$a'", "alias" -> a))
    val selectedApis: Set[String] =
      q.columns.getOrElse(Nil).toSet ++ q.joins.flatMap(_.columns.getOrElse(Nil))
    q.aggregations.foreach { a =>
      if (!AggFns.contains(a.fn))
        err("INVALID_AGGREGATION", s"unknown aggregation fn '${a.fn}'", "actual" -> a.fn)
      if (selectedApis.contains(a.alias))
        err("INVALID_AGGREGATION", s"alias '${a.alias}' collides with a selected column",
          "alias" -> a.alias)
      if (a.column != "*") {
        val tApi = a.table.getOrElse(q.from)
        if (a.table.isDefined && !ctx.scopeApis.contains(tApi))
          err("INVALID_AGGREGATION", s"table '$tApi' in aggregation is not in the query",
            "table" -> tApi)
        else checkColumn(tApi, a.column, "UNKNOWN_COLUMN").foreach { cm =>
          if (ColumnTypes.isArray(cm.columnType) && a.fn != "count")
            err("INVALID_AGGREGATION",
              s"'${a.fn}' not valid on array column '${a.column}' (only count)",
              "column" -> a.column, "actual" -> a.fn)
        }
      } else if (a.fn != "count")
        err("INVALID_AGGREGATION", s"'*' only valid with count", "actual" -> a.fn)
    }
    if (q.columns.exists(_.isEmpty) && q.aggregations.isEmpty)
      err("INVALID_AGGREGATION", "empty columns [] requires aggregations")

    // Rule 8: having validity
    def walkHaving(nodes: Seq[QueryFilterNode]): Unit = nodes.zipWithIndex.foreach {
      case (f: QueryFilter, idx) =>
        if (f.table.isDefined)
          err("INVALID_HAVING", "table qualifier not allowed in having",
            "table" -> f.table.get, "filterIndex" -> idx)
        if (!ctx.aggAliases.contains(f.column))
          err("INVALID_HAVING", s"having references unknown alias '${f.column}'",
            "alias" -> f.column, "filterIndex" -> idx)
        if (!HavingOps.contains(f.operator))
          err("INVALID_HAVING", s"operator '${f.operator}' not allowed in having",
            "operator" -> f.operator, "filterIndex" -> idx)
      case (g: QueryFilterGroup, idx) =>
        // enum-like `logic` is interpolated into SQL dialects, so it must be
        // runtime-validated here too (CONTRACT_TESTS C1465)
        if (!Set("and", "or").contains(g.logic))
          err("INVALID_HAVING", s"invalid group logic '${g.logic}' in having",
            "actual" -> g.logic, "filterIndex" -> idx)
        walkHaving(g.conditions)
      case (_: QueryColumnFilter, idx) =>
        err("INVALID_HAVING", "column filter not allowed in having", "filterIndex" -> idx)
      case (_: QueryExistsFilter, idx) =>
        err("INVALID_HAVING", "exists filter not allowed in having", "filterIndex" -> idx)
    }
    walkHaving(q.having)
    if (q.having.nonEmpty && q.aggregations.isEmpty)
      err("INVALID_HAVING", "having requires aggregations")

    // Rule 9: order-by validity
    q.orderBy.foreach { o =>
      if (!Set("asc", "desc").contains(o.direction))
        err("INVALID_ORDER_BY", s"invalid direction '${o.direction}'", "actual" -> o.direction)
      if (o.table.isEmpty && ctx.aggAliases.contains(o.column)) ()
      else {
        val tApi = o.table.getOrElse(q.from)
        if (o.table.isDefined && !ctx.scopeApis.contains(tApi))
          err("INVALID_ORDER_BY", s"table '$tApi' in orderBy is not in the query", "table" -> tApi)
        // unknown orderBy column reports INVALID_ORDER_BY, not UNKNOWN_COLUMN
        // (reference CONTRACT_TESTS C1467)
        else checkColumn(tApi, o.column, "INVALID_ORDER_BY").foreach { cm =>
          if (ColumnTypes.isArray(cm.columnType))
            err("INVALID_ORDER_BY", s"array column '${o.column}' not allowed in orderBy",
              "column" -> o.column)
        }
      }
    }

    // Rule 10: byIds validity
    q.byIds.foreach { ids =>
      val pk = ctx.fromTable.get.primaryKey
      if (ids.isEmpty)
        err("INVALID_BY_IDS", "byIds must be a non-empty array")
      if (pk.size != 1)
        err("INVALID_BY_IDS", s"byIds requires a single-column primary key",
          "table" -> q.from, "actual" -> pk.mkString(","))
      if (q.groupBy.nonEmpty || q.aggregations.nonEmpty)
        err("INVALID_BY_IDS", "byIds cannot combine with groupBy/aggregations")
      if (pk.size == 1) {
        val pkType = index.column(q.from, pk.head).map(_.columnType).getOrElse("string")
        ids.foreach { id =>
          if (id == null || !valueMatchesType(id, pkType))
            err("INVALID_VALUE", s"byIds element '$id' does not match pk type '$pkType'",
              "expected" -> pkType)
        }
      }
    }

    // Rule 11: limit/offset validity
    q.limit.foreach(l =>
      if (l < 0) err("INVALID_LIMIT", "limit must be non-negative", "actual" -> l))
    q.offset.foreach(o =>
      if (o < 0) err("INVALID_LIMIT", "offset must be non-negative", "actual" -> o))
    if (q.offset.isDefined && q.limit.isEmpty)
      err("INVALID_LIMIT", "offset requires limit")

    if (!Set("sql-only", "execute", "count").contains(q.executeMode))
      err("INVALID_VALUE", s"invalid executeMode '${q.executeMode}'", "actual" -> q.executeMode)

    errs.result()
  }
}
