package graft.access

import graft.meta._
import graft.types.ExecutionContext

/** Effective access for one resolved context: per-table allowed + masked
  * column sets (reference: METADATA.md:90-134).
  *
  * Scope algebra: roles within a scope are UNIONED (permissions accumulate;
  * any role that leaves a column unmasked unmasks it within the scope);
  * scopes are INTERSECTED (user ∩ service; a mask imposed by any scope is
  * preserved). Omitted scope = no restriction; empty list = zero permissions.
  */
final case class TableAccess(
    allowed: Option[Set[String]], // None = all columns
    masked: Set[String],
)

final case class EffectiveAccess(perTable: Map[String, Option[TableAccess]]) {
  // perTable value: None = denied; Some(ta) = allowed with column sets.
  def tableAllowed(tableApi: String): Boolean =
    perTable.get(tableApi).exists(_.isDefined)

  def columnAllowed(tableApi: String, colApi: String): Boolean =
    perTable.get(tableApi).flatten.exists(ta =>
      ta.allowed.forall(_.contains(colApi)))

  def maskedColumns(tableApi: String): Set[String] =
    perTable.get(tableApi).flatten.map(_.masked).getOrElse(Set.empty)

  /** Columns to select when the query omits `columns` (rule 4). */
  def allowedColumnsOf(table: TableMeta): Seq[String] =
    perTable.get(table.apiName).flatten match {
      case Some(ta) => ta.allowed match {
        case None      => table.columns.map(_.apiName)
        case Some(set) => table.columns.map(_.apiName).filter(set.contains)
      }
      case None => Nil
    }
}

object AccessControl {

  /** One scope: union of its roles' grants per table. Returns None when the
    * scope imposes no restriction (roles list omitted).
    */
  private def scopeUnion(
      index: MetadataIndex,
      rolesById: Map[String, RoleMeta],
      roleIds: Option[Seq[String]],
  ): Option[Map[String, Option[TableAccess]]] = roleIds.map { ids =>
    val roles = ids.flatMap(rolesById.get)
    index.tablesByApi.map { case (api, table) =>
      val grants = roles.flatMap { r =>
        r.tables match {
          case None => // '*': all tables, all columns, no masking
            Some(TableAccess(None, Set.empty))
          case Some(list) =>
            list.find(_.tableId == table.id).map(tra =>
              TableAccess(tra.allowedColumns.map(_.toSet), tra.maskedColumns.toSet))
        }
      }
      val merged: Option[TableAccess] =
        if (grants.isEmpty) None // no role grants this table → denied in this scope
        else Some(grants.reduce { (a, b) =>
          val allowed = (a.allowed, b.allowed) match {
            case (None, _) | (_, None) => None // any '*' wins within scope
            case (Some(x), Some(y))    => Some(x ++ y)
          }
          // union-unmasks: a column is masked only if EVERY granting role masks
          // it (a role granting the column unmasked unmasks it in this scope).
          val masked = (a.masked ++ b.masked).filter { c =>
            def masksOrOmits(t: TableAccess) =
              t.masked.contains(c) || !t.allowed.forall(_.contains(c))
            masksOrOmits(a) && masksOrOmits(b)
          }
          TableAccess(allowed, masked)
        })
      api -> merged
    }
  }

  /** Intersection across scopes; masking from any scope is preserved. */
  def resolve(
      index: MetadataIndex,
      rolesById: Map[String, RoleMeta],
      context: ExecutionContext,
  ): EffectiveAccess = {
    val scopes = Seq(
      scopeUnion(index, rolesById, context.userRoles),
      scopeUnion(index, rolesById, context.serviceRoles),
    ).flatten
    val perTable = index.tablesByApi.keys.map { api =>
      val accesses = scopes.map(_.getOrElse(api, None))
      val merged: Option[TableAccess] =
        if (scopes.isEmpty) Some(TableAccess(None, Set.empty)) // unrestricted
        else if (accesses.exists(_.isEmpty)) None // denied in any scope → denied
        else Some(accesses.flatten.reduce { (a, b) =>
          val allowed = (a.allowed, b.allowed) match {
            case (None, x) => x
            case (x, None) => x
            case (Some(x), Some(y)) => Some(x.intersect(y))
          }
          TableAccess(allowed, a.masked ++ b.masked) // masks accumulate across scopes
        }).filter(_.allowed.forall(_.nonEmpty)) // disjoint grants intersect to ∅ → denied (C724)
      api -> merged
    }.toMap
    EffectiveAccess(perTable)
  }
}

/** The 7 predefined masking functions (METADATA.md:114-134). Pure row-level
  * transforms applied post-query; null passes through unmasked (C815).
  */
object Masking {

  def apply(fn: String, value: Any): Any =
    if (value == null) null
    else fn match {
      case "email"  => maskEmail(String.valueOf(value))
      case "phone"  => maskPhone(String.valueOf(value))
      case "name"   => maskName(String.valueOf(value))
      case "uuid"   => maskUuid(String.valueOf(value))
      case "number" => 0
      case "date"   => maskDate(value)
      case _        => "***" // 'full' and the safe default
    }

  /** `john@example.com` → `j***@***.com` (first char + TLD hint). */
  def maskEmail(v: String): String = {
    val at = v.indexOf('@')
    if (at <= 0) "***"
    else {
      val first = v.charAt(0)
      val lastDot = v.lastIndexOf('.')
      val tld = if (lastDot > at) v.substring(lastDot) else ""
      s"$first***@***$tld"
    }
  }

  /** `+1234567890` → `+1***890` (country code + last 3 digits). */
  def maskPhone(v: String): String =
    if (v.length < 5) "***"
    else {
      val cc = if (v.startsWith("+")) v.take(2) else v.take(1)
      s"$cc***${v.takeRight(3)}"
    }

  /** `John Smith` → `J********h` (first + last char). */
  def maskName(v: String): String =
    if (v.length <= 2) "***"
    else s"${v.head}${"*" * (v.length - 2)}${v.last}"

  /** `a1b2c3d4-...` → `a1b2****` (first 4 chars). */
  def maskUuid(v: String): String = s"${v.take(4)}****"

  /** Truncate any date/timestamp to Jan 1 of its year. */
  def maskDate(value: Any): Any = value match {
    case d: java.sql.Date =>
      java.sql.Date.valueOf(d.toLocalDate.withDayOfYear(1))
    case d: java.time.LocalDate => d.withDayOfYear(1)
    case t: java.sql.Timestamp =>
      java.sql.Timestamp.valueOf(
        t.toLocalDateTime.withDayOfYear(1).toLocalDate.atStartOfDay)
    case t: java.time.Instant =>
      t.atZone(java.time.ZoneOffset.UTC).withDayOfYear(1).toLocalDate
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    case s: String if s.length >= 4 => s"${s.take(4)}-01-01"
    case _ => "***"
  }
}

/** Column-expression forms of the 7 masking functions — applied in-plan by
  * the resolver (after sort/limit/distinct, so ordering semantics match the
  * reference's post-query masking) so `MultiDb.frame()` exports masked data
  * without a driver-side collect. Each expression produces byte-identical
  * output to the row-level `Masking` functions (asserted in AccessSpec), and
  * all seven are idempotent, so the driver-side path composes safely.
  */
object MaskingColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def mask(fn: String, c: Column): Column = fn match {
    case "email" =>
      val at = instr(c, "@")
      val lastDot = length(c) - instr(reverse(c), ".") + 1
      val tld = when(instr(reverse(c), ".") > 0 && lastDot > at, 
        substring_index(c, ".", -1)).otherwise(lit(""))
      when(c.isNull, c)
        .when(at <= 1, "***")
        .otherwise(concat(substring(c, 1, 1), lit("***@***"),
          when(tld =!= "", concat(lit("."), tld)).otherwise(lit(""))))
    case "phone" =>
      when(c.isNull, c)
        .when(length(c) < 5, "***")
        .otherwise(concat(
          when(c.startsWith("+"), substring(c, 1, 2)).otherwise(substring(c, 1, 1)),
          lit("***"), substring(c, -3, 3)))
    case "name" =>
      when(c.isNull, c)
        .when(length(c) <= 2, "***")
        .otherwise(concat(substring(c, 1, 1), repeat(lit("*"), length(c) - 2),
          substring(c, -1, 1)))
    case "uuid" =>
      when(c.isNull, c).otherwise(concat(substring(c, 1, 4), lit("****")))
    case "number" =>
      when(c.isNull, c.cast("int")).otherwise(lit(0))
    case "date" =>
      when(c.isNull, c).otherwise(date_trunc("year", c))
    case _ =>
      when(c.isNull, c.cast("string")).otherwise(lit("***"))
  }
}
