package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.meta._
import graft.types._
import graft.validation.Validator

/** Validation rules 1-14 — zero-Spark unit tests (scenario tables
  * TESTS.md:73-152; contract C900-C1030 equivalents). Also proves errors are
  * COLLECTED, not thrown one at a time.
  */
class ValidatorSpec extends AnyFunSuite {

  private val index = MetadataIndex.build(ContractFixture.config())
  private val roles = ContractFixture.roles.map(r => r.id -> r).toMap
  private val admin = ExecutionContext(userRoles = Some(Seq("admin")))

  private def errs(q: QueryDefinition, ctx: ExecutionContext = admin) =
    Validator.validate(index, roles, q, ctx)
  private def codes(q: QueryDefinition, ctx: ExecutionContext = admin) =
    errs(q, ctx).map(_.code)

  test("rule 1: unknown table") {
    assert(codes(QueryDefinition("nope")) == Seq("UNKNOWN_TABLE"))
  }

  test("rule 2: unknown column") {
    assert(codes(QueryDefinition("orders", columns = Some(Seq("nope"))))
      == Seq("UNKNOWN_COLUMN"))
  }

  test("rule 3/4: table and column permission") {
    val viewer = ExecutionContext(userRoles = Some(Seq("viewer")))
    assert(codes(QueryDefinition("invoices"), viewer).contains("ACCESS_DENIED"))
    assert(codes(QueryDefinition("orders", columns = Some(Seq("total"))), viewer)
      .contains("ACCESS_DENIED"))
  }

  test("rule 5: operator/type matrix") {
    def f(col: String, op: String, v: Option[Any] = Some("x")) =
      codes(QueryDefinition("samples", filters = Seq(QueryFilter(col, op, v))))
    assert(f("externalId", ">").contains("INVALID_FILTER"))  // uuid not orderable
    assert(f("isActive", ">", Some(true)).contains("INVALID_FILTER"))
    assert(f("createdAt", "in", Some(Seq("2024-01-01T00:00:00Z"))).contains("INVALID_FILTER"))
    assert(f("amount", "like").contains("INVALID_FILTER"))
    assert(f("tags", "=", Some("x")).contains("INVALID_FILTER")) // scalar op on array
    assert(f("amount", "arrayContains", Some(1)).contains("INVALID_FILTER"))
    assert(f("name", "isNull", None).contains("INVALID_FILTER")) // not nullable
    assert(f("note", "isNull", None).isEmpty) // nullable → ok
  }

  test("rule 5: INVALID_VALUE for malformed compound values") {
    def f(n: QueryFilterNode) = codes(QueryDefinition("samples", filters = Seq(n)))
    assert(f(QueryFilter("amount", "in", Some(Seq.empty[Any]))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("amount", "in", Some(Seq(1, null)))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("amount", "in", Some(Seq("a", "b")))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("amount", "between", Some((null, 5)))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("amount", "between", Some(("a", "z")))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("name", "levenshteinLte", Some(("x", -1)))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("tags", "arrayContainsAll", Some(Seq.empty[Any]))).contains("INVALID_VALUE"))
    assert(f(QueryFilter("tags", "arrayContains", Some(5))).contains("INVALID_VALUE"))
  }

  test("rule 5: column filter family checks") {
    def cf(a: String, b: String, op: String = "=") =
      codes(QueryDefinition("samples", filters = Seq(QueryColumnFilter(a, op, b))))
    assert(cf("amount", "discount").isEmpty)          // decimal vs decimal
    assert(cf("id", "amount", ">").isEmpty)            // int vs decimal (numeric family)
    assert(cf("createdAt", "dueDate", "<").isEmpty)    // timestamp vs date (temporal)
    assert(cf("amount", "name").contains("INVALID_FILTER"))   // cross family
    assert(cf("tags", "scores").contains("INVALID_FILTER"))   // arrays rejected
  }

  test("rule 5: filter table qualifier must be in query scope") {
    val q = QueryDefinition("orders",
      filters = Seq(QueryFilter("name", "=", Some("x"), table = Some("products"))))
    assert(codes(q).contains("INVALID_FILTER"))
    val ok = q.copy(joins = Seq(QueryJoin("products", columns = Some(Nil))))
    assert(errs(ok).isEmpty)
  }

  test("rule 6: join requires relation path; transitive allowed") {
    assert(codes(QueryDefinition("orders", joins = Seq(QueryJoin("samples"))))
      .contains("INVALID_JOIN"))
    // users + orders + invoices: invoices relates to orders (already joined)
    val q = QueryDefinition("users",
      joins = Seq(QueryJoin("orders", columns = Some(Nil)),
        QueryJoin("invoices", columns = Some(Nil))))
    assert(errs(q).isEmpty)
    // without orders in between it must fail
    assert(codes(QueryDefinition("users", joins = Seq(QueryJoin("invoices"))))
      .contains("INVALID_JOIN"))
  }

  test("rule 7: ungrouped selected column; array groupBy rejected") {
    val q = QueryDefinition("samples", columns = Some(Seq("name", "category")),
      groupBy = Seq(QueryGroupBy("category")),
      aggregations = Seq(QueryAggregation("*", "count", "n")))
    assert(codes(q).contains("INVALID_GROUP_BY"))
    assert(codes(QueryDefinition("samples", columns = Some(Seq("tags")),
      groupBy = Seq(QueryGroupBy("tags")))).contains("INVALID_GROUP_BY"))
  }

  test("rule 8: having restrictions") {
    val base = QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("*", "count", "n")))
    assert(errs(base.copy(having = Seq(QueryFilter("n", ">", Some(1))))).isEmpty)
    assert(codes(base.copy(having = Seq(QueryFilter("nope", ">", Some(1)))))
      .contains("INVALID_HAVING"))
    assert(codes(base.copy(having = Seq(QueryFilter("n", "like", Some("x")))))
      .contains("INVALID_HAVING"))
    assert(codes(base.copy(having = Seq(QueryFilter("n", ">", Some(1), table = Some("samples")))))
      .contains("INVALID_HAVING"))
    assert(codes(base.copy(having = Seq(QueryColumnFilter("n", "=", "n"))))
      .contains("INVALID_HAVING"))
    assert(codes(base.copy(having = Seq(QueryExistsFilter("sampleItems"))))
      .contains("INVALID_HAVING"))
    // isNull on alias needs no nullable metadata
    assert(errs(base.copy(having = Seq(QueryFilter("n", "isNull")))).isEmpty)
  }

  test("rule 9: orderBy array column rejected; alias allowed") {
    assert(codes(QueryDefinition("samples", orderBy = Seq(QueryOrderBy("tags"))))
      .contains("INVALID_ORDER_BY"))
    val q = QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("*", "count", "n")),
      orderBy = Seq(QueryOrderBy("n")))
    assert(errs(q).isEmpty)
  }

  test("rule 10: byIds composite PK / combos rejected (C505/C992)") {
    assert(codes(QueryDefinition("orderItems", byIds = Some(Seq(1))))
      .contains("INVALID_BY_IDS"))
    assert(codes(QueryDefinition("orders", byIds = Some(Seq.empty[Any])))
      .contains("INVALID_BY_IDS"))
    assert(codes(QueryDefinition("orders", byIds = Some(Seq(1)),
      aggregations = Seq(QueryAggregation("*", "count", "n")), columns = Some(Nil)))
      .contains("INVALID_BY_IDS"))
  }

  test("rule 11: offset requires limit; negatives rejected") {
    assert(codes(QueryDefinition("orders", offset = Some(5))).contains("INVALID_LIMIT"))
    assert(codes(QueryDefinition("orders", limit = Some(-1))).contains("INVALID_LIMIT"))
  }

  test("rule 12: exists validity") {
    assert(codes(QueryDefinition("orders", filters = Seq(QueryExistsFilter("samples"))))
      .contains("INVALID_EXISTS"))
    assert(codes(QueryDefinition("samples",
      filters = Seq(QueryExistsFilter("sampleItems", count = Some(CountCond(">=", -1))))))
      .contains("INVALID_EXISTS"))
  }

  test("rule 13: unknown role") {
    assert(codes(QueryDefinition("orders"),
      ExecutionContext(userRoles = Some(Seq("ghost")))).contains("UNKNOWN_ROLE"))
  }

  test("rule 14: aggregation alias uniqueness + collision + array fns") {
    val q = QueryDefinition("samples", columns = Some(Nil), aggregations = Seq(
      QueryAggregation("amount", "sum", "x"), QueryAggregation("amount", "avg", "x")))
    assert(codes(q).contains("INVALID_AGGREGATION"))
    val q2 = QueryDefinition("samples", columns = Some(Seq("category")),
      groupBy = Seq(QueryGroupBy("category")),
      aggregations = Seq(QueryAggregation("amount", "sum", "category")))
    assert(codes(q2).contains("INVALID_AGGREGATION"))
    val q3 = QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("tags", "sum", "s")))
    assert(codes(q3).contains("INVALID_AGGREGATION"))
    assert(codes(QueryDefinition("samples", columns = Some(Nil)))
      .contains("INVALID_AGGREGATION")) // empty columns without aggregations
  }

  test("errors are collected, not fail-fast") {
    val q = QueryDefinition("orders",
      columns = Some(Seq("nope1", "nope2")),
      filters = Seq(QueryFilter("status", "like", Some(1))),
      limit = Some(-1))
    val es = errs(q)
    assert(es.size >= 3)
    assert(es.map(_.code).toSet.intersect(
      Set("UNKNOWN_COLUMN", "INVALID_LIMIT")).size == 2)
  }

  test("config validation collects issues (C1620-ish)") {
    val bad = MetadataConfig(
      databases = Seq(DatabaseMeta("db1", "postgres")),
      tables = Seq(
        TableMeta("t1", "BadName", "db1", "t1", Seq(ColumnMeta("c", "c", "string"))),
        TableMeta("t2", "okName", "nope", "t2",
          Seq(ColumnMeta("c", "c", "badtype"), ColumnMeta("c", "c2", "string")),
          relations = Seq(RelationMeta("c", "ghost", "id")))))
    val issues = MetadataIndex.validate(bad)
    val cs = issues.map(_.code).toSet
    assert(cs.contains("INVALID_API_NAME"))
    assert(cs.contains("INVALID_REFERENCE"))
    assert(cs.contains("INVALID_RELATION"))
    assert(cs.contains("DUPLICATE_API_NAME"))
    intercept[ConfigError](MetadataIndex.build(bad))
  }

  test("apiName grammar: reserved words and format (C1630-ish)") {
    assert(!ApiName.isValid("select"))
    assert(!ApiName.isValid("BadStart"))
    assert(!ApiName.isValid("snake_case"))
    assert(!ApiName.isValid(""))
    assert(!ApiName.isValid("a" * 65))
    assert(ApiName.isValid("customerId"))
  }

  test("operator/type matrix: exhaustive double-entry vs README.md:290-318") {
    val scalar = Seq("string", "int", "decimal", "boolean", "uuid", "date", "timestamp")
    val types = scalar ++ scalar.map(_ + "[]")
    val ordered = Set("string", "int", "decimal", "date", "timestamp")
    val patternOps = Seq("like", "notLike", "ilike", "notIlike",
      "contains", "icontains", "notContains", "notIcontains",
      "startsWith", "istartsWith", "endsWith", "iendsWith")
    val arrayOps = Seq("arrayContains", "arrayContainsAll", "arrayContainsAny",
      "arrayIsEmpty", "arrayIsNotEmpty")
    val ops = Seq("=", "!=", ">", "<", ">=", "<=", "in", "notIn") ++ patternOps ++
      Seq("between", "notBetween", "isNull", "isNotNull", "levenshteinLte") ++ arrayOps
    assert(ops.size == 30) // op 31 is column-vs-column, checked by rule-5 tests
    // independent re-encoding of the reference table (double-entry check)
    def want(op: String, t: String, nullable: Boolean): Boolean = {
      val arr = t.endsWith("[]")
      op match {
        case "isNull" | "isNotNull"                      => nullable
        case o if arrayOps.contains(o)                   => arr
        case _ if arr                                    => false
        case "=" | "!="                                  => true
        case ">" | "<" | ">=" | "<=" |
             "between" | "notBetween"                    => ordered(t)
        case "in" | "notIn"                              => Set("string", "int", "decimal", "uuid")(t)
        case _                                           => t == "string" // patterns + levenshteinLte
      }
    }
    for (op <- ops; t <- types; n <- Seq(true, false))
      assert(Validator.operatorValidForType(op, t, n) == want(op, t, n),
        s"matrix mismatch at ($op, $t, nullable=$n)")
  }
}
