package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.meta._
import graft.types._
import graft.validation.Validator

/** Systematic port of the reference's validation-negative contract section
  * (CONTRACT_TESTS.md §12, C900–C1030) against the contract fixture config.
  * Zero-I/O: every scenario is a pure Validator (or wire-parse) call.
  * Contract IDs are cited inline; each assert maps to exactly one row of
  * the reference table.
  */
class ContractNegativeSpec extends AnyFunSuite {

  private val index = MetadataIndex.build(ContractFixture.config())
  private val roles = ContractFixture.roles.map(r => r.id -> r).toMap
  private val admin = ExecutionContext(userRoles = Some(Seq("admin")))
  private val viewer = ExecutionContext(userRoles = Some(Seq("viewer")))

  private def codes(q: QueryDefinition, ctx: ExecutionContext = admin): Seq[String] =
    Validator.validate(index, roles, q, ctx).map(_.code)
  private def expectCode(code: String)(q: QueryDefinition, ctx: ExecutionContext = admin): Unit =
    assert(codes(q, ctx).contains(code), s"expected $code, got ${codes(q, ctx)} for $q")

  private def f(col: String, op: String, v: Option[Any] = Some("x")) =
    QueryDefinition("orders", filters = Seq(QueryFilter(col, op, v)))

  // ---- 12.1 table & column -------------------------------------------
  test("C900-C903: unknown table / column / filter column / joined-table column") {
    expectCode("UNKNOWN_TABLE")(QueryDefinition("nonExistentTable")) // C900
    expectCode("UNKNOWN_COLUMN")(QueryDefinition("orders", columns = Some(Seq("nonexistent")))) // C901
    expectCode("UNKNOWN_COLUMN")(f("nonexistent", "=")) // C902
    expectCode("UNKNOWN_COLUMN")(QueryDefinition("orders", // C903
      joins = Seq(QueryJoin("products")),
      filters = Seq(QueryFilter("nonexistent", "=", Some("x"), table = Some("products")))))
  }

  // ---- 12.2 filter validity ------------------------------------------
  test("C910-C916: orderable/in operators rejected on uuid/boolean/temporal") {
    expectCode("INVALID_FILTER")(f("customerId", ">"))                       // C910 uuid
    expectCode("INVALID_FILTER")(f("isPaid", ">", Some(true)))               // C911 boolean
    expectCode("INVALID_FILTER")(f("isPaid", "in", Some(Seq(true))))         // C912
    expectCode("INVALID_FILTER")(QueryDefinition("invoices",                 // C913 date
      filters = Seq(QueryFilter("dueDate", "in", Some(Seq("2024-01-01"))))))
    expectCode("INVALID_FILTER")(f("createdAt", "in", Some(Seq("2024-01-01T00:00:00Z")))) // C914 ts
    expectCode("INVALID_FILTER")(QueryDefinition("invoices",                 // C915
      filters = Seq(QueryFilter("dueDate", "notIn", Some(Seq("2024-01-01"))))))
    expectCode("INVALID_FILTER")(f("isPaid", "notIn", Some(Seq(true))))      // C916
  }

  test("C917-C923: pattern/levenshtein/between operators rejected on wrong types") {
    expectCode("INVALID_FILTER")(f("quantity", "like"))                      // C917 int
    expectCode("INVALID_FILTER")(f("total", "contains"))                     // C918 decimal
    expectCode("INVALID_FILTER")(f("total", "levenshteinLte", Some(("x", 2)))) // C919
    expectCode("INVALID_FILTER")(f("isPaid", "between", Some((true, false)))) // C920
    expectCode("INVALID_FILTER")(f("customerId", "between", Some(("a", "b")))) // C921
    expectCode("INVALID_FILTER")(f("isPaid", "notBetween", Some((true, false)))) // C922
    expectCode("INVALID_FILTER")(f("customerId", "notBetween", Some(("a", "b")))) // C923
  }

  test("C924-C929: nullability gate, array/scalar mismatch, scope and ACL") {
    expectCode("INVALID_FILTER")(f("status", "isNull", None))     // C924 non-nullable
    expectCode("INVALID_FILTER")(f("status", "isNotNull", None))  // C925
    expectCode("INVALID_FILTER")(f("status", "arrayContains", Some("x"))) // C926 scalar col
    expectCode("INVALID_FILTER")(f("priorities", "=", Some(1)))   // C927 scalar op on array
    expectCode("INVALID_FILTER")(QueryDefinition("orders",        // C928 non-joined qualifier
      filters = Seq(QueryFilter("category", "=", Some("x"), table = Some("products")))))
    expectCode("ACCESS_DENIED")(f("total", ">", Some(0)), viewer) // C929 denied column
  }

  // ---- 12.3 value validity -------------------------------------------
  test("C930-C939: malformed between/levenshtein/in values") {
    expectCode("INVALID_VALUE")(f("total", "between", Some((0, null))))   // C930 missing to
    expectCode("INVALID_VALUE")(f("total", "notBetween", Some((0, null)))) // C931
    expectCode("INVALID_VALUE")(QueryDefinition("users",                  // C932 negative maxD
      filters = Seq(QueryFilter("firstName", "levenshteinLte", Some(("x", -1))))))
    // C933 fractional maxDistance is unrepresentable in the typed DSL; the
    // wire layer rejects it — see ContractNegativeSpec wire tests below.
    expectCode("INVALID_VALUE")(f("status", "in", Some(Seq.empty[Any])))  // C934
    expectCode("INVALID_VALUE")(f("status", "in", Some(Seq(1, 2))))       // C935 type mismatch
    expectCode("INVALID_VALUE")(f("status", "in", Some(Seq("a", null))))  // C936 null element
    expectCode("INVALID_VALUE")(f("total", "between", Some((null, 5))))   // C937
    expectCode("INVALID_VALUE")(f("total", "between", Some((5, null))))   // C938
    expectCode("INVALID_VALUE")(f("total", "between", Some(("a", "z"))))  // C939
  }

  test("C940-C947: array-op values, notIn values, missing fields") {
    expectCode("INVALID_VALUE")(QueryDefinition("products",               // C940
      filters = Seq(QueryFilter("labels", "arrayContains", Some(1)))))
    expectCode("INVALID_VALUE")(QueryDefinition("products",               // C941
      filters = Seq(QueryFilter("labels", "arrayContainsAll", Some(Seq.empty[Any])))))
    expectCode("INVALID_VALUE")(QueryDefinition("products",               // C942
      filters = Seq(QueryFilter("labels", "arrayContainsAny", Some(Seq(1))))))
    expectCode("INVALID_VALUE")(QueryDefinition("products",               // C943
      filters = Seq(QueryFilter("labels", "arrayContainsAll", Some(Seq("a", null))))))
    expectCode("INVALID_VALUE")(f("status", "notIn", Some(Seq.empty[Any]))) // C944
    expectCode("INVALID_VALUE")(f("status", "notIn", Some(Seq(1))))        // C945
    expectCode("INVALID_VALUE")(f("total", "between", Some((null, null)))) // C946
    expectCode("INVALID_VALUE")(QueryDefinition("users",                   // C947 missing text
      filters = Seq(QueryFilter("firstName", "levenshteinLte", Some(42)))))
  }

  // ---- 12.4 column filter validity -----------------------------------
  test("C950-C955: column-filter family rules (+ compatible-family positives)") {
    expectCode("INVALID_FILTER")(QueryDefinition("orders",   // C950 cross-family
      filters = Seq(QueryColumnFilter("total", ">", "status"))))
    assert(codes(QueryDefinition("orders",                   // C954 numeric family ok
      filters = Seq(QueryColumnFilter("quantity", ">", "total")))).isEmpty)
    assert(codes(QueryDefinition("invoices",                 // C955 temporal family ok
      filters = Seq(QueryColumnFilter("dueDate", "<", "issuedAt")))).isEmpty)
    expectCode("ACCESS_DENIED")(QueryDefinition("orders",    // C951 denied column
      filters = Seq(QueryColumnFilter("total", ">", "discount"))), viewer)
    expectCode("UNKNOWN_COLUMN")(QueryDefinition("orders",   // C952 missing refColumn
      filters = Seq(QueryColumnFilter("total", ">", "nonexistent"))))
    expectCode("INVALID_FILTER")(QueryDefinition("orders",   // C953 array column
      filters = Seq(QueryColumnFilter("priorities", "=", "quantity"))))
  }

  // ---- 12.5 join validity --------------------------------------------
  test("C960-C962: relation-less joins and denied join targets") {
    expectCode("INVALID_JOIN")(QueryDefinition("products",   // C960 no relation
      joins = Seq(QueryJoin("users"))))
    expectCode("ACCESS_DENIED")(QueryDefinition("orders",    // C961 denied table
      joins = Seq(QueryJoin("invoices"))), viewer)
    expectCode("INVALID_JOIN")(QueryDefinition("orders",     // C962 no transitive path
      joins = Seq(QueryJoin("products"), QueryJoin("samples"))))
  }

  // ---- 12.6 groupBy validity -----------------------------------------
  test("C970-C972: groupBy coverage, array groupBy, non-joined qualifier") {
    expectCode("INVALID_GROUP_BY")(QueryDefinition("orders", // C970
      columns = Some(Seq("status", "quantity")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "t"))))
    expectCode("INVALID_GROUP_BY")(QueryDefinition("orders", // C971 array col
      columns = Some(Nil), groupBy = Seq(QueryGroupBy("priorities")),
      aggregations = Seq(QueryAggregation("*", "count", "n"))))
    expectCode("INVALID_GROUP_BY")(QueryDefinition("orders", // C972 non-joined table
      columns = Some(Nil),
      groupBy = Seq(QueryGroupBy("category", table = Some("products"))),
      aggregations = Seq(QueryAggregation("*", "count", "n"))))
  }

  // ---- 12.7 having validity ------------------------------------------
  private def havingQ(h: QueryFilterNode*) = QueryDefinition("orders",
    columns = Some(Nil), groupBy = Seq(QueryGroupBy("status")),
    aggregations = Seq(QueryAggregation("total", "sum", "x")),
    having = h)

  test("C975-C983: having restricted to aggregation aliases + comparison ops") {
    expectCode("INVALID_HAVING")(havingQ(QueryFilter("nope", ">", Some(0))))     // C975
    expectCode("INVALID_HAVING")(havingQ(                                        // C976
      QueryFilter("x", ">", Some(0), table = Some("orders"))))
    expectCode("INVALID_HAVING")(havingQ(QueryFilterGroup("and",                 // C977
      Seq(QueryColumnFilter("x", ">", "x")))))
    expectCode("INVALID_HAVING")(havingQ(QueryFilterGroup("and",                 // C978
      Seq(QueryExistsFilter("products")))))
    expectCode("INVALID_HAVING")(havingQ(QueryFilter("x", "contains", Some("a")))) // C979
    expectCode("INVALID_HAVING")(havingQ(QueryFilter("x", "levenshteinLte", Some(("a", 1))))) // C980
    expectCode("INVALID_HAVING")(havingQ(QueryFilter("x", "arrayContains", Some("a")))) // C981
    expectCode("INVALID_HAVING")(havingQ(QueryColumnFilter("x", ">", "x")))      // C982
    expectCode("INVALID_HAVING")(havingQ(QueryExistsFilter("products")))         // C983
  }

  // ---- 12.8 orderBy validity -----------------------------------------
  test("C985-C987: orderBy scope and array columns") {
    expectCode("INVALID_ORDER_BY")(QueryDefinition("orders", // C985/C987 non-joined table
      orderBy = Seq(QueryOrderBy("category", table = Some("products")))))
    expectCode("INVALID_ORDER_BY")(QueryDefinition("orders", // C986 array col
      orderBy = Seq(QueryOrderBy("priorities"))))
  }

  // ---- 12.9 byIds validity -------------------------------------------
  test("C990-C994: byIds shape rules") {
    expectCode("INVALID_BY_IDS")(QueryDefinition("orders", byIds = Some(Nil))) // C990
    expectCode("INVALID_BY_IDS")(QueryDefinition("orders", byIds = Some(Seq(1)), // C991
      aggregations = Seq(QueryAggregation("total", "sum", "t")), columns = Some(Nil)))
    expectCode("INVALID_BY_IDS")(QueryDefinition("orderItems", byIds = Some(Seq(1, 2)))) // C992
    expectCode("INVALID_BY_IDS")(QueryDefinition("orders", byIds = Some(Seq(1)), // C994
      groupBy = Seq(QueryGroupBy("status")), columns = Some(Nil),
      aggregations = Seq(QueryAggregation("*", "count", "n"))))
  }

  // ---- 12.10 limit/offset validity -----------------------------------
  test("C995-C998: limit/offset rules incl. fractional via the wire layer") {
    expectCode("INVALID_LIMIT")(QueryDefinition("orders", limit = Some(-1)))  // C995
    expectCode("INVALID_LIMIT")(QueryDefinition("orders", offset = Some(10))) // C996
    expectCode("INVALID_LIMIT")(QueryDefinition("orders", limit = Some(10), offset = Some(-5))) // C997
    // C998: fractional limit is unrepresentable in the typed DSL; a raw
    // JSON payload must be rejected at the wire boundary (not truncated)
    val e = intercept[ValidationError] {
      graft.api.Json.parseQuery("""{"definition":{"from":"orders","limit":2.5}}""")
    }
    assert(e.errors.exists(_.code == "INVALID_LIMIT"))
    // …but an integral-valued float like 2.0 must be ACCEPTED: the JS
    // reference cannot distinguish 2.0 from 2 (Number.isInteger(2.0) is
    // true), so rejecting it would be a wire-compat divergence.
    val (q20, _) = graft.api.Json.parseQuery(
      """{"definition":{"from":"orders","limit":2.0,"offset":1e1}}""")
    assert(q20.limit.contains(2L) && q20.offset.contains(10L))
  }

  // ---- 12.11 aggregation validity ------------------------------------
  test("C1000-C1005: aggregation alias/shape rules") {
    expectCode("INVALID_AGGREGATION")(QueryDefinition("orders", columns = Some(Nil), // C1000
      aggregations = Seq(QueryAggregation("total", "sum", "x"),
        QueryAggregation("quantity", "sum", "x"))))
    expectCode("INVALID_AGGREGATION")(QueryDefinition("orders", // C1001
      columns = Some(Seq("status")), groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "status"))))
    expectCode("INVALID_AGGREGATION")(QueryDefinition("orders", columns = Some(Nil))) // C1002
    expectCode("INVALID_AGGREGATION")(QueryDefinition("orders", columns = Some(Nil), // C1003
      aggregations = Seq(QueryAggregation("priorities", "sum", "p"))))
    expectCode("INVALID_AGGREGATION")(QueryDefinition("orders", columns = Some(Nil), // C1004
      aggregations = Seq(QueryAggregation("price", "sum", "p", table = Some("products")))))
    expectCode("UNKNOWN_COLUMN")(QueryDefinition("orders", columns = Some(Nil), // C1005
      aggregations = Seq(QueryAggregation("nonexistent", "sum", "p"))))
  }

  // ---- 12.12 EXISTS validity -----------------------------------------
  test("C1010-C1013: EXISTS relation and count rules") {
    expectCode("INVALID_EXISTS")(QueryDefinition("products", // C1010 unrelated
      filters = Seq(QueryExistsFilter("users"))))
    expectCode("INVALID_EXISTS")(QueryDefinition("orders",   // C1011 negative count
      filters = Seq(QueryExistsFilter("events", count = Some(CountCond(">", -1))))))
    // C1012: fractional count value is unrepresentable typed; wire rejects
    val e = intercept[ValidationError] {
      graft.api.Json.parseQuery(
        """{"definition":{"from":"orders","filters":[{"table":"events","count":{"operator":">","value":1.5}}]}}""")
    }
    assert(e.errors.exists(_.code == "INVALID_EXISTS"))
    expectCode("INVALID_EXISTS")(QueryDefinition("orders",   // C1013 bad inner relation
      filters = Seq(QueryExistsFilter("events",
        filters = Seq(QueryExistsFilter("products"))))))
  }

  // ---- 12.13 / 12.14 -------------------------------------------------
  test("C1020: unknown role") {
    expectCode("UNKNOWN_ROLE")(QueryDefinition("orders"),
      ExecutionContext(userRoles = Some(Seq("ghostRole"))))
  }

  test("C1030: multiple errors collected in one ValidationError") {
    val cs = codes(QueryDefinition("orders",
      columns = Some(Seq("bad1")),
      filters = Seq(QueryFilter("bad2", "=", Some("x"))),
      limit = Some(-1)))
    assert(cs.size >= 3, s"expected >=3 collected errors, got $cs")
    assert(cs.contains("UNKNOWN_COLUMN") && cs.contains("INVALID_LIMIT"))
  }
}
