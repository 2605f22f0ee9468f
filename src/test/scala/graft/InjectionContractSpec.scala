package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.types._
import graft.validation.Validator
import graft.meta.MetadataIndex

/** Port of the reference's SQL-injection contract (CONTRACT_TESTS.md §16,
  * SECURITY.md): identifier/enum-keyword injection must be REJECTED by
  * validation before any plan is built, and hostile filter VALUES must be
  * treated as literal data. In this engine values become Catalyst `Literal`
  * expressions (never SQL text), which is the parameterization layer; the
  * sql-only surface quote-doubles identifiers (SqlText.ident). Spark has a
  * single execution dialect, so the reference's PG/CH/Trino value-vector
  * triplets collapse into one set, run against both source namespaces.
  * Contract IDs cited inline.
  */
class InjectionContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private lazy val db = ContractFixture.multiDb(spark)
  private val index = MetadataIndex.build(ContractFixture.config())
  private val roles = ContractFixture.roles.map(r => r.id -> r).toMap
  private val admin = ExecutionContext(userRoles = Some(Seq("admin")))

  private def codes(q: QueryDefinition): Seq[String] =
    Validator.validate(index, roles, q, admin).map(_.code)
  private def rejected(code: String)(q: QueryDefinition): Unit =
    assert(codes(q).contains(code), s"expected $code, got ${codes(q)}")

  /** expectInjectionSafe('escaped'): the query must SUCCEED with the value
    * treated as data — here: it matches nothing (no fixture row contains a
    * DROP-TABLE payload), and afterwards the table is still queryable.
    */
  private def injectionSafe(q: QueryDefinition, expectRows: Int = 0): Unit = {
    val res = db.query(q, admin).asInstanceOf[DataResult]
    assert(res.data.size == expectRows,
      s"hostile value should match $expectRows rows, got ${res.data.size}")
    val alive = db.query(QueryDefinition(q.from, limit = Some(1)), admin)
    assert(alive.asInstanceOf[DataResult].data.nonEmpty, s"${q.from} unreachable after query")
  }

  private val drop = "'; DROP TABLE orders; --"

  // ---- 16.1 identifier & structural injection (C1404-C1473) ----------
  test("C1404/C1418/C1405/C1411/C1421/C1466: identifier payloads rejected pre-plan") {
    rejected("UNKNOWN_COLUMN")(QueryDefinition("orders",
      columns = Some(Seq("id\"; DROP TABLE orders; --"))))             // C1404
    rejected("UNKNOWN_COLUMN")(QueryDefinition("events",
      columns = Some(Seq("id`; DROP TABLE events; --"))))              // C1418
    rejected("UNKNOWN_TABLE")(QueryDefinition("orders; DROP TABLE orders")) // C1405
    rejected("UNKNOWN_TABLE")(QueryDefinition("orders",
      filters = Seq(QueryExistsFilter("users; DROP TABLE users"))))    // C1411
    rejected("UNKNOWN_COLUMN")(QueryDefinition("orders",               // C1421
      joins = Seq(QueryJoin("users", columns = Some(Seq("id\"; DROP TABLE users; --"))))))
    rejected("UNKNOWN_TABLE")(QueryDefinition("orders",
      joins = Seq(QueryJoin("users; DROP TABLE users"))))              // C1466
  }

  test("C1460-C1465: enum-like keyword fields validated at runtime") {
    rejected("INVALID_ORDER_BY")(QueryDefinition("orders",             // C1460
      orderBy = Seq(QueryOrderBy("id", "asc; DROP TABLE orders;--"))))
    rejected("INVALID_AGGREGATION")(QueryDefinition("orders", columns = Some(Nil), // C1461
      aggregations = Seq(QueryAggregation("total", "sum); DROP TABLE orders;--", "x"))))
    rejected("INVALID_FILTER")(QueryDefinition("orders",               // C1462
      filters = Seq(QueryColumnFilter("id", ") OR 1=1 --", "quantity"))))
    rejected("INVALID_FILTER")(QueryDefinition("orders",               // C1463
      filters = Seq(QueryFilterGroup("and 1=1);--",
        Seq(QueryFilter("status", "=", Some("active")))))))
    rejected("INVALID_EXISTS")(QueryDefinition("orders",               // C1464
      filters = Seq(QueryExistsFilter("events",
        count = Some(CountCond(") UNION SELECT 1;--", 1))))))
    rejected("INVALID_HAVING")(QueryDefinition("orders", columns = Some(Nil), // C1465 (group in having)
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "x")),
      having = Seq(QueryFilterGroup("or 1=1);--",
        Seq(QueryFilter("x", ">", Some(0)))))))
  }

  test("C1467-C1473: injected identifiers in orderBy/groupBy/agg/having/filter") {
    rejected("INVALID_ORDER_BY")(QueryDefinition("orders",             // C1467
      orderBy = Seq(QueryOrderBy("id\"; DROP TABLE orders;--"))))
    rejected("UNKNOWN_COLUMN")(QueryDefinition("orders", columns = Some(Nil), // C1468
      groupBy = Seq(QueryGroupBy("status\"; DROP TABLE orders;--")),
      aggregations = Seq(QueryAggregation("total", "sum", "x"))))
    rejected("UNKNOWN_COLUMN")(QueryDefinition("orders", columns = Some(Nil), // C1469
      aggregations = Seq(QueryAggregation("total\"; DROP TABLE orders;--", "sum", "x"))))
    rejected("INVALID_HAVING")(QueryDefinition("orders", columns = Some(Nil), // C1470
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "x")),
      having = Seq(QueryFilter("x\"; DROP TABLE orders;--", ">", Some(0)))))
    rejected("INVALID_HAVING")(QueryDefinition("orders", columns = Some(Nil), // C1471
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "x")),
      having = Seq(QueryFilter("x", "> 0); DROP TABLE orders;--", Some(0)))))
    rejected("INVALID_FILTER")(QueryDefinition("orders",               // C1472
      filters = Seq(QueryFilter("status", "= 1); DROP TABLE orders;--", Some("active")))))
    rejected("UNKNOWN_COLUMN")(QueryDefinition("orders",               // C1473
      filters = Seq(QueryFilter("status\"; DROP TABLE orders;--", "=", Some("active")))))
  }

  // ---- 16.2 aggregation alias injection (C1412-C1451) ----------------
  test("C1412-C1451: hostile aliases survive as data; sql-only quote-doubles") {
    val alias = "x\"; DROP TABLE orders;--"
    val q = QueryDefinition("orders", columns = Some(Nil),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", alias)),
      having = Seq(QueryFilter(alias, ">", Some(0))),       // C1414 HAVING ref
      orderBy = Seq(QueryOrderBy(alias)))                   // C1415 ORDER BY ref
    val res = db.query(q, admin).asInstanceOf[DataResult]
    assert(res.data.nonEmpty && res.data.head.contains(alias)) // alias is data
    // sql-only surface: identifier is quote-doubled, never raw (C1412/C1419/C1422)
    val sql = db.query(q.copy(executeMode = "sql-only"), admin).asInstanceOf[SqlResult].sql
    assert(sql.contains("\"x\"\"; DROP TABLE orders;--\""), s"alias not escaped in: $sql")
    assert(!sql.contains("\"x\"; DROP"), "alias quoting broken out")
    val backtick = "x`; DROP TABLE events;--" // C1413/C1419/C1448/C1449
    val qb = QueryDefinition("events", columns = Some(Nil),
      groupBy = Seq(QueryGroupBy("type")),
      aggregations = Seq(QueryAggregation("*", "count", backtick)),
      orderBy = Seq(QueryOrderBy(backtick)))
    assert(db.query(qb, admin).asInstanceOf[DataResult].data.head.contains(backtick))
  }

  // ---- 16.3-16.5 filter value injection (collapsed dialects) ---------
  test("C1400/C1416/C1420: '=' value injection is literal data") {
    injectionSafe(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "=", Some(drop)))))
    injectionSafe(QueryDefinition("events",
      filters = Seq(QueryFilter("type", "=", Some("'; DROP TABLE events; --")))))
  }

  test("C1401/C1454/C1455: like value injection") {
    injectionSafe(QueryDefinition("users",
      filters = Seq(QueryFilter("email", "like", Some(s"%$drop%")))))
  }

  test("C1402/C1424/C1429/C1431/C1437/C1442: contains/icontains escapeLike + literal") {
    injectionSafe(QueryDefinition("users",
      filters = Seq(QueryFilter("email", "contains", Some("'; DROP TABLE --")))))
    injectionSafe(QueryDefinition("users",
      filters = Seq(QueryFilter("email", "icontains", Some("'; DROP TABLE users; --")))))
  }

  test("C1403/C1432/C1456/C1457: string bounds on numeric column REJECTED") {
    rejected("INVALID_VALUE")(QueryDefinition("orders",
      filters = Seq(QueryFilter("total", "between", Some(("0; DROP TABLE orders", 100))))))
    rejected("INVALID_VALUE")(QueryDefinition("orders",
      filters = Seq(QueryFilter("total", "notBetween", Some(("0; DROP TABLE orders", 100))))))
  }

  test("C1406/C1407/C1423/C1428/C1441/C1452: in/notIn element injection") {
    injectionSafe(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "in", Some(Seq(s"active$drop"))))))
    val all = db.query(QueryDefinition("orders"), admin).asInstanceOf[DataResult].data.size
    injectionSafe(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "notIn", Some(Seq(s"active$drop"))))),
      expectRows = all) // hostile element matches nothing → notIn keeps all
  }

  test("C1408/C1426/C1430: levenshteinLte text injection") {
    injectionSafe(QueryDefinition("users",
      filters = Seq(QueryFilter("firstName", "levenshteinLte",
        Some(("'; DROP TABLE users; --", 3))))))
  }

  test("C1409/C1434/C1435/C1439/C1440/C1417: array-op value injection") {
    injectionSafe(QueryDefinition("products",
      filters = Seq(QueryFilter("labels", "arrayContains", Some(s"sale$drop")))))
    injectionSafe(QueryDefinition("products",
      filters = Seq(QueryFilter("labels", "arrayContainsAll", Some(Seq(s"sale$drop"))))))
    injectionSafe(QueryDefinition("products",
      filters = Seq(QueryFilter("labels", "arrayContainsAny", Some(Seq(s"sale$drop"))))))
  }

  test("C1410/C1446/C1447: byIds value injection on uuid PK") {
    injectionSafe(QueryDefinition("users", byIds = Some(Seq("'; DROP TABLE users; --"))))
  }

  test("C1433/C1453/C1427/C1436/C1458/C1459: startsWith/endsWith injection") {
    injectionSafe(QueryDefinition("users",
      filters = Seq(QueryFilter("email", "startsWith", Some(drop)))))
    injectionSafe(QueryDefinition("users",
      filters = Seq(QueryFilter("email", "endsWith", Some(drop)))))
  }

  test("C1443-C1445: array ops on non-joined table rejected") {
    rejected("INVALID_FILTER")(QueryDefinition("events",
      joins = Seq(QueryJoin("users")),
      filters = Seq(QueryFilter("labels", "arrayContains",
        Some("x'; DROP TABLE products; --"), table = Some("products")))))
  }

  // ---- 16.6 advanced vectors (C1474-C1488) ---------------------------
  test("C1474-C1488: backslash, null byte, unicode quote, nesting, comments") {
    val vectors = Seq(
      "\\'; DROP TABLE orders; --",      // C1474-C1476 backslash-quote
      " '; DROP TABLE orders; --",  // C1477-C1479 null byte
      "ʼ; DROP TABLE orders; --",   // C1480-C1482 unicode apostrophe
      "'''; DROP TABLE orders; --",      // C1483-C1485 nested triple quote
      "x' /**/; DROP TABLE orders; --",  // C1486-C1488 comment injection
      "x'\n; DROP TABLE orders; --",     // newline payload split
    )
    vectors.foreach { v =>
      injectionSafe(QueryDefinition("orders",
        filters = Seq(QueryFilter("status", "=", Some(v)))))
      injectionSafe(QueryDefinition("events",
        filters = Seq(QueryFilter("type", "=", Some(v)))))
    }
  }
}
