package graft

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.types._

/** Remaining contract-suite IDs not pinned elsewhere — each test cites its
  * CONTRACT_TESTS.md ID and asserts the exact row sets/values the reference
  * suite asserts against the shared seed data (dialect parameterization
  * collapses to one Spark run; ContractQuerySpec carries the first wave).
  */
class ContractSectionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  lazy val db: graft.api.MultiDb = ContractFixture.multiDb(spark)

  private def ids(r: QueryResult, key: String = "id"): Seq[Any] = r match {
    case DataResult(data, _, _) => data.map(_(key))
    case other => fail(s"expected DataResult, got $other")
  }
  private def data(r: QueryResult): Seq[Map[String, Any]] =
    r.asInstanceOf[DataResult].data
  private def q(d: QueryDefinition): QueryResult = db.query(d)
  private def idQuery(fs: QueryFilterNode*): QueryDefinition =
    QueryDefinition("samples", columns = Some(Seq("id")), filters = fs,
      orderBy = Seq(QueryOrderBy("id")))
  private def dbl(v: Any): Double = v match {
    case bd: java.math.BigDecimal => bd.doubleValue()
    case n: Number                => n.doubleValue()
  }

  // ---- 3.1 comparisons on boolean/uuid ---------------------------------

  test("C106: = on boolean column") {
    assert(ids(q(idQuery(QueryFilter("isActive", "=", Some(true))))) == Seq(1, 2, 5))
  }

  test("C107: != on boolean keeps the NULL row (IS DISTINCT FROM semantics)") {
    assert(ids(q(idQuery(QueryFilter("isActive", "!=", Some(true))))) == Seq(3, 4))
  }

  test("C108: = on uuid column") {
    assert(ids(q(idQuery(QueryFilter("externalId", "=", Some("uuid-s1"))))) == Seq(1))
  }

  // ---- 3.2 case-insensitive pattern variants ---------------------------

  test("C115/C117: icontains and notIcontains") {
    assert(ids(q(idQuery(QueryFilter("email", "icontains", Some("ALPHA"))))) == Seq(1))
    assert(ids(q(idQuery(QueryFilter("email", "notIcontains", Some("ALPHA"))))) ==
      Seq(2, 3, 4, 5))
  }

  test("C119/C121: istartsWith and iendsWith") {
    assert(ids(q(idQuery(QueryFilter("name", "istartsWith", Some("AL"))))) == Seq(1))
    assert(ids(q(idQuery(QueryFilter("email", "iendsWith", Some("@TEST.COM"))))) ==
      Seq(1, 2, 3, 4, 5))
  }

  // ---- 3.3 range operators on int/date ---------------------------------

  test("C132/C135: between and notBetween on int") {
    assert(ids(q(idQuery(QueryFilter("id", "between", Some((2, 4)))))) == Seq(2, 3, 4))
    assert(ids(q(idQuery(QueryFilter("id", "notBetween", Some((2, 4)))))) == Seq(1, 5))
  }

  test("C134: between on date") {
    val r = q(idQuery(QueryFilter("dueDate", "between", Some(("2024-02-01", "2024-05-01")))))
    assert(ids(r) == Seq(1, 2, 4))
  }

  // ---- 3.4 in on typed columns -----------------------------------------

  test("C142/C143/C144: in on int, uuid, decimal columns") {
    assert(ids(q(idQuery(QueryFilter("id", "in", Some(Seq(1, 3, 5)))))) == Seq(1, 3, 5))
    assert(ids(q(idQuery(QueryFilter("externalId", "in",
      Some(Seq("uuid-s1", "uuid-s2")))))) == Seq(1, 2))
    assert(ids(q(idQuery(QueryFilter("amount", "in", Some(Seq(100.00, 200.00)))))) ==
      Seq(1, 2))
  }

  // ---- 3.7 array operator variants -------------------------------------

  test("C175/C176: arrayContainsAll single element; arrayContains on string[]") {
    assert(ids(q(idQuery(QueryFilter("tags", "arrayContainsAll", Some(Seq("fast")))))) ==
      Seq(1, 3, 5))
    assert(ids(q(idQuery(QueryFilter("tags", "arrayContains", Some("fast"))))) ==
      Seq(1, 3, 5))
  }

  // ---- 3.8 cross-table column filter -----------------------------------

  test("C181: cross-table column filter samples.amount > sampleItems.amount") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", joinType = "inner", columns = Some(Seq("label")))),
      filters = Seq(QueryColumnFilter("amount", ">", "amount",
        table = Some("samples"), refTable = Some("sampleItems"))),
      orderBy = Seq(QueryOrderBy("id"), QueryOrderBy("label", table = Some("sampleItems")))))
    // s1(100)>itemA(25); s2(200)>itemC(40); s5(150)>itemE(10),itemF(20)
    assert(ids(r) == Seq(1, 2, 5, 5))
  }

  // ---- 3.10 table qualifiers -------------------------------------------

  test("C195: top-level filter with table qualifier targets the joined column") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", columns = Some(Seq("category")))),
      filters = Seq(QueryFilter("category", "=", Some("electronics"),
        table = Some("sampleItems"))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(data(r).forall(_("category") == "electronics"))
    assert(ids(r) == Seq(1, 3, 5)) // itemA, itemD, itemF
  }

  test("C196: explicit from-table qualifier behaves as if omitted") {
    val explicit = q(idQuery(QueryFilter("status", "=", Some("active"),
      table = Some("samples"))))
    val omitted = q(idQuery(QueryFilter("status", "=", Some("active"))))
    assert(ids(explicit) == ids(omitted) && ids(explicit) == Seq(1, 4))
  }

  // ---- 4. joins ---------------------------------------------------------

  test("C204: join with columns:[] feeds groupBy only — no item columns in SELECT") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      joins = Seq(QueryJoin("sampleItems", columns = Some(Nil))),
      groupBy = Seq(QueryGroupBy("category", table = Some("sampleItems"))),
      aggregations = Seq(QueryAggregation("*", "count", "cnt")),
      orderBy = Seq(QueryOrderBy("category", table = Some("sampleItems")))))
    val rows = data(r)
    assert(rows.forall(_.keySet == Set("cnt"))) // category itself not selected
    // groups ordered by the hidden category key: null, clothing, electronics, food
    assert(rows.map(_("cnt")) == Seq(1L, 2L, 3L, 1L))
  }

  test("C207: top-level qualified filter ≡ join-scoped filter") {
    val top = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", columns = Some(Seq("label")))),
      filters = Seq(QueryFilter("category", "=", Some("electronics"),
        table = Some("sampleItems"))),
      orderBy = Seq(QueryOrderBy("id"), QueryOrderBy("label", table = Some("sampleItems")))))
    val scoped = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", columns = Some(Seq("label")),
        filters = Seq(QueryFilter("category", "=", Some("electronics"))))),
      orderBy = Seq(QueryOrderBy("id"), QueryOrderBy("label", table = Some("sampleItems")))))
    assert(data(top) == data(scoped))
  }

  // ---- 5. aggregations --------------------------------------------------

  test("C300: COUNT(*) without groupBy returns one data row") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("*", "count", "total"))))
    assert(data(r).size == 1 && data(r).head("total").asInstanceOf[Long] >= 5L)
  }

  test("C302: AVG result type is decimal in meta") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("amount", "avg", "avgAmt"))))
    assert(r.meta.columns.find(_.apiName == "avgAmt").get.columnType == "decimal")
    assert(dbl(data(r).head("avgAmt")) == 160.0) // 800 / 5
  }

  test("C303: MIN preserves timestamp type") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("createdAt", "min", "earliest"))))
    assert(r.meta.columns.find(_.apiName == "earliest").get.columnType == "timestamp")
    assert(data(r).head("earliest") ==
      Timestamp.from(Instant.parse("2024-01-15T10:00:00Z")))
  }

  test("C304/C306: MAX value; multiple aggregations surface both aliases") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(
        QueryAggregation("amount", "max", "maxAmt"),
        QueryAggregation("*", "count", "cnt"))))
    val row = data(r).head
    assert(dbl(row("maxAmt")) == 300.0 && row("cnt") == 5L)
  }

  test("C308: aggregation-only query (columns: []) returns only the alias") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("amount", "sum", "totalAmt"))))
    assert(data(r).head.keySet == Set("totalAmt"))
    assert(dbl(data(r).head("totalAmt")) == 800.0)
  }

  test("C309: omitted columns with groupBy defaults to groupBy columns + aliases") {
    val r = q(QueryDefinition("samples",
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("amount", "sum", "totalAmt")),
      orderBy = Seq(QueryOrderBy("status"))))
    assert(data(r).head.keySet == Set("status", "totalAmt"))
    assert(data(r).map(_("status")) == Seq("active", "cancelled", "paid", "shipped"))
  }

  // ---- 6. GROUP BY & HAVING ---------------------------------------------

  test("C321: GROUP BY two columns") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("status", "isActive")),
      groupBy = Seq(QueryGroupBy("status"), QueryGroupBy("isActive")),
      aggregations = Seq(QueryAggregation("*", "count", "cnt"))))
    assert(data(r).size == 5) // (active,true) (paid,true) (cancelled,false) (active,null) (shipped,true)
  }

  test("C323: HAVING with OR group over two aliases") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(
        QueryAggregation("amount", "sum", "totalAmt"),
        QueryAggregation("amount", "avg", "avgAmt")),
      having = Seq(QueryFilterGroup("or", Seq(
        QueryFilter("totalAmt", ">", Some(250)),
        QueryFilter("avgAmt", ">", Some(150))))),
      orderBy = Seq(QueryOrderBy("status"))))
    assert(data(r).map(_("status")) == Seq("active", "paid"))
  }

  test("C324/C325: HAVING between and notBetween on an alias") {
    def having(op: String) = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("amount", "sum", "totalAmt")),
      having = Seq(QueryFilter("totalAmt", op, Some((100, 300)))),
      orderBy = Seq(QueryOrderBy("status"))))
    assert(data(having("between")).map(_("status")) == Seq("paid", "shipped"))
    assert(data(having("notBetween")).map(_("status")) == Seq("active", "cancelled"))
  }

  test("HAVING != is NULL-inclusive like the WHERE operator (C107 consistency)") {
    // SUM(discount) is NULL for 'paid' — IS DISTINCT FROM 0 keeps it
    val r = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("discount", "sum", "discountSum")),
      having = Seq(QueryFilter("discountSum", "!=", Some(0))),
      orderBy = Seq(QueryOrderBy("status"))))
    assert(data(r).map(_("status")) == Seq("active", "cancelled", "paid"))
  }

  test("column-vs-column != is NULL-inclusive (C107 consistency)") {
    // discount IS NULL for ids 2, 4 — IS DISTINCT FROM keeps them
    val r = q(idQuery(QueryColumnFilter("discount", "!=", "amount")))
    assert(ids(r) == Seq(1, 2, 3, 4, 5))
  }

  test("C326: HAVING isNull catches the all-NULL SUM group") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("discount", "sum", "discountSum")),
      having = Seq(QueryFilter("discountSum", "isNull"))))
    assert(data(r).map(_("status")) == Seq("paid"))
  }

  test("C327: negated HAVING group") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(
        QueryAggregation("amount", "sum", "totalAmt"),
        QueryAggregation("*", "count", "cnt")),
      having = Seq(QueryFilterGroup("or", Seq(
        QueryFilter("totalAmt", ">", Some(100)),
        QueryFilter("cnt", ">", Some(1))), not = true))))
    assert(data(r).map(_("status")) == Seq("cancelled"))
  }

  test("C329: GROUP BY joined-table column") {
    val r = q(QueryDefinition("samples",
      joins = Seq(QueryJoin("sampleItems", joinType = "inner")),
      groupBy = Seq(QueryGroupBy("category", table = Some("sampleItems"))),
      aggregations = Seq(QueryAggregation("*", "count", "cnt")),
      orderBy = Seq(QueryOrderBy("category", table = Some("sampleItems")))))
    assert(data(r).map(m => (m("category"), m("cnt"))) ==
      Seq(("clothing", 2L), ("electronics", 3L), ("food", 1L)))
  }

  // ---- 7. ORDER BY ------------------------------------------------------

  test("C402: multi-column ordering status asc, amount desc") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      orderBy = Seq(QueryOrderBy("status"), QueryOrderBy("amount", "desc"))))
    assert(ids(r) == Seq(4, 1, 3, 2, 5))
  }

  test("C403: ORDER BY joined-table column") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", joinType = "inner",
        columns = Some(Seq("category")))),
      orderBy = Seq(QueryOrderBy("category", table = Some("sampleItems")))))
    val cats = data(r).map(_("category").asInstanceOf[String])
    assert(cats == cats.sorted && cats.size == 6)
  }

  // ---- 8. byIds ---------------------------------------------------------

  test("C500/C501: byIds returns matching rows; unknown ids are skipped") {
    assert(ids(q(QueryDefinition("samples", columns = Some(Seq("id")),
      byIds = Some(Seq(1, 2)), orderBy = Seq(QueryOrderBy("id"))))) == Seq(1, 2))
    assert(ids(q(QueryDefinition("samples", columns = Some(Seq("id")),
      byIds = Some(Seq(1, 999)), orderBy = Seq(QueryOrderBy("id"))))) == Seq(1))
  }

  test("C503: byIds with join") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      byIds = Some(Seq(1, 2)),
      joins = Seq(QueryJoin("sampleItems", columns = Some(Seq("label")))),
      orderBy = Seq(QueryOrderBy("id"), QueryOrderBy("label", table = Some("sampleItems")))))
    assert(data(r).map(m => (m("id"), m("label"))) ==
      Seq((1, "item-A"), (1, "item-B"), (2, "item-C")))
  }

  test("C504: byIds with column selection") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id", "status")),
      byIds = Some(Seq(1))))
    assert(data(r) == Seq(Map("id" -> 1, "status" -> "active")))
  }

  // ---- 9. EXISTS --------------------------------------------------------

  test("C607: exists flag is ignored when count present") {
    val r = q(idQuery(QueryExistsFilter("sampleItems", exists = false,
      count = Some(CountCond(">=", 1)))))
    assert(ids(r) == Seq(1, 2, 3, 5))
  }

  test("C609: EXISTS combined with a join") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", joinType = "inner",
        columns = Some(Seq("label")))),
      filters = Seq(QueryExistsFilter("samples")),
      orderBy = Seq(QueryOrderBy("id"), QueryOrderBy("label", table = Some("sampleItems")))))
    // managers (1, 2) with their item rows
    assert(ids(r) == Seq(1, 1, 2))
  }

  test("C610/C612: counted EXISTS > and !=") {
    assert(ids(q(idQuery(QueryExistsFilter("sampleItems",
      count = Some(CountCond(">", 1)))))) == Seq(1, 5))
    assert(ids(q(idQuery(QueryExistsFilter("sampleItems",
      count = Some(CountCond("!=", 0)))))) == Seq(1, 2, 3, 5))
  }

  // ---- 10. access control ----------------------------------------------

  private def as(user: String*)(d: QueryDefinition): QueryResult =
    db.query(d, ExecutionContext(userRoles = Some(user)))
  private def denied(body: => QueryResult): Unit = {
    val e = intercept[ValidationError](body)
    assert(e.errors.exists(_.code == "ACCESS_DENIED"), e.errors)
  }

  test("C701: restricted role sees the requested subset") {
    val r = as("tenant-user")(QueryDefinition("orders",
      columns = Some(Seq("id", "total", "status"))))
    assert(r.meta.columns.map(_.apiName).toSet == Set("id", "total", "status"))
  }

  test("C703/C704/C705/C707: access denials on table, column, role, joined table") {
    denied(as("tenant-user")(QueryDefinition("events")))
    denied(as("tenant-user")(QueryDefinition("orders",
      columns = Some(Seq("id", "internalNote")))))
    denied(as("no-access")(QueryDefinition("orders")))
    denied(as("tenant-user")(QueryDefinition("orders",
      joins = Seq(QueryJoin("events")))))
  }

  test("C711: union of two user roles adds permissions") {
    val r = as("tenant-user", "viewer")(QueryDefinition("orders", limit = Some(1)))
    assert(r.meta.columns.map(_.apiName).toSet ==
      Set("id", "total", "status", "createdAt", "quantity"))
  }

  test("C722: omitted service scope imposes no restriction") {
    val r = as("admin")(QueryDefinition("orders", limit = Some(1)))
    assert(r.meta.columns.size == ContractFixture.ordersTable.columns.size)
  }

  test("C723: one scope with zero roles denies regardless of the other") {
    denied(db.query(QueryDefinition("orders"),
      ExecutionContext(userRoles = Some(Nil), serviceRoles = Some(Seq("orders-service")))))
  }

  test("C724: disjoint cross-scope column grants intersect to nothing") {
    denied(db.query(QueryDefinition("users"),
      ExecutionContext(userRoles = Some(Seq("scope-a")),
        serviceRoles = Some(Seq("scope-b")))))
  }

  test("C725: wildcard ∩ specific narrows to the specific grant") {
    val ctx = ExecutionContext(userRoles = Some(Seq("admin")),
      serviceRoles = Some(Seq("viewer")))
    val r = db.query(QueryDefinition("users", orderBy = Seq(QueryOrderBy("id"))), ctx)
    assert(r.meta.columns.map(_.apiName).toSet == Set("id", "firstName"))
    val e = intercept[ValidationError](db.query(
      QueryDefinition("users", columns = Some(Seq("id", "email"))), ctx))
    assert(e.errors.exists(_.code == "ACCESS_DENIED"))
  }

  // ---- 11. masking ------------------------------------------------------

  test("C801: admin sees unmasked meta") {
    val r = as("admin")(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      limit = Some(1)))
    assert(!r.meta.columns.find(_.apiName == "total").get.masked)
  }

  test("C813: different masking functions across columns in one query") {
    val r = as("analyst")(QueryDefinition("users",
      columns = Some(Seq("id", "email", "phone", "firstName")), limit = Some(1)))
    val byName = r.meta.columns.map(c => c.apiName -> c.masked).toMap
    assert(!byName("email") && byName("phone") && byName("firstName"))
  }

  test("C814: date masking truncates a timestamp to Jan 1, midnight") {
    val r = as("analyst")(QueryDefinition("orders",
      columns = Some(Seq("id", "createdAt")), orderBy = Seq(QueryOrderBy("id"))))
    assert(data(r).head("createdAt") == Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  // ---- 18. edge cases ---------------------------------------------------

  test("C1702: large in-list executes") {
    val vals = (1 to 60).map(i => s"status-$i") :+ "active"
    val r = q(idQuery(QueryFilter("status", "in", Some(vals))))
    assert(ids(r) == Seq(1, 4))
  }

  test("C1711/C1716: explicit relaxed freshness offloads to the replica") {
    for (fresh <- Seq("seconds", "hours")) {
      val r = q(QueryDefinition("orders", columns = Some(Seq("id")),
        freshness = Some(fresh), orderBy = Seq(QueryOrderBy("id"))))
      assert(r.meta.strategy == "materialized", fresh)
      assert(r.meta.targetDatabase == "ch-analytics")
      val used = r.meta.tablesUsed.head
      assert(used.source == "materialized" &&
        used.physicalName == "default.orders_replica")
      assert(ids(r) == Seq(1, 2, 3, 4, 5)) // replica serves the same rows
    }
  }

  test("C1715: freshness realtime never offloads") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id")),
      freshness = Some("realtime")))
    assert(r.meta.strategy == "direct")
  }

  test("C1712: cross-DB join without a replica path reports trino-cross-db") {
    val r = q(QueryDefinition("events", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("users", columns = Some(Nil)))))
    assert(r.meta.strategy == "trino-cross-db")
  }
}
