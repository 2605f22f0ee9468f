package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.types._

/** Behavioral contract tests against the ported fixture — assertions pin the
  * exact row counts/values the reference contract suite pins
  * (CONTRACT_TESTS.md sections 3-9; dialect parameterization collapses to one
  * Spark run).
  */
class ContractQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  lazy val db: graft.api.MultiDb = ContractFixture.multiDb(spark)

  private def ids(r: QueryResult, key: String = "id"): Seq[Any] = r match {
    case DataResult(data, _, _) => data.map(_(key))
    case other => fail(s"expected DataResult, got $other")
  }
  private def data(r: QueryResult): Seq[Map[String, Any]] =
    r.asInstanceOf[DataResult].data

  private def q(d: QueryDefinition): QueryResult = db.query(d)

  // ---- simple filters (C100 ff) -----------------------------------------

  test("= filter: samples status=active -> ids 1,4") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("status", "=", Some("active"))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 4))
  }

  test("!= filter (C101)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("status", "!=", Some("active"))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(2, 3, 5))
  }

  test("> < >= <= on decimal pin the spec seed rows (C102-C105)") {
    def amounts(op: String, v: Double): Seq[Any] =
      ids(q(QueryDefinition("samples", columns = Some(Seq("id")),
        filters = Seq(QueryFilter("amount", op, Some(v))),
        orderBy = Seq(QueryOrderBy("id")))))
    assert(amounts(">", 100.0) == Seq(2, 4, 5))  // C102
    assert(amounts("<", 200.0) == Seq(1, 3, 5))  // C103
    assert(amounts(">=", 150.0) == Seq(2, 4, 5)) // C104
    assert(amounts("<=", 100.0) == Seq(1, 3))    // C105
  }

  test("in / notIn (C140/C141)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("category", "in", Some(Seq("electronics", "food")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 3, 4, 5))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("category", "notIn", Some(Seq("electronics")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(2, 4))
  }

  test("like / notLike / ilike / notIlike case sensitivity (C110-C113)") {
    def byOp(op: String, v: String): Seq[Any] =
      ids(q(QueryDefinition("samples", columns = Some(Seq("id")),
        filters = Seq(QueryFilter("email", op, Some(v))),
        orderBy = Seq(QueryOrderBy("id")))))
    assert(byOp("like", "%@test%") == Seq(1, 2, 3, 4, 5))      // C110
    assert(byOp("notLike", "%alpha%") == Seq(2, 3, 4, 5))      // C111
    assert(byOp("ilike", "%TEST%") == Seq(1, 2, 3, 4, 5))      // C112
    assert(byOp("notIlike", "%ALPHA%") == Seq(2, 3, 4, 5))     // C113
    // like is case-sensitive: 'a%' on a capitalized name matches nothing
    val r3 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("name", "like", Some("a%")))))
    assert(ids(r3).isEmpty)
  }

  test("contains escapes LIKE wildcards; startsWith/endsWith (C114/C116/C118/C120/C122/C123)") {
    def f(colName: String, op: String, v: String): Seq[Any] =
      ids(q(QueryDefinition("samples", columns = Some(Seq("id")),
        filters = Seq(QueryFilter(colName, op, Some(v))),
        orderBy = Seq(QueryOrderBy("id")))))
    assert(f("email", "contains", "alpha") == Seq(1))                 // C114
    assert(f("email", "notContains", "alpha") == Seq(2, 3, 4, 5))     // C116
    assert(f("name", "startsWith", "Al") == Seq(1))                   // C118
    assert(f("email", "endsWith", "@test.com") == Seq(1, 2, 3, 4, 5)) // C120
    // wildcards in the value match literally, never as LIKE metachars
    assert(f("name", "contains", "Al%ha").isEmpty)                    // C122
    assert(f("name", "contains", "Al_ha").isEmpty)                    // C123
    assert(f("email", "contains", "%").isEmpty)
    assert(f("name", "istartsWith", "eps") == Seq(5))
    assert(f("name", "iendsWith", "TA") == Seq(2, 4)) // Beta, Delta
  }

  test("between / notBetween inclusive (C130/C131)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("amount", "between", Some((100.0, 200.0)))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 2, 5))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("amount", "notBetween", Some((100.0, 200.0)))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(3, 4))
  }

  test("timestamp between accepts ISO8601 with Z (C133 lesson)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("createdAt", "between",
        Some(("2024-02-01T00:00:00Z", "2024-04-30T23:59:59Z")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(2, 3, 4))
  }

  test("isNull / isNotNull (C150/C151)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("discount", "isNull")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(2, 4))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("discount", "isNotNull")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(1, 3, 5)) // C151
    val r3 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("note", "isNotNull")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r3) == Seq(1, 3, 5))
  }

  test("levenshteinLte (C160)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("name", "levenshteinLte", Some(("Alpho", 1))))))
    assert(ids(r) == Seq(1))
  }

  // ---- array operators (C150 ff) ---------------------------------------

  test("arrayContains on string[] and int[] (C170)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("tags", "arrayContains", Some("fast"))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 3, 5))
    // C170 exact spec case: int[] scores arrayContains 1 → ids 1, 5
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("scores", "arrayContains", Some(1))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(1, 5))
  }

  test("arrayContainsAll / arrayContainsAny (C171/C172)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("tags", "arrayContainsAll", Some(Seq("fast", "new")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 5))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("tags", "arrayContainsAny", Some(Seq("slow", "new")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(1, 2, 5))
  }

  test("arrayIsEmpty vs NULL array are distinct (C173/C174, C152/C153)") {
    // scores: sample 3 = null, sample 4 = [] — empty matches only sample 4
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("scores", "arrayIsEmpty"))))
    assert(ids(r) == Seq(4))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("scores", "arrayIsNotEmpty")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(1, 2, 5))
    val r3 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("scores", "isNull"))))
    assert(ids(r3) == Seq(3))
  }

  // ---- groups / column filters ----------------------------------------

  test("plain OR / plain AND / deep 3-level groups (C190/C191/C194)") {
    val or = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("or", Seq(
        QueryFilter("status", "=", Some("active")),
        QueryFilter("status", "=", Some("paid"))))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(or) == Seq(1, 2, 4)) // C190
    val and = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("and", Seq(
        QueryFilter("status", "=", Some("active")),
        QueryFilter("amount", ">", Some(100.0)))))))
    assert(ids(and) == Seq(4)) // C191
    // C194: ((active AND amount > 50) OR (paid AND NOT (amount < 100)))
    val deep = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("or", Seq(
        QueryFilterGroup("and", Seq(
          QueryFilter("status", "=", Some("active")),
          QueryFilter("amount", ">", Some(50.0)))),
        QueryFilterGroup("and", Seq(
          QueryFilter("status", "=", Some("paid")),
          QueryFilterGroup("and", Seq(
            QueryFilter("amount", "<", Some(100.0))), not = true)))))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(deep) == Seq(1, 2, 4))
  }

  test("nested or/and group with not (C192/C193)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("or", Seq(
        QueryFilter("status", "=", Some("paid")),
        QueryFilterGroup("and", Seq(
          QueryFilter("category", "=", Some("electronics")),
          QueryFilter("amount", "<", Some(120.0))))))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 2, 3))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("or", Seq(
        QueryFilter("status", "=", Some("paid")),
        QueryFilter("status", "=", Some("active"))), not = true)),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(3, 5))
  }

  test("column-vs-column filter (C180)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryColumnFilter("amount", ">", "discount")),
      orderBy = Seq(QueryOrderBy("id"))))
    // rows with non-null discount where amount > discount: 1,3,5
    assert(ids(r) == Seq(1, 3, 5))
  }

  // ---- joins (C200 ff) -------------------------------------------------

  test("left join keeps unmatched; inner join drops; join column selection (C200/C201/C203)") {
    val left = q(QueryDefinition("orders", columns = Some(Seq("id", "status")),
      joins = Seq(QueryJoin("products", columns = Some(Seq("name")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(data(left).size == 5) // order 4 has null productId, kept
    assert(data(left).find(_("id") == 4).get("name") == null)
    // C203: only the selected joined column rides along, nothing else
    assert(data(left).head.keySet == Set("id", "status", "name"))
    val inner = q(QueryDefinition("orders", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("products", joinType = "inner", columns = Some(Nil))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(inner) == Seq(1, 2, 3, 5))
  }

  test("column collision after join qualifies keys as table.column (C206)") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id", "status")),
      joins = Seq(QueryJoin("users", columns = Some(Seq("id", "firstName")))),
      filters = Seq(QueryFilter("id", "=", Some(1))),
      orderBy = Seq(QueryOrderBy("id"))))
    val row = data(r).head
    assert(row.keySet == Set("orders.id", "status", "users.id", "firstName"))
    assert(row("orders.id") == 1 && row("users.id") == "uuid-c1")
  }

  test("transitive join: samples -> sampleItems -> sampleDetails (C202)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      joins = Seq(
        QueryJoin("sampleItems", joinType = "inner", columns = Some(Seq("label"))),
        QueryJoin("sampleDetails", joinType = "inner", columns = Some(Seq("info")))),
      orderBy = Seq(QueryOrderBy("id"),
        QueryOrderBy("label", table = Some("sampleItems")))))
    // items with details: 1,2,3,5 → samples 1,1,2,5
    assert(ids(r) == Seq(1, 1, 2, 5))
  }

  test("join-scoped filter turns left join into inner semantics (C205)") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("products", columns = Some(Nil),
        filters = Seq(QueryFilter("category", "=", Some("electronics"))))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 3, 5)) // order 2 (clothing) and 4 (null) drop out
  }

  // ---- aggregations (C300 ff) ------------------------------------------

  test("count/sum/avg/min/max with groupBy (C301 among C300-C306)") {
    val r = q(QueryDefinition("samples",
      columns = Some(Seq("category")),
      groupBy = Seq(QueryGroupBy("category")),
      aggregations = Seq(
        QueryAggregation("*", "count", "n"),
        QueryAggregation("amount", "sum", "totalAmount"),
        QueryAggregation("amount", "avg", "avgAmount"),
        QueryAggregation("amount", "min", "minAmount"),
        QueryAggregation("amount", "max", "maxAmount")),
      orderBy = Seq(QueryOrderBy("category"))))
    val rows = data(r)
    assert(rows.map(_("category")) == Seq("clothing", "electronics", "food"))
    val elec = rows(1)
    assert(elec("n") == 3L)
    assert(elec("totalAmount").asInstanceOf[java.math.BigDecimal].doubleValue() == 300.0)
    assert(elec("avgAmount").asInstanceOf[java.math.BigDecimal].doubleValue() == 100.0)
    assert(elec("minAmount").asInstanceOf[java.math.BigDecimal].doubleValue() == 50.0)
    assert(elec("maxAmount").asInstanceOf[java.math.BigDecimal].doubleValue() == 150.0)
  }

  test("count(col) skips nulls; SUM over nullable skips nulls (C305/C310)") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(
        QueryAggregation("*", "count", "all"),
        QueryAggregation("discount", "count", "withDiscount"))))
    val row = data(r).head
    assert(row("all") == 5L && row("withDiscount") == 3L) // C305
    // C310: SUM(discount) skips NULLs → 10.00 + 5.00 + 0.00
    val s = q(QueryDefinition("samples", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("discount", "sum", "discountSum"))))
    assert(data(s).head("discountSum")
      .asInstanceOf[java.math.BigDecimal].doubleValue() == 15.0)
  }

  test("sum over all-null slice returns NULL (C310 nuance)") {
    val r = q(QueryDefinition("samples", columns = Some(Nil),
      filters = Seq(QueryFilter("id", "in", Some(Seq(2, 4)))),
      aggregations = Seq(QueryAggregation("discount", "sum", "s"))))
    assert(data(r).head("s") == null)
  }

  test("GROUP BY status + HAVING totalAmt>100 + ORDER BY agg alias (C320/C322/C328)") {
    val g = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      orderBy = Seq(QueryOrderBy("status"))))
    assert(data(g).map(_("status")) ==
      Seq("active", "cancelled", "paid", "shipped")) // C320
    val h = q(QueryDefinition("samples", columns = Some(Seq("status")),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("amount", "sum", "totalAmt")),
      having = Seq(QueryFilter("totalAmt", ">", Some(100.0))),
      orderBy = Seq(QueryOrderBy("totalAmt", "desc"))))
    // C322: active (400) / paid (200) / shipped (150) survive HAVING;
    // C328: ordered by the aggregation alias, descending
    assert(data(h).map(_("status")) == Seq("active", "paid", "shipped"))
  }

  test("having on aggregation alias (C322 count variant)") {
    val r = q(QueryDefinition("samples",
      columns = Some(Seq("category")),
      groupBy = Seq(QueryGroupBy("category")),
      aggregations = Seq(QueryAggregation("*", "count", "n")),
      having = Seq(QueryFilter("n", ">=", Some(2))),
      orderBy = Seq(QueryOrderBy("category"))))
    assert(data(r).map(_("category")) == Seq("electronics"))
  }

  test("aggregation over joined table column (C307)") {
    val r = q(QueryDefinition("samples",
      columns = Some(Seq("id")),
      joins = Seq(QueryJoin("sampleItems", joinType = "inner", columns = Some(Nil))),
      groupBy = Seq(QueryGroupBy("id")),
      aggregations = Seq(
        QueryAggregation("amount", "sum", "itemTotal", table = Some("sampleItems"))),
      orderBy = Seq(QueryOrderBy("id"))))
    val rows = data(r)
    assert(rows.map(_("id")) == Seq(1, 2, 3, 5))
    assert(rows.head("itemTotal").asInstanceOf[java.math.BigDecimal].doubleValue() == 145.0)
  }

  // ---- distinct / sort / pagination (C600s naming varies) ---------------

  test("distinct (C406)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("category")),
      distinct = true, orderBy = Seq(QueryOrderBy("category"))))
    assert(data(r).map(_("category")) == Seq("clothing", "electronics", "food"))
  }

  test("orderBy asc/desc + limit + offset pagination (C400/C401/C404/C405)") {
    val asc = q(QueryDefinition("samples", columns = Some(Seq("id")),
      orderBy = Seq(QueryOrderBy("amount", "asc"))))
    assert(ids(asc) == Seq(3, 1, 5, 2, 4)) // C400: 50,100,150,200,300
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      orderBy = Seq(QueryOrderBy("amount", "desc")), limit = Some(2), offset = Some(1)))
    assert(ids(r) == Seq(2, 5)) // C401/C405: 300,200,150,100,50 → skip 300 → 200,150
    val lim = q(QueryDefinition("samples", columns = Some(Seq("id")),
      orderBy = Seq(QueryOrderBy("id")), limit = Some(2)))
    assert(ids(lim) == Seq(1, 2)) // C404
  }

  test("orderBy on a column that is not selected") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("name")),
      orderBy = Seq(QueryOrderBy("amount", "desc")), limit = Some(2)))
    assert(data(r).map(_("name")) == Seq("Delta", "Beta"))
    assert(data(r).head.keySet == Set("name"))
  }

  // ---- EXISTS (C600 ff) -------------------------------------------------

  test("EXISTS / NOT EXISTS (C600/C601)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("sampleItems")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 2, 3, 5))
    val r2 = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("sampleItems", exists = false))))
    assert(ids(r2) == Seq(4))
  }

  test("EXISTS with sub-filters (C602)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("sampleItems",
        filters = Seq(QueryFilter("status", "=", Some("paid"))))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(2, 5))
  }

  test("counted EXISTS >= 2 (C605)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("sampleItems",
        count = Some(CountCond(">=", 2)))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 5))
  }

  test("counted EXISTS < 2 includes zero-child parents (C611)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("sampleItems",
        count = Some(CountCond("<", 2)))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(2, 3, 4)) // 1 item, 1 item, 0 items
  }

  test("counted EXISTS = / != / > / <= (C606/C610/C612/C613)") {
    def counted(op: String, v: Long): Seq[Any] =
      ids(q(QueryDefinition("samples", columns = Some(Seq("id")),
        filters = Seq(QueryExistsFilter("sampleItems",
          count = Some(CountCond(op, v)))),
        orderBy = Seq(QueryOrderBy("id")))))
    assert(counted("=", 0) == Seq(4))
    assert(counted("=", 1) == Seq(2, 3))       // C606
    assert(counted(">", 1) == Seq(1, 5))       // C610
    assert(counted("!=", 0) == Seq(1, 2, 3, 5)) // C612
    assert(counted("<=", 1) == Seq(2, 3, 4))   // C613
    // boundary forms: cnt >= 0 is a tautology (all parents, incl. the
    // zero-child one); cnt < 0 can never hold
    assert(counted(">=", 0) == Seq(1, 2, 3, 4, 5))
    assert(counted("<", 0) == Seq())
  }

  test("nested EXISTS resolves inner relation against outer table (C604)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("sampleItems",
        filters = Seq(QueryExistsFilter("sampleDetails")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 2, 5))
  }

  test("self-referencing EXISTS (C608: samples that manage samples)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryExistsFilter("samples")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 2)) // ids 1 and 2 are managers
  }

  test("EXISTS inside OR group composes (C603 + counted variant)") {
    // C603 exact spec case: (status = 'cancelled' OR EXISTS sampleItems)
    val plain = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("or", Seq(
        QueryFilter("status", "=", Some("cancelled")),
        QueryExistsFilter("sampleItems")))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(plain) == Seq(1, 2, 3, 5))
    val r = q(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilterGroup("or", Seq(
        QueryExistsFilter("sampleItems", count = Some(CountCond(">=", 2))),
        QueryFilter("status", "=", Some("active"))))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 4, 5))
  }

  // ---- byIds (C500 ff) --------------------------------------------------

  test("byIds basic + with extra filter (C500/C506)") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id")),
      byIds = Some(Seq(1, 3, 4)), orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r) == Seq(1, 3, 4))
    val r2 = q(QueryDefinition("orders", columns = Some(Seq("id")),
      byIds = Some(Seq(1, 3, 4)),
      filters = Seq(QueryFilter("status", "=", Some("active"))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ids(r2) == Seq(1, 4))
  }

  test("byIds + count mode counts existing ids (C502, C501 nuance)") {
    val r = q(QueryDefinition("orders", byIds = Some(Seq(1, 2, 999)),
      executeMode = "count"))
    assert(r.asInstanceOf[CountResult].count == 2)
  }

  // ---- execute modes ----------------------------------------------------

  test("count mode ignores columns/limit but keeps filters+joins (C022/C024/C025)") {
    val r = q(QueryDefinition("orders",
      columns = Some(Seq("id")),
      joins = Seq(QueryJoin("products", joinType = "inner", columns = Some(Nil))),
      filters = Seq(QueryFilter("status", "!=", Some("cancelled"))),
      limit = Some(1),
      executeMode = "count"))
    val cr = r.asInstanceOf[CountResult]
    assert(cr.count == 3) // orders 1,2,5 join products; 3 cancelled, 4 null product
    assert(cr.meta.columns.isEmpty)
  }

  test("data result shape + meta (C001/C002/C004/C005/C007)") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id", "status"))))
    val dr = r.asInstanceOf[DataResult]
    assert(dr.data.nonEmpty &&
      dr.data.forall(row => row.contains("id") && row.contains("status"))) // C001
    assert(dr.meta.columns.size == 2) // C002: every field populated, unmasked
    dr.meta.columns.foreach { c =>
      assert(c.apiName.nonEmpty && c.columnType.nonEmpty &&
        c.fromTable == "orders" && !c.masked)
    }
    assert(Set("direct", "cache", "materialized", "trino-cross-db")
      .contains(dr.meta.strategy)) // C004
    assert(dr.meta.tablesUsed.nonEmpty) // C005
    dr.meta.tablesUsed.foreach { t =>
      assert(t.tableId.nonEmpty && t.source.nonEmpty &&
        t.database.nonEmpty && t.physicalName.nonEmpty)
    }
    assert(dr.debugLog.isEmpty) // C007: absent unless debug requested
  }

  test("omitting columns returns all allowed columns (C006)") {
    val r = q(QueryDefinition("orders")).asInstanceOf[DataResult]
    // admin sees the full orders column set
    val apiNames = r.meta.columns.map(_.apiName).toSet
    assert(apiNames.size == r.meta.columns.size && apiNames.contains("id"))
    assert(r.data.head.keySet == apiNames)
  }

  test("count mode shapes (C020/C021/C026/C027) and groupBy-blindness (C023)") {
    val c = q(QueryDefinition("orders", executeMode = "count"))
      .asInstanceOf[CountResult]
    assert(c.count >= 5)              // C020
    assert(c.meta.columns.isEmpty)    // C021
    // C023: groupBy/aggregations do not change what count counts
    val g = q(QueryDefinition("orders",
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "totalSum")),
      executeMode = "count")).asInstanceOf[CountResult]
    assert(g.count == c.count)
    // C026: a restricted role can still count rows on an allowed table
    val t = db.query(QueryDefinition("orders", executeMode = "count"),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
    assert(t.asInstanceOf[CountResult].count >= 5)
    // C027: zero matching rows counts 0
    val z = q(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "=", Some("nonexistent"))),
      executeMode = "count"))
    assert(z.asInstanceOf[CountResult].count == 0)
  }

  test("sql-only returns SQL + params, no execution (C010-C016)") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      filters = Seq(QueryFilter("status", "=", Some("active")),
        QueryFilter("total", ">", Some(50.0))),
      executeMode = "sql-only"))
    val sr = r.asInstanceOf[SqlResult]
    assert(sr.sql.contains("SELECT") && sr.sql.contains("FROM"))
    assert(sr.sql.contains("?") && !sr.sql.contains("active")) // never interpolated
    assert(sr.params == Seq("active", 50.0))
    assert(sr.meta.timing.executionMs.isEmpty)
  }

  // ---- access control & masking (C700-C816) -----------------------------

  test("role trims default columns; masking applies (C700/C800)") {
    val r = db.query(QueryDefinition("orders", orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
    val row = data(r).head
    assert(row.keySet == Set("id", "total", "status", "createdAt"))
    assert(row("total") == 0) // number mask
    assert(r.asInstanceOf[DataResult].meta.columns.find(_.apiName == "total").get.masked)
  }

  test("masking fns: email/phone/name/uuid/date/full behaviors (C800-C812)") {
    import graft.access.Masking
    assert(Masking("email", "john@example.com") == "j***@***.com")
    assert(Masking("phone", "+1234567890") == "+1***890")
    assert(Masking("name", "John Smith") == "J********h")
    assert(Masking("uuid", "a1b2c3d4-e5f6") == "a1b2****")
    assert(Masking("number", 12345) == 0)
    assert(Masking("full", "anything") == "***")
    assert(Masking("date", java.sql.Date.valueOf("2025-03-15")) ==
      java.sql.Date.valueOf("2025-01-01"))
  }

  test("null passes through unmasked (C815)") {
    val r = db.query(QueryDefinition("users", columns = Some(Seq("id", "phone")),
      orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(userRoles = Some(Seq("analyst"))))
    val bob = data(r)(1)
    assert(bob("phone") == null)
    val alice = data(r).head
    assert(alice("phone") == "+1***890")
  }

  test("scope union within user roles unmasks (C710-ish)") {
    // tenant-user masks orders.total; orders-service grants orders '*' unmasked
    val r = db.query(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(userRoles = Some(Seq("tenant-user", "orders-service"))))
    assert(data(r).head("total").asInstanceOf[java.math.BigDecimal].doubleValue() == 100.0)
  }

  test("intersection between scopes preserves masking (C720-ish)") {
    val r = db.query(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(
        userRoles = Some(Seq("orders-service")),
        serviceRoles = Some(Seq("reporting-service"))))
    assert(data(r).head("total") == 0) // reporting-service masks total
  }

  test("empty roles array = zero permissions (C691)") {
    val e = intercept[ValidationError] {
      db.query(QueryDefinition("orders"), ExecutionContext(userRoles = Some(Nil)))
    }
    assert(e.errors.exists(_.code == "ACCESS_DENIED"))
  }

  test("aggregation aliases are never masked (C816-ish)") {
    val r = db.query(QueryDefinition("orders", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("total", "sum", "totalSum"))),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
    assert(data(r).head("totalSum").asInstanceOf[java.math.BigDecimal].doubleValue() == 800.0)
  }

  // ---- planner strategies (C1250/C1710 ff) ------------------------------

  test("P1 single-DB direct") {
    val r = q(QueryDefinition("orders", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("users", columns = Some(Nil)))))
    assert(r.meta.strategy == "direct" && r.meta.targetDatabase == "pg-main")
    assert(r.meta.dialect.contains("postgres"))
  }

  test("P0 cache for byIds-only query on cached table") {
    val r = q(QueryDefinition("users", columns = Some(Seq("id", "email")),
      byIds = Some(Seq("uuid-c1", "uuid-c2"))))
    assert(r.meta.strategy == "cache" && r.meta.targetDatabase == "redis-main")
    assert(data(r).map(_("id")) == Seq("uuid-c1", "uuid-c2"))
    assert(data(r).head("email") == "alice@example.com")
  }

  test("P0 cache partial miss merges cache + DB rows") {
    val r = q(QueryDefinition("users", columns = Some(Seq("id")),
      byIds = Some(Seq("uuid-c1", "uuid-zzz"))))
    assert(r.meta.strategy == "cache")
    assert(data(r).map(_("id")) == Seq("uuid-c1")) // zzz exists nowhere
  }

  test("byIds with filters skips cache (P0 conditions)") {
    val r = q(QueryDefinition("users", columns = Some(Seq("id")),
      byIds = Some(Seq("uuid-c1")),
      filters = Seq(QueryFilter("role", "=", Some("admin")))))
    assert(r.meta.strategy == "direct")
  }

  test("P2 materialized replica: events + orders lands in ch-analytics") {
    val r = q(QueryDefinition("events", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("orders", columns = Some(Nil)))))
    assert(r.meta.strategy == "materialized")
    assert(r.meta.targetDatabase == "ch-analytics")
    val orderUse = r.meta.tablesUsed.find(_.tableId == "orders").get
    assert(orderUse.source == "materialized" &&
      orderUse.physicalName == "default.orders_replica")
  }

  test("P2 freshness gate: realtime forbids replicas → falls to P3") {
    val r = q(QueryDefinition("events", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("orders", columns = Some(Nil))),
      freshness = Some("realtime")))
    assert(r.meta.strategy == "trino-cross-db")
  }

  test("P3 trino-cross-db when no replica path exists") {
    val r = q(QueryDefinition("events", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("users", columns = Some(Nil)))))
    assert(r.meta.strategy == "trino-cross-db")
    assert(r.meta.dialect.contains("trino"))
  }

  test("P2 explicit freshness 'seconds' accepts 'seconds' replica lag (C1254)") {
    // single-table orders is P1-eligible, but the declared lag tolerance
    // routes it to the replica (analytical offload, C1711/C1716)
    val r = q(QueryDefinition("orders", columns = Some(Seq("id")),
      freshness = Some("seconds")))
    assert(r.meta.strategy == "materialized")
    assert(r.meta.tablesUsed.head.physicalName == "default.orders_replica")
  }

  test("primary executor down + fresh-enough replica → materialized; realtime → FRESHNESS_UNMET (C1253)") {
    val base = ContractFixture.registry(spark)
    val noPg = base.copy(loaders = base.loaders.filterNot { case ((db, _), _) => db == "pg-main" })
    val db2 = graft.api.MultiDb(spark, ContractFixture.config(), ContractFixture.roles, noPg)
    // no freshness requirement: the orders_replica serves the query
    val ok = db2.query(QueryDefinition("orders", columns = Some(Seq("id")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(ok.meta.strategy == "materialized" &&
      ok.asInstanceOf[DataResult].data.size == 5)
    // realtime rejects the seconds-lag replica and no original is reachable
    val e = intercept[PlannerError] {
      db2.query(QueryDefinition("orders", columns = Some(Seq("id")),
        freshness = Some("realtime")))
    }
    assert(e.code == "FRESHNESS_UNMET")
  }

  test("cross-DB with no sync machinery and no trino → UNREACHABLE_TABLES (C1252)") {
    val cfg = ContractFixture.config(trinoEnabled = false).copy(syncs = Nil)
    val db2 = graft.api.MultiDb(spark, cfg, ContractFixture.roles, ContractFixture.registry(spark))
    val e = intercept[PlannerError] {
      db2.query(QueryDefinition("events", columns = Some(Seq("id")),
        joins = Seq(QueryJoin("users", columns = Some(Nil)))))
    }
    assert(e.code == "UNREACHABLE_TABLES")
  }

  test("P4: TRINO_DISABLED when cross-DB needed and trino off (C1250)") {
    val db2 = ContractFixture.multiDb(spark, trinoEnabled = false)
    val e = intercept[PlannerError] {
      db2.query(QueryDefinition("events", columns = Some(Seq("id")),
        joins = Seq(QueryJoin("users", columns = Some(Nil)))))
    }
    assert(e.code == "TRINO_DISABLED")
  }

  test("P4: FRESHNESS_UNMET when only a stale replica path exists, trino off") {
    val db2 = ContractFixture.multiDb(spark, trinoEnabled = false)
    val e = intercept[PlannerError] {
      db2.query(QueryDefinition("events", columns = Some(Seq("id")),
        joins = Seq(QueryJoin("orders", columns = Some(Nil))),
        freshness = Some("realtime")))
    }
    assert(e.code == "FRESHNESS_UNMET")
  }

  // ---- cross-engine normalization sanity -------------------------------

  test("chSamples mirror gives identical results (dialect parameterization)") {
    val a = q(QueryDefinition("samples", columns = Some(Seq("id", "name")),
      filters = Seq(QueryFilter("amount", ">=", Some(100.0))),
      orderBy = Seq(QueryOrderBy("id"))))
    val b = q(QueryDefinition("chSamples", columns = Some(Seq("id", "name")),
      filters = Seq(QueryFilter("amount", ">=", Some(100.0))),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(data(a).map(r => (r("id"), r("name"))) == data(b).map(r => (r("id"), r("name"))))
  }

  test("boolean surfaces as true/false (C1704-ish)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("id", "isActive")),
      filters = Seq(QueryFilter("isActive", "=", Some(false)))))
    assert(ids(r) == Seq(3))
    assert(data(r).head("isActive") == false)
  }

  test("columns omitted + aggregations -> defaults to groupBy columns only (rule 2 nuance)") {
    val r = q(QueryDefinition("samples",
      groupBy = Seq(QueryGroupBy("category")),
      aggregations = Seq(QueryAggregation("*", "count", "n")),
      orderBy = Seq(QueryOrderBy("category"))))
    assert(data(r).head.keySet == Set("category", "n"))
  }

  test("sql-only meta still reports masking intent (C015)") {
    val r = db.query(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      executeMode = "sql-only"),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
    val cols = r.meta.columns
    assert(cols.find(_.apiName == "total").exists(_.masked))
    assert(cols.find(_.apiName == "id").exists(!_.masked))
  }

  test("distinct alongside groupBy is legal and a no-op (C621)") {
    val r = q(QueryDefinition("samples", columns = Some(Seq("category")),
      distinct = true,
      groupBy = Seq(QueryGroupBy("category")),
      aggregations = Seq(QueryAggregation("*", "count", "n")),
      orderBy = Seq(QueryOrderBy("category"))))
    assert(data(r).size == 3)
  }
}
