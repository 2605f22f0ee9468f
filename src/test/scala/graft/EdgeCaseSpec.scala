package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.types._

/** Port of the reference's edge-case section (CONTRACT_TESTS.md §18,
  * C1700–C1709): result-shape guarantees at the boundaries — empty
  * results, single rows, large in-lists, nulls, typed booleans/temporals,
  * arrays, decimal precision, implicit AND.
  */
class EdgeCaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private lazy val db = ContractFixture.multiDb(spark)
  private val admin = ExecutionContext(userRoles = Some(Seq("admin")))

  private def data(q: QueryDefinition): Seq[Map[String, Any]] =
    db.query(q, admin).asInstanceOf[DataResult].data

  test("C1700: empty result keeps kind=data and full meta.columns") {
    val res = db.query(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "=", Some("nonexistent_status_xyz")))), admin)
      .asInstanceOf[DataResult]
    assert(res.data.isEmpty)
    assert(res.meta.columns.nonEmpty)
  }

  test("C1701: byIds single row") {
    assert(data(QueryDefinition("orders", byIds = Some(Seq(1)))).size == 1)
  }

  test("C1702: large in-list (60 values) executes") {
    val vals = (1 to 60).map(i => s"status_$i") :+ "active"
    val rows = data(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "in", Some(vals)))))
    assert(rows.nonEmpty) // the one real value matches
  }

  test("C1703: nullable column surfaces nulls in data") {
    val rows = data(QueryDefinition("orders", columns = Some(Seq("id", "discount"))))
    assert(rows.exists(_("discount") == null))
    assert(rows.exists(_("discount") != null))
  }

  test("C1704: boolean column is a real boolean (or null), never 0/1") {
    val rows = data(QueryDefinition("orders", columns = Some(Seq("id", "isPaid"))))
    assert(rows.forall(r => r("isPaid") == null || r("isPaid").isInstanceOf[Boolean]))
    assert(rows.exists(r => r("isPaid") == java.lang.Boolean.TRUE))
  }

  test("C1705/C1706: timestamp and date serialize as ISO strings on the wire") {
    val ts = db.query(QueryDefinition("orders", columns = Some(Seq("createdAt")),
      limit = Some(1)), admin).asInstanceOf[DataResult]
    val json = graft.api.Json.writeResult(ts)
    assert("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}""".r.findFirstIn(json).isDefined)
    val d = db.query(QueryDefinition("invoices", columns = Some(Seq("dueDate")),
      filters = Seq(QueryFilter("dueDate", "isNotNull")), limit = Some(1)), admin)
      .asInstanceOf[DataResult]
    val dj = graft.api.Json.writeResult(d)
    assert(""""\d{4}-\d{2}-\d{2}"""".r.findFirstIn(dj).isDefined)
  }

  test("C1707: array column round-trips as a list (or null)") {
    val rows = data(QueryDefinition("products", columns = Some(Seq("name", "labels"))))
    assert(rows.exists(r => r("labels") != null &&
      r("labels").isInstanceOf[Seq[_]]))
  }

  test("wire fidelity: numeric array elements match in-process types after parseResult") {
    // A decimal[] column must keep BigDecimal elements over the wire (same
    // as in-process); any other float-bearing column — scalar OR array —
    // must come back as Double, not the exactMapper's BigDecimal.
    val meta = QueryResultMeta("single_database", "db", None, Nil,
      Seq(ResultColumnMeta("exact", "decimal[]", false, "t", false),
        ResultColumnMeta("embedding", "decimalish", false, "t", false),
        ResultColumnMeta("score", "decimalish", false, "t", false)),
      Timing(0, 0, Some(0)))
    val out = DataResult(Seq(Map(
      "exact" -> Seq(new java.math.BigDecimal("1.100000000000000000001")),
      "embedding" -> Seq(0.25d, 0.5d),
      "score" -> 0.75d)), meta)
    val back = graft.api.Json.parseResult(graft.api.Json.writeResult(out))
      .asInstanceOf[DataResult].data.head
    assert(back("exact").asInstanceOf[Seq[_]].head ==
      new java.math.BigDecimal("1.100000000000000000001"))
    assert(back("embedding") == Seq(0.25d, 0.5d))
    assert(back("score") == 0.75d)
  }

  test("wire fidelity: explicit debugLog:null parses as absent, not empty log") {
    // another impl may serialize an absent log as an explicit JSON null;
    // NullNode is non-null with size()==0, so an isArray guard is required
    // for it to come back None instead of Some(Seq())
    val meta = QueryResultMeta("single_database", "db", None, Nil,
      Seq(ResultColumnMeta("id", "integer", false, "t", false)),
      Timing(0, 0, Some(0)))
    val out = DataResult(Seq(Map("id" -> 1L)), meta)
    val tree = graft.api.Json.mapper.readTree(graft.api.Json.writeResult(out))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    tree.putNull("debugLog")
    assert(graft.api.Json.parseResult(tree.toString)
      .asInstanceOf[DataResult].debugLog.isEmpty)
    tree.put("debugLog", "not-an-array")
    assert(graft.api.Json.parseResult(tree.toString)
      .asInstanceOf[DataResult].debugLog.isEmpty)
  }

  test("C1708: decimal precision preserved") {
    val rows = data(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      byIds = Some(Seq(1))))
    val v = rows.head("total")
    assert(v.isInstanceOf[java.math.BigDecimal] || v.isInstanceOf[BigDecimal],
      s"total is ${v.getClass}")
  }

  test("C1713: DISTINCT + count mode counts distinct values") {
    val res = db.query(QueryDefinition("orders", columns = Some(Seq("status")),
      distinct = true, executeMode = "count"), admin)
    assert(res.asInstanceOf[CountResult].count == 4) // active/paid/cancelled/shipped
  }

  test("C1714: GROUP BY over zero matching rows returns empty data with meta") {
    val res = db.query(QueryDefinition("orders", columns = Some(Seq("status")),
      filters = Seq(QueryFilter("status", "=", Some("nonexistent"))),
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "t")),
      ), admin).asInstanceOf[DataResult]
    assert(res.data.isEmpty && res.meta.columns.nonEmpty)
  }

  test("C1709: multiple top-level filters combine with implicit AND") {
    // active orders: id 1 (total 100) and id 4 (total 300) — the second
    // filter must intersect, not OR
    val both = data(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "=", Some("active")),
        QueryFilter("total", ">", Some(150.0)))))
    val first = data(QueryDefinition("orders",
      filters = Seq(QueryFilter("status", "=", Some("active")))))
    assert(first.size == 2 && both.size == 1)
    assert(both.head("id") == 4)
  }
}
