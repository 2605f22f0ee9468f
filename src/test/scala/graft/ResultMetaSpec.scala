package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.types._

/** Port of the reference's result-meta verification section
  * (CONTRACT_TESTS.md §13, C1100–C1113): detailed assertions on
  * `QueryResultMeta` — column types/nullability/provenance, tablesUsed,
  * dialect presence per mode, and aggregation type/nullable inference.
  */
class ResultMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private lazy val db = ContractFixture.multiDb(spark)
  private val admin = ExecutionContext(userRoles = Some(Seq("admin")))

  private def meta(q: QueryDefinition): QueryResultMeta = db.query(q, admin).meta
  private def col(m: QueryResultMeta, api: String): ResultColumnMeta =
    m.columns.find(_.apiName == api).getOrElse(fail(s"no column '$api' in ${m.columns}"))

  test("C1100: meta.columns type correctness") {
    val m = meta(QueryDefinition("orders", columns = Some(Seq("id", "total", "status"))))
    assert(col(m, "id").columnType == "int")
    assert(col(m, "total").columnType == "decimal")
    assert(col(m, "status").columnType == "string")
  }

  test("C1101: meta.columns nullable correctness") {
    val m = meta(QueryDefinition("orders", columns = Some(Seq("id", "productId"))))
    assert(!col(m, "id").nullable)
    assert(col(m, "productId").nullable)
  }

  test("C1102: meta.columns fromTable across a join") {
    val m = meta(QueryDefinition("orders", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("products", columns = Some(Seq("name"))))))
    assert(col(m, "id").fromTable == "orders")
    assert(col(m, "name").fromTable == "products")
  }

  test("C1103: aggregation column meta (type, fromTable, masked=false)") {
    val m = meta(QueryDefinition("orders", columns = Some(Nil),
      aggregations = Seq(
        QueryAggregation("total", "sum", "totalSum"),
        QueryAggregation("*", "count", "cnt"))))
    val ts = col(m, "totalSum")
    assert(ts.columnType == "decimal" && ts.fromTable == "orders" && !ts.masked)
    assert(col(m, "cnt").columnType == "int")
  }

  test("C1104: AVG always returns decimal, even over int source") {
    val m = meta(QueryDefinition("orders", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("quantity", "avg", "avgQty"))))
    assert(col(m, "avgQty").columnType == "decimal")
  }

  test("C1105/C1106: tablesUsed for single table and join") {
    val single = meta(QueryDefinition("orders", limit = Some(1)))
    assert(single.tablesUsed.map(t => (t.tableId, t.source, t.database)) ==
      Seq(("orders", "original", "pg-main")))
    val joined = meta(QueryDefinition("orders", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("products", columns = Some(Nil))), limit = Some(1)))
    assert(joined.tablesUsed.map(_.tableId).toSet == Set("orders", "products"))
  }

  test("C1107: count mode has empty meta.columns") {
    val m = meta(QueryDefinition("orders", executeMode = "count"))
    assert(m.columns.isEmpty)
  }

  test("C1108/C1109: dialect + targetDatabase for a direct query") {
    val m = meta(QueryDefinition("orders", limit = Some(1)))
    assert(Set("postgres", "clickhouse", "trino").contains(m.dialect.get))
    assert(m.targetDatabase == "pg-main")
  }

  test("C1110: cross-DB query reports the Trino executor") {
    val m = meta(QueryDefinition("events", columns = Some(Seq("id")),
      joins = Seq(QueryJoin("users", columns = Some(Nil))), limit = Some(1)))
    assert(m.targetDatabase == "trino" && m.dialect.contains("trino"))
  }

  test("C1111/C1112: dialect present in sql-only and count modes") {
    assert(meta(QueryDefinition("orders", executeMode = "sql-only")).dialect.isDefined)
    assert(meta(QueryDefinition("orders", executeMode = "count")).dialect.isDefined)
  }

  test("C1113: nullable source column produces nullable aggregation") {
    val m = meta(QueryDefinition("orders", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("discount", "sum", "discountSum"))))
    assert(col(m, "discountSum").nullable)
    // and a non-nullable source stays non-nullable under sum
    val m2 = meta(QueryDefinition("orders", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("total", "sum", "totalSum"))))
    assert(!col(m2, "totalSum").nullable)
  }

  test("C1313: close() makes further queries fail with typed EXECUTOR_MISSING") {
    val db2 = ContractFixture.multiDb(spark)
    db2.query(QueryDefinition("orders", limit = Some(1)), admin) // works
    db2.close()
    val e = intercept[ExecutionError] {
      db2.query(QueryDefinition("orders", limit = Some(1)), admin)
    }
    assert(e.code == "EXECUTOR_MISSING")
  }
}
