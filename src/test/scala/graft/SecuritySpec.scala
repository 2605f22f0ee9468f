package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.types._

/** Injection hardening (reference: SECURITY.md three layers; C1400-C1493):
  * enum-like string fields (operator, logic, direction, fn, joinType,
  * executeMode) are runtime-whitelisted even though the DSL is typed —
  * raw JSON deserialization bypasses static types; values are never
  * interpolated into SQL text; pattern-op values are treated literally.
  */
class SecuritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  lazy val db: graft.api.MultiDb = ContractFixture.multiDb(spark)

  private def codes(q: QueryDefinition): Seq[String] =
    intercept[ValidationError](db.query(q)).errors.map(_.code)

  test("injected operator strings are rejected, not passed through") {
    for (op <- Seq("= 1 OR 1=1", "'; DROP TABLE orders; --", ">= ANY(SELECT 1)", ""))
      assert(codes(QueryDefinition("orders",
        filters = Seq(QueryFilter("status", op, Some("x"))))).contains("INVALID_FILTER"))
  }

  test("injected group logic / order direction / agg fn / join type rejected") {
    val badGroup = QueryDefinition("orders", filters = Seq(
      QueryFilterGroup("or) OR (1=1", Seq(QueryFilter("status", "=", Some("x"))))))
    assert(codes(badGroup).contains("INVALID_FILTER"))
    val badDir = QueryDefinition("orders",
      orderBy = Seq(QueryOrderBy("id", "desc; DROP TABLE x")))
    assert(codes(badDir).contains("INVALID_ORDER_BY"))
    val badFn = QueryDefinition("orders", columns = Some(Nil),
      aggregations = Seq(QueryAggregation("total", "sum(1); --", "s")))
    assert(codes(badFn).contains("INVALID_AGGREGATION"))
    val badJoin = QueryDefinition("orders",
      joins = Seq(QueryJoin("users", joinType = "cross")))
    assert(codes(badJoin).contains("INVALID_JOIN"))
    val badMode = QueryDefinition("orders", executeMode = "drop")
    assert(codes(badMode).contains("INVALID_VALUE"))
  }

  test("sql-only never interpolates values; params align with placeholders") {
    val r = db.query(QueryDefinition("orders",
      columns = Some(Seq("id")),
      filters = Seq(
        QueryFilter("status", "=", Some("'; DROP TABLE orders; --")),
        QueryFilter("total", "between", Some((1.0, 2.0))),
        QueryFilter("internalNote", "contains", Some("50%_discount"))),
      executeMode = "sql-only")).asInstanceOf[SqlResult]
    assert(!r.sql.contains("DROP TABLE"))
    assert(!r.sql.contains("50%_discount"))
    assert(r.sql.count(_ == '?') == 4) // =, between from, between to, contains
    assert(r.params == Seq("'; DROP TABLE orders; --", 1.0, 2.0, "50%_discount"))
  }

  test("hostile LIKE metacharacters in contains/startsWith match literally") {
    val r = db.query(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("email", "contains", Some("%' OR '1'='1")))))
    assert(r.asInstanceOf[DataResult].data.isEmpty) // no row contains it literally
    val r2 = db.query(QueryDefinition("samples", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("name", "startsWith", Some("_")))))
    assert(r2.asInstanceOf[DataResult].data.isEmpty) // '_' is literal, not wildcard
  }

  test("identifiers resolve only through metadata (no raw column injection)") {
    assert(codes(QueryDefinition("orders",
      columns = Some(Seq("id\"; DROP TABLE orders; --"))))
      .contains("UNKNOWN_COLUMN"))
    assert(codes(QueryDefinition("orders; DROP TABLE users"))
      .contains("UNKNOWN_TABLE"))
  }
}
