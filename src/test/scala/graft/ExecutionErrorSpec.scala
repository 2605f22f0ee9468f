package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.api.MultiDb
import graft.types._

/** The execution/planner error paths the reference pins in §14b/§14c
  * (C1251 NO_CATALOG, C1261 CACHE_PROVIDER_MISSING, C1262 QUERY_FAILED)
  * that previously had no tests — each must surface as its TYPED code,
  * never a silent fallback or an untyped exception.
  */
class ExecutionErrorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val admin = ExecutionContext(userRoles = Some(Seq("admin")))

  test("C1261: qualifying cache with no registered provider → CACHE_PROVIDER_MISSING") {
    val reg = ContractFixture.registry(spark)
    val noCacheReg = reg.copy(cacheProviders = Map.empty)
    val db = MultiDb(spark, ContractFixture.config(), ContractFixture.roles, noCacheReg)
    val e = intercept[ExecutionError] {
      // users is the cached table in the fixture (redis-main)
      db.query(QueryDefinition("users", byIds = Some(Seq("uuid-c1"))), admin)
    }
    assert(e.code == "CACHE_PROVIDER_MISSING")
    // a NON-qualifying byIds query (extra filter breaks P0) still works
    // without the provider — the error is only for the cache fast path
    val ok = db.query(QueryDefinition("users", byIds = Some(Seq("uuid-c1")),
      filters = Seq(QueryFilter("age", "isNotNull"))), admin)
    assert(ok.isInstanceOf[DataResult])
  }

  test("C1262: runtime execution failure wraps as QUERY_FAILED with cause") {
    val reg = ContractFixture.registry(spark)
    val broken = reg.copy(loaders = reg.loaders.map {
      case (("pg-main", "orders"), _) =>
        (("pg-main", "orders"),
          () => spark.read.parquet("/nonexistent/path/orders.parquet"))
      case other => other
    })
    val db = MultiDb(spark, ContractFixture.config(), ContractFixture.roles, broken)
    val e = intercept[ExecutionError] {
      db.query(QueryDefinition("orders", limit = Some(1)), admin)
    }
    assert(e.code == "QUERY_FAILED", s"got ${e.code}")
    assert(e.getCause != null)
  }

  test("C1251: cross-DB with a database missing its trinoCatalog → NO_CATALOG") {
    val cfg = ContractFixture.config(trinoEnabled = true)
    val noCat = cfg.copy(databases = cfg.databases.map(d =>
      if (d.id == "ch-analytics") d.copy(trinoCatalog = None) else d))
    val db = MultiDb(spark, noCat, ContractFixture.roles, ContractFixture.registry(spark))
    val e = intercept[PlannerError] {
      db.query(QueryDefinition("events", columns = Some(Seq("id")),
        joins = Seq(QueryJoin("users", columns = Some(Nil)))), admin)
    }
    assert(e.code == "NO_CATALOG")
  }
}
