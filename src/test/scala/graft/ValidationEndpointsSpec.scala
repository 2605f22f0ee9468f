package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{MultiDbClient, MultiDbHttpServer}
import graft.planner.SourceRegistry
import graft.types._

/** Port of the reference's validation-endpoint section (CONTRACT_TESTS.md
  * §17, C1600–C1632): `/validate/query` runs all rules with zero I/O (the
  * server here is built with an EMPTY source registry to prove it), and
  * `/validate/config` covers the full config-issue matrix.
  */
class ValidationEndpointsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  // C1608's strongest form: no executors configured AT ALL — validation
  // endpoints must still work
  private lazy val server = new MultiDbHttpServer(
    graft.api.MultiDb(spark, ContractFixture.config(), ContractFixture.roles,
      SourceRegistry(loaders = Map.empty)))
  private lazy val port: Int = server.start()
  private val http = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def vq(definition: String, ctx: String = """{"roles":{"user":["admin"]}}"""): HttpResponse[String] =
    post("/validate/query", s"""{"definition":$definition,"context":$ctx}""")

  private def queryCodes(r: HttpResponse[String]): Seq[String] = {
    assert(r.statusCode() == 400, s"expected 400, got ${r.statusCode()}: ${r.body()}")
    MultiDbClient.reconstructError(r.body())
      .asInstanceOf[ValidationError].errors.map(_.code)
  }

  // ---- 17.1 query validation -----------------------------------------
  test("C1600/C1608: valid query passes with ZERO executors configured") {
    val r = vq("""{"from":"orders","columns":["id"]}""")
    assert(r.statusCode() == 200 && r.body().contains("\"valid\":true"))
  }

  test("C1601-C1605: each error family surfaces with its code") {
    assert(queryCodes(vq("""{"from":"nonExistentTable"}""")).contains("UNKNOWN_TABLE")) // C1601
    assert(queryCodes(vq("""{"from":"orders","columns":["ghost"]}""")).contains("UNKNOWN_COLUMN")) // C1602
    assert(queryCodes(vq("""{"from":"orders","columns":["total"]}""",
      """{"roles":{"user":["viewer"]}}""")).contains("ACCESS_DENIED")) // C1603
    assert(queryCodes(vq(
      """{"from":"orders","filters":[{"column":"customerId","operator":">","value":"x"}]}"""))
      .contains("INVALID_FILTER")) // C1604
    assert(queryCodes(vq(
      """{"from":"orders","filters":[{"column":"total","operator":"between","value":{"from":0}}]}"""))
      .contains("INVALID_VALUE")) // C1605
  }

  test("C1606/C1607: multiple errors collected; unknown role rejected") {
    val codes = queryCodes(vq("""{"from":"orders","columns":["g1","g2"],"limit":-1}"""))
    assert(codes.size >= 3) // C1606
    assert(queryCodes(vq("""{"from":"orders"}""",
      """{"roles":{"user":["nonexistent"]}}""")).contains("UNKNOWN_ROLE")) // C1607
  }

  test("C1609: /validate/query error format identical to /query") {
    val bad = """{"from":"orders","columns":["ghost"]}"""
    val a = vq(bad)
    val b = post("/query", s"""{"definition":$bad,"context":{"roles":{"user":["admin"]}}}""")
    assert(a.statusCode() == 400 && b.statusCode() == 400)
    val (ea, eb) = (MultiDbClient.reconstructError(a.body()).asInstanceOf[ValidationError],
      MultiDbClient.reconstructError(b.body()).asInstanceOf[ValidationError])
    assert(ea.fromTable == eb.fromTable)
    assert(ea.errors.map(_.code) == eb.errors.map(_.code))
  }

  // ---- 17.2 config validation ----------------------------------------
  private def vc(metadata: String, roles: String = "[]"): HttpResponse[String] =
    post("/validate/config", s"""{"metadata":$metadata,"roles":$roles}""")

  private def configCodes(r: HttpResponse[String]): Seq[String] = {
    assert(r.statusCode() == 400, s"expected 400, got ${r.statusCode()}: ${r.body()}")
    MultiDbClient.reconstructError(r.body())
      .asInstanceOf[ConfigError].errors.map(_.code)
  }

  private def tableJson(api: String, cols: String =
      """[{"apiName":"id","physicalName":"id","columnType":"int"}]""",
      db: String = "db1", extra: String = "") =
    s"""{"id":"$api","apiName":"$api","database":"$db","physicalName":"t","columns":$cols$extra}"""

  private def cfg(tables: String, dbs: String = """[{"id":"db1","engine":"postgres"}]""",
      extra: String = "") =
    s"""{"databases":$dbs,"tables":[$tables]$extra}"""

  test("C1620: valid config passes") {
    val r = vc(cfg(tableJson("things")))
    assert(r.statusCode() == 200 && r.body().contains("\"valid\":true"))
  }

  test("C1621/C1628-C1630: apiName grammar and duplicates") {
    assert(configCodes(vc(cfg(tableJson("Order_Items")))).contains("INVALID_API_NAME")) // C1621
    assert(configCodes(vc(cfg(tableJson("Orders")))).contains("INVALID_API_NAME"))      // C1629
    assert(configCodes(vc(cfg(tableJson("orderItems2") + "," +
      tableJson("orderItems2")))).contains("DUPLICATE_API_NAME"))                       // C1622
    assert(configCodes(vc(cfg(tableJson("ok",
      cols = """[{"apiName":"id","physicalName":"a","columnType":"int"},
                 {"apiName":"id","physicalName":"b","columnType":"int"}]"""))))
      .contains("DUPLICATE_API_NAME"))                                                  // C1628
    assert(configCodes(vc(cfg(tableJson("order_items")))).contains("INVALID_API_NAME")) // C1630
  }

  test("C1623: unknown database reference") {
    assert(configCodes(vc(cfg(tableJson("things", db = "ghostDb"))))
      .contains("INVALID_REFERENCE"))
  }

  test("C1624/C1631/C1632: invalid relations (table, source col, target col)") {
    def rel(r: String) = tableJson("a", extra = s""","relations":[$r]""")
    assert(configCodes(vc(cfg(rel("""{"column":"id","refTable":"ghost","refColumn":"id"}"""))))
      .contains("INVALID_RELATION")) // C1624
    assert(configCodes(vc(cfg(rel("""{"column":"ghostCol","refTable":"a","refColumn":"id"}"""))))
      .contains("INVALID_RELATION")) // C1631
    assert(configCodes(vc(cfg(rel("""{"column":"id","refTable":"a","refColumn":"ghostCol"}"""))))
      .contains("INVALID_RELATION")) // C1632
  }

  test("C1625/C1626: sync and cache reference validation") {
    assert(configCodes(vc(cfg(tableJson("a"),
      extra = ""","syncs":[{"sourceTable":"ghost","targetDatabase":"db1","targetPhysicalName":"x"}]""")))
      .contains("INVALID_SYNC")) // C1625
    assert(configCodes(vc(cfg(tableJson("a"),
      extra = ""","caches":[{"id":"c1","tables":[{"tableId":"ghost","keyPattern":"k:{id}"}]}]""")))
      .contains("INVALID_CACHE")) // C1626
  }

  test("C1627: multiple config errors collected") {
    val codes = configCodes(vc(cfg(tableJson("Bad_Name", db = "ghostDb"))))
    assert(codes.size >= 2 && codes.contains("INVALID_API_NAME") &&
      codes.contains("INVALID_REFERENCE"))
  }

  test("structurally malformed config (missing required fields) → 400, not 500") {
    val r = post("/validate/config", """{"metadata":{"tables":[{}]},"roles":[]}""")
    assert(r.statusCode() == 400, s"got ${r.statusCode()}: ${r.body()}")
    assert(r.body().contains("BAD_REQUEST"))
  }
}
