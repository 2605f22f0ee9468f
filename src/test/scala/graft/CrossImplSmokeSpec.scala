package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{MultiDbHttpClient, MultiDbHttpServer}
import graft.types._

/** Cross-impl e2e smoke (reference TESTS.md:405-420, scenarios #219-238):
  * the same QueryDefinition executed through TWO independent surfaces must
  * agree on result kind, row content, meta.columns structure, and error
  * codes. The reference runs its two language implementations side by
  * side; here the two surfaces are the in-process MultiDb call path and
  * the full wire path (serialize → HTTP server → typed client →
  * deserialize), so any read/write asymmetry in the JSON layer — value
  * typing, masking flags, debug entries, error reconstruction — fails the
  * comparison.
  */
class CrossImplSmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private lazy val db = ContractFixture.multiDb(spark)
  private lazy val client =
    new MultiDbHttpClient(s"http://127.0.0.1:${new MultiDbHttpServer(db).start()}")

  /** One canonical string per value, normalizing the representation gap
    * the wire legitimately introduces: timestamps ride as ISO-8601 Z
    * strings, decimals lose trailing zeros in JSON.
    */
  private def canon(v: Any): String = v match {
    case null => "∅"
    case t: java.sql.Timestamp => t.toInstant.toString
    case t: java.time.Instant => t.toString
    case d: java.sql.Date => d.toString
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
    case bd: BigDecimal => bd.bigDecimal.stripTrailingZeros.toPlainString
    case d: Double => BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case x => String.valueOf(x)
  }

  private def dataRows(r: QueryResult): Seq[String] = r match {
    case DataResult(data, _, _) => data.map(row =>
      row.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=${canon(v)}" }.mkString("|")).sorted
    case other => fail(s"expected kind=data, got $other")
  }

  /** Runs the definition through both surfaces and asserts full agreement:
    * kind, meta.columns (apiName/type/nullable/fromTable/masked), strategy,
    * and (for data results) every row value. Returns both for extra checks.
    */
  private def agree(defn: QueryDefinition,
      ctx: ExecutionContext = ExecutionContext()): (QueryResult, QueryResult) = {
    val direct = db.query(defn, ctx)
    val wire = client.query(defn, ctx)
    assert(direct.getClass == wire.getClass,
      s"kind mismatch: ${direct.getClass} vs ${wire.getClass}")
    assert(direct.meta.columns == wire.meta.columns,
      s"meta.columns mismatch:\n ${direct.meta.columns}\n ${wire.meta.columns}")
    assert(direct.meta.strategy == wire.meta.strategy)
    assert(direct.meta.targetDatabase == wire.meta.targetDatabase)
    (direct, wire) match {
      case (d: DataResult, w: DataResult) =>
        assert(dataRows(d) == dataRows(w),
          s"row mismatch:\n ${dataRows(d)}\n ${dataRows(w)}")
      case (d: CountResult, w: CountResult) => assert(d.count == w.count)
      case (d: SqlResult, w: SqlResult) =>
        assert(d.params.map(canon) == w.params.map(canon))
      case _ => ()
    }
    (direct, wire)
  }

  private def validationCodes(t: ValidationError): Seq[String] =
    t.errors.map(_.code).sorted

  test("#219 simple select agrees across surfaces") {
    val (d, _) = agree(QueryDefinition("orders", columns = Some(Seq("id", "status")),
      orderBy = Seq(QueryOrderBy("id"))))
    assert(d.meta.columns.map(_.apiName) == Seq("id", "status"))
    assert(d.asInstanceOf[DataResult].data.nonEmpty)
  }

  test("#220 filter + join agrees across surfaces") {
    val (d, _) = agree(QueryDefinition("orders",
      columns = Some(Seq("id", "status")),
      joins = Seq(QueryJoin("products", joinType = "inner", columns = Some(Seq("name")))),
      filters = Seq(QueryFilter("status", "=", Some("active"))),
      orderBy = Seq(QueryOrderBy("id"))))
    val rows = d.asInstanceOf[DataResult].data
    assert(rows.nonEmpty && rows.forall(_("status") == "active"))
    assert(d.meta.columns.exists(c => c.apiName == "name" && c.fromTable == "products"))
  }

  test("#221 aggregation agrees across surfaces") {
    val (d, _) = agree(QueryDefinition("orders",
      groupBy = Seq(QueryGroupBy("status")),
      aggregations = Seq(QueryAggregation("total", "sum", "sumTotal")),
      orderBy = Seq(QueryOrderBy("status"))))
    assert(d.asInstanceOf[DataResult].data.nonEmpty)
  }

  test("#222 unknown table raises the same ValidationError code on both surfaces") {
    val defn = QueryDefinition("nonexistent")
    val d = intercept[ValidationError](db.query(defn))
    val w = intercept[ValidationError](client.query(defn))
    assert(validationCodes(d) == validationCodes(w))
    assert(validationCodes(d).contains("UNKNOWN_TABLE"))
  }

  test("#223 restricted column raises ACCESS_DENIED on both surfaces") {
    // tenant-user's orders grant covers id/total/status/createdAt — not quantity
    val defn = QueryDefinition("orders", columns = Some(Seq("id", "quantity")))
    val ctx = ExecutionContext(userRoles = Some(Seq("tenant-user")))
    val d = intercept[ValidationError](db.query(defn, ctx))
    val w = intercept[ValidationError](client.query(defn, ctx))
    assert(validationCodes(d) == validationCodes(w))
    assert(validationCodes(d).contains("ACCESS_DENIED"))
  }

  test("#224 count mode agrees across surfaces") {
    val (d, _) = agree(QueryDefinition("orders", executeMode = "count"))
    assert(d.asInstanceOf[CountResult].count > 0)
  }

  test("#225 sql-only mode agrees: kind=sql, identical params") {
    val (d, w) = agree(QueryDefinition("orders", columns = Some(Seq("id")),
      filters = Seq(QueryFilter("total", ">", Some(50))),
      executeMode = "sql-only"))
    // the reference tolerates formatting drift between impls but demands
    // matching params; one engine serves both surfaces here, so the SQL
    // text itself must also ride the wire unchanged
    assert(d.asInstanceOf[SqlResult].sql == w.asInstanceOf[SqlResult].sql)
    assert(d.asInstanceOf[SqlResult].params.nonEmpty)
  }

  test("#236 debug mode: both surfaces carry debugLog entries") {
    val defn = QueryDefinition("orders", columns = Some(Seq("id")), debug = true)
    val d = db.query(defn)
    val w = client.query(defn)
    for (r <- Seq(d, w)) {
      val log = r.debugLog.getOrElse(fail(s"no debugLog on $r"))
      assert(log.nonEmpty)
      log.foreach { e =>
        assert(e.timestamp > 0 && e.phase.nonEmpty && e.message.nonEmpty)
      }
    }
    // same pipeline ran once per surface: the phase sequences must match
    assert(d.debugLog.get.map(_.phase) == w.debugLog.get.map(_.phase))
  }

  test("#237 masking flags in meta agree: total masked, id not (tenant-user)") {
    val (d, _) = agree(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
    val byName = d.meta.columns.map(c => c.apiName -> c.masked).toMap
    assert(byName("total") && !byName("id"))
  }

  test("#238 byIds agrees across surfaces") {
    val (d, _) = agree(QueryDefinition("orders", columns = Some(Seq("id", "status")),
      byIds = Some(Seq(1, 2))))
    assert(d.asInstanceOf[DataResult].data.map(_("id").toString).sorted == Seq("1", "2"))
  }
}
