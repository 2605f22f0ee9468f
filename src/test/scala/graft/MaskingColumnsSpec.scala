package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.access.{Masking, MaskingColumns}
import graft.types._

/** The in-plan Column masking must be byte-equivalent to the row-level
  * masking functions, and `MultiDb.frame()` must return already-masked data
  * (the scale path: masked exports without a driver collect).
  */
class MaskingColumnsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("column masks equal row masks on representative values") {
    val strings = Seq(
      "john@example.com", "x@y.io", "no-at-sign", "a@b", "user.name@sub.domain.org",
      "+1234567890", "+49123", "1234", "12345",
      "John Smith", "Jo", "A", "Séb Öst",
      "a1b2c3d4-e5f6", "ab", "")
    for (fn <- Seq("email", "phone", "name", "uuid", "full")) {
      val df = strings.toDF("v")
      val got = df.select(MaskingColumns.mask(fn, col("v")).cast("string")).as[String].collect()
      val want = strings.map(s => String.valueOf(Masking(fn, s)))
      assert(got.toSeq == want, s"fn=$fn")
    }
    // number + date
    val n = Seq(12345).toDF("v")
      .select(MaskingColumns.mask("number", col("v"))).first().get(0)
    assert(n == 0 && Masking("number", 12345) == 0)
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2025-03-15T10:30:00Z"))
    val got = Seq(ts).toDF("v")
      .select(MaskingColumns.mask("date", col("v"))).first().getTimestamp(0)
    assert(got == Masking("date", ts))
  }

  test("null passes through unmasked in-plan (C815)") {
    val df = Seq[(Integer, String)]((1, null)).toDF("id", "v")
    for (fn <- Seq("email", "phone", "name", "uuid", "number", "full"))
      assert(df.select(MaskingColumns.mask(fn, col("v"))).first().isNullAt(0), fn)
  }

  test("frame() returns masked data without driver-side collect") {
    val db = ContractFixture.multiDb(spark)
    val f = db.frame(QueryDefinition("orders", columns = Some(Seq("id", "total", "createdAt")),
      orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
    val rows = f.collect()
    assert(rows.map(_.get(1)).forall(_ == 0)) // total number-masked in-plan
    // createdAt is date-masked for tenant-user? (mask list: [total] only) → raw
    assert(rows.head.getTimestamp(2) != null)
    // and the query() path still returns identical values (idempotent compose)
    val viaQuery = db.query(QueryDefinition("orders", columns = Some(Seq("id", "total")),
      orderBy = Seq(QueryOrderBy("id"))),
      ExecutionContext(userRoles = Some(Seq("tenant-user"))))
      .asInstanceOf[DataResult].data
    assert(viaQuery.forall(_("total") == 0))
  }
}
