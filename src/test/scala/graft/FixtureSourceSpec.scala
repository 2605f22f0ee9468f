package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 in-memory fixture source: schema/nullability contract,
  * range partitioning, determinism, and the mixed-format plan shape
  * (DSv2 BatchScan joined with a parquet scan in one physical plan).
  */
class FixtureSourceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val items =
    spark.read.format("graft.sources.FixtureItemsSource").load()

  test("schema, row count, and 4-slice partitioning") {
    assert(items.schema.map(f => (f.name, f.nullable)) ==
      Seq(("id", false), ("name", false), ("tag", true), ("tags", true),
        ("parentId", true)))
    assert(items.count() == 200)
    assert(items.rdd.getNumPartitions == 4)
  }

  test("deterministic null/empty pattern mirrors the oracle CTE") {
    val rows = items.orderBy("id").collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) == s"item_$i")
      assert(r.isNullAt(2) == (i % 5 == 0))
      if (!r.isNullAt(2)) assert(r.getString(2) == s"tag${i % 3}")
      if (i % 11 == 0) assert(r.isNullAt(3))
      else if (i % 7 == 0) assert(r.getSeq[String](3).isEmpty)
      else assert(r.getSeq[String](3) == Seq(s"t${i % 4}", s"t${i % 6}"))
      if (i == 1 || i % 9 == 0) assert(r.isNullAt(4))
      else assert(r.getLong(4) == i / 2)
    }
  }

  test("rows option resizes the table") {
    val small = spark.read.format("graft.sources.FixtureItemsSource")
      .option("rows", "10").load()
    assert(small.count() == 10)
  }

  test("mixed-format plan: q10 joins DSv2 BatchScan with parquet, dim broadcast") {
    val df = SparkEntry.queries("q10_cross_source")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), "DSv2 scan missing from plan")
    assert(plan.toLowerCase.contains("parquet"), "parquet scan missing from plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"200-row dim should broadcast:\n$plan")
    assert(df.count() > 0)
  }

  test("engine-routed fixture queries run P1-direct on the fixture database") {
    val res = sources.TpchCatalog.multiDb(spark, "/root/testdata/sf0.001")
      .query(types.QueryDefinition("items",
        columns = Some(Seq("id")),
        filters = Seq(types.QueryFilter("tag", "isNull")),
        orderBy = Seq(types.QueryOrderBy("id"))))
    assert(res.meta.strategy == "direct")
    assert(res.meta.targetDatabase == "fixture")
    val data = res.asInstanceOf[types.DataResult].data
    assert(data.nonEmpty && data.forall(r => r("id").asInstanceOf[Long] % 5 == 0))
  }
}
