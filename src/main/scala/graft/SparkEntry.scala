package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Numeric determinism convention (required for the DuckDB-oracle hash gate):
  * every aggregated double goes through an exact DECIMAL accumulation
  * (`sum(cast(x as decimal))`) and is cast back to double at the end, so
  * Spark's partition-order-dependent double addition can never drift from
  * the oracle. Averages are computed as exact-decimal-sum / count in double.
  * Every query ORDER BYs a deterministic unique key prefix.
  */
object SparkEntry {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val D4 = DecimalType(38, 4)
  private val D6 = DecimalType(38, 6)

  /** Exact sum of a double column: decimal accumulate, double out. */
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(D4)).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- 2.6 aggregation: count/sum/avg/min/max + group by (TPC-H Q1-ish)
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D6))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // ---- 2.5 joins (left + inner, transitive customer→orders→lineitem) + top-k
    "q3_top_revenue" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"), "inner")
        .join(l, o("o_orderkey") === l("l_orderkey"), "inner")
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D6))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },
    // ---- 2.4 EXISTS → left-semi join
    "q4_exists" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").where(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    },
    // ---- 2.3 filters (=, in, between, like) + 2.2 projection + 2.7 sort/limit
    "q5_filter_project" -> { (s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderstatus") === "F" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(50000.0, 200000.0))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    // ---- 2.6 HAVING over aggregation alias
    "q6_having" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spent"))
        .where(col("n_orders") >= 5)
        .orderBy(col("o_custkey"))
    },
    // ---- 2.2 DISTINCT
    "q7_distinct" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment")).distinct()
        .orderBy("c_mktsegment")
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 10""".stripMargin,
    "q4_exists" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "q5_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice BETWEEN 50000.0 AND 200000.0
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q6_having" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 5 ORDER BY o_custkey""".stripMargin,
    "q7_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
  )
}
