package graft

import java.sql.{Date, Timestamp}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.api.MultiDb
import graft.meta._
import graft.planner.{CacheProvider, SourceRegistry}

/** The reference contract fixture (CONTRACT_TESTS.md:91-375) ported to
  * in-memory DataFrames — deterministic schemas + byte-exact seed values, so
  * contract assertions pin row counts/values reliably. Two logical databases
  * (pg-main, ch-analytics) become two source namespaces in one SparkSession.
  */
object ContractFixture {

  private def ts(s: String) = Timestamp.from(Instant.parse(s))
  private def d(s: String) = Date.valueOf(s)
  private def dec(s: String) = new java.math.BigDecimal(s)

  val DecT: DecimalType = DecimalType(12, 2)

  // ---- metadata --------------------------------------------------------
  private def c(api: String, phys: String, t: String, nullable: Boolean = false,
      mask: Option[String] = None) = ColumnMeta(api, phys, t, nullable, mask)

  val ordersTable: TableMeta = TableMeta("orders", "orders", "pg-main", "orders", Seq(
    c("id", "id", "int"),
    c("customerId", "customer_id", "uuid", mask = Some("uuid")),
    c("productId", "product_id", "uuid", nullable = true),
    c("total", "total_amount", "decimal", mask = Some("number")),
    c("discount", "discount", "decimal", nullable = true),
    c("status", "order_status", "string"),
    c("internalNote", "internal_note", "string", nullable = true, mask = Some("full")),
    c("createdAt", "created_at", "timestamp", mask = Some("date")),
    c("quantity", "quantity", "int"),
    c("isPaid", "is_paid", "boolean", nullable = true),
    c("priorities", "priorities", "int[]", nullable = true),
  ), primaryKey = Seq("id"), relations = Seq(
    RelationMeta("customerId", "users", "id"),
    RelationMeta("productId", "products", "id")))

  val productsTable: TableMeta = TableMeta("products", "products", "pg-main", "products", Seq(
    c("id", "id", "uuid"),
    c("name", "name", "string"),
    c("category", "category", "string"),
    c("price", "price", "decimal", mask = Some("number")),
    c("labels", "labels", "string[]", nullable = true),
  ), primaryKey = Seq("id"))

  val usersTable: TableMeta = TableMeta("users", "users", "pg-main", "users", Seq(
    c("id", "id", "uuid"),
    c("email", "email", "string", mask = Some("email")),
    c("phone", "phone", "string", nullable = true, mask = Some("phone")),
    c("firstName", "first_name", "string", mask = Some("name")),
    c("lastName", "last_name", "string", mask = Some("name")),
    c("role", "role", "string"),
    c("age", "age", "int", nullable = true),
    c("managerId", "manager_id", "uuid", nullable = true),
    c("createdAt", "created_at", "timestamp"),
  ), primaryKey = Seq("id"), relations = Seq(RelationMeta("managerId", "users", "id")))

  val invoicesTable: TableMeta = TableMeta("invoices", "invoices", "pg-main", "invoices", Seq(
    c("id", "id", "uuid"),
    c("orderId", "order_id", "int", nullable = true),
    c("amount", "amount", "decimal", mask = Some("number")),
    c("status", "status", "string"),
    c("issuedAt", "issued_at", "timestamp"),
    c("paidAt", "paid_at", "timestamp", nullable = true),
    c("dueDate", "due_date", "date", nullable = true),
  ), primaryKey = Seq("id"), relations = Seq(RelationMeta("orderId", "orders", "id")))

  val eventsTable: TableMeta = TableMeta("events", "events", "ch-analytics", "events", Seq(
    c("id", "id", "uuid"),
    c("type", "event_type", "string"),
    c("userId", "user_id", "uuid"),
    c("orderId", "order_id", "int", nullable = true),
    c("payload", "payload", "string", nullable = true, mask = Some("full")),
    c("tags", "tags", "string[]", nullable = true),
    c("timestamp", "event_ts", "timestamp"),
  ), primaryKey = Seq("id"), relations = Seq(
    RelationMeta("userId", "users", "id"),
    RelationMeta("orderId", "orders", "id")))

  val orderItemsTable: TableMeta = TableMeta("orderItems", "orderItems", "pg-main", "order_items", Seq(
    c("orderId", "order_id", "int"),
    c("productId", "product_id", "uuid"),
    c("quantity", "quantity", "int"),
    c("unitPrice", "unit_price", "decimal"),
  ), primaryKey = Seq("orderId", "productId"), relations = Seq(
    RelationMeta("orderId", "orders", "id"),
    RelationMeta("productId", "products", "id")))

  private def samplesCols = Seq(
    c("id", "id", "int"),
    c("name", "name", "string"),
    c("email", "email", "string"),
    c("category", "category", "string"),
    c("amount", "amount", "decimal"),
    c("discount", "discount", "decimal", nullable = true),
    c("status", "status", "string"),
    c("tags", "tags", "string[]", nullable = true),
    c("scores", "scores", "int[]", nullable = true),
    c("isActive", "is_active", "boolean", nullable = true),
    c("note", "note", "string", nullable = true),
    c("createdAt", "created_at", "timestamp"),
    c("dueDate", "due_date", "date", nullable = true),
    c("externalId", "external_id", "uuid"),
    c("managerId", "manager_id", "int", nullable = true),
  )

  val samplesTable: TableMeta = TableMeta("samples", "samples", "pg-main", "samples",
    samplesCols, primaryKey = Seq("id"),
    relations = Seq(RelationMeta("managerId", "samples", "id")))
  val chSamplesTable: TableMeta = TableMeta("chSamples", "chSamples", "ch-analytics", "ch_samples",
    samplesCols, primaryKey = Seq("id"),
    relations = Seq(RelationMeta("id", "samples", "id"),
      RelationMeta("managerId", "chSamples", "id")))

  private def sampleItemsCols = Seq(
    c("id", "id", "int"),
    c("sampleId", "sample_id", "int"),
    c("label", "label", "string"),
    c("category", "category", "string"),
    c("amount", "amount", "decimal"),
    c("quantity", "quantity", "int"),
    c("status", "status", "string"),
  )
  val sampleItemsTable: TableMeta = TableMeta("sampleItems", "sampleItems", "pg-main",
    "sample_items", sampleItemsCols, primaryKey = Seq("id"),
    relations = Seq(RelationMeta("sampleId", "samples", "id")))
  val chSampleItemsTable: TableMeta = TableMeta("chSampleItems", "chSampleItems", "ch-analytics",
    "ch_sample_items", sampleItemsCols, primaryKey = Seq("id"),
    relations = Seq(RelationMeta("sampleId", "chSamples", "id")))

  private def sampleDetailsCols = Seq(
    c("id", "id", "int"),
    c("sampleItemId", "sample_item_id", "int"),
    c("info", "info", "string", nullable = true),
  )
  val sampleDetailsTable: TableMeta = TableMeta("sampleDetails", "sampleDetails", "pg-main",
    "sample_details", sampleDetailsCols, primaryKey = Seq("id"),
    relations = Seq(RelationMeta("sampleItemId", "sampleItems", "id")))
  val chSampleDetailsTable: TableMeta = TableMeta("chSampleDetails", "chSampleDetails",
    "ch-analytics", "ch_sample_details", sampleDetailsCols, primaryKey = Seq("id"),
    relations = Seq(RelationMeta("sampleItemId", "chSampleItems", "id")))

  def config(trinoEnabled: Boolean = true): MetadataConfig = MetadataConfig(
    databases = Seq(
      DatabaseMeta("pg-main", "postgres", Some("pg_main")),
      DatabaseMeta("ch-analytics", "clickhouse", Some("ch_analytics"))),
    tables = Seq(ordersTable, productsTable, usersTable, invoicesTable, eventsTable,
      orderItemsTable, samplesTable, chSamplesTable, sampleItemsTable, chSampleItemsTable,
      sampleDetailsTable, chSampleDetailsTable),
    syncs = Seq(ExternalSync("orders", "ch-analytics", "default.orders_replica",
      estimatedLag = "seconds")),
    caches = Seq(CacheMeta("redis-main", "redis",
      Seq(CachedTableMeta("users", "users:{id}")))),
    trinoEnabled = trinoEnabled,
  )

  val roles: Seq[RoleMeta] = Seq(
    RoleMeta("admin", None),
    RoleMeta("tenant-user", Some(Seq(
      TableRoleAccess("orders", Some(Seq("id", "total", "status", "createdAt")), Seq("total")),
      TableRoleAccess("users", Some(Seq("id", "firstName", "lastName", "email")), Seq("email")),
      TableRoleAccess("products", Some(Seq("id", "name", "category", "price")))))),
    RoleMeta("analyst", Some(Seq(
      TableRoleAccess("orders", Some(Seq("id", "total", "status", "internalNote", "createdAt", "customerId")),
        Seq("internalNote", "createdAt", "customerId")),
      TableRoleAccess("users", Some(Seq("id", "firstName", "lastName", "email", "phone")),
        Seq("phone", "firstName", "lastName")),
      TableRoleAccess("products", Some(Seq("id", "name", "category", "price")), Seq("price")),
      TableRoleAccess("invoices", Some(Seq("id", "orderId", "amount", "status")), Seq("amount"))))),
    RoleMeta("viewer", Some(Seq(
      TableRoleAccess("orders", Some(Seq("id", "status", "createdAt", "quantity"))),
      TableRoleAccess("users", Some(Seq("id", "firstName")))))),
    RoleMeta("no-access", Some(Nil)),
    RoleMeta("orders-service", Some(Seq(
      TableRoleAccess("orders", None),
      TableRoleAccess("products", None),
      TableRoleAccess("users", Some(Seq("id", "firstName", "lastName")))))),
    RoleMeta("reporting-service", Some(Seq(
      TableRoleAccess("orders", Some(Seq("id", "total", "status", "createdAt")), Seq("total")),
      TableRoleAccess("products", None)))),
    // disjoint users column grants — cross-scope intersection is empty (C724)
    RoleMeta("scope-a", Some(Seq(
      TableRoleAccess("users", Some(Seq("firstName")))))),
    RoleMeta("scope-b", Some(Seq(
      TableRoleAccess("users", Some(Seq("email", "age")))))),
  )

  // ---- seed data (physical column names) -------------------------------

  def ordersDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("customer_id", StringType, nullable = false),
      StructField("product_id", StringType, nullable = true),
      StructField("total_amount", DecT, nullable = false),
      StructField("discount", DecT, nullable = true),
      StructField("order_status", StringType, nullable = false),
      StructField("internal_note", StringType, nullable = true),
      StructField("created_at", TimestampType, nullable = false),
      StructField("quantity", IntegerType, nullable = false),
      StructField("is_paid", BooleanType, nullable = true),
      StructField("priorities", ArrayType(IntegerType, containsNull = false), nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "uuid-c1", "uuid-p1", dec("100.00"), dec("10.00"), "active", "internal-1",
        ts("2024-01-15T10:00:00Z"), 2, true, Seq(1, 2)),
      Row(2, "uuid-c2", "uuid-p2", dec("200.00"), null, "paid", null,
        ts("2024-02-20T14:30:00Z"), 5, true, Seq(3)),
      Row(3, "uuid-c1", "uuid-p1", dec("50.00"), dec("5.00"), "cancelled", "internal-3",
        ts("2024-03-10T08:15:00Z"), 1, false, null),
      Row(4, "uuid-c3", null, dec("300.00"), null, "active", null,
        ts("2024-04-05T16:45:00Z"), 10, null, Seq()),
      Row(5, "uuid-c2", "uuid-p3", dec("150.00"), dec("0.00"), "shipped", "internal-5",
        ts("2024-05-12T12:00:00Z"), 3, true, Seq(1, 2, 3))), schema)
  }

  def productsDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("category", StringType, nullable = false),
      StructField("price", DecT, nullable = false),
      StructField("labels", ArrayType(StringType, containsNull = false), nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row("uuid-p1", "Widget A", "electronics", dec("25.00"), Seq("sale", "new")),
      Row("uuid-p2", "Widget B", "clothing", dec("40.00"), Seq("clearance")),
      Row("uuid-p3", "Widget C", "electronics", dec("15.00"), null)), schema)
  }

  def usersDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("email", StringType, nullable = false),
      StructField("phone", StringType, nullable = true),
      StructField("first_name", StringType, nullable = false),
      StructField("last_name", StringType, nullable = false),
      StructField("role", StringType, nullable = false),
      StructField("age", IntegerType, nullable = true),
      StructField("manager_id", StringType, nullable = true),
      StructField("created_at", TimestampType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row("uuid-c1", "alice@example.com", "+1234567890", "Alice", "Smith", "admin",
        30, null, ts("2023-01-01T00:00:00Z")),
      Row("uuid-c2", "bob@example.com", null, "Bob", "Jones", "viewer",
        25, "uuid-c1", ts("2023-06-15T00:00:00Z")),
      Row("uuid-c3", "carol@example.com", "+9876543210", "Carol", "Williams", "viewer",
        null, "uuid-c1", ts("2024-01-01T00:00:00Z"))), schema)
  }

  def invoicesDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("order_id", IntegerType, nullable = true),
      StructField("amount", DecT, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("issued_at", TimestampType, nullable = false),
      StructField("paid_at", TimestampType, nullable = true),
      StructField("due_date", DateType, nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row("uuid-i1", 1, dec("100.00"), "paid", ts("2024-01-20T00:00:00Z"),
        ts("2024-01-25T00:00:00Z"), d("2024-02-20")),
      Row("uuid-i2", 2, dec("200.00"), "pending", ts("2024-02-25T00:00:00Z"), null,
        d("2024-03-25")),
      Row("uuid-i3", 1, dec("50.00"), "paid", ts("2024-01-22T00:00:00Z"),
        ts("2024-01-28T00:00:00Z"), null)), schema)
  }

  def eventsDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("user_id", StringType, nullable = false),
      StructField("order_id", IntegerType, nullable = true),
      StructField("payload", StringType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
      StructField("event_ts", TimestampType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row("uuid-e1", "purchase", "uuid-c1", 1, "{\"action\":\"buy\"}",
        Seq("urgent", "vip"), ts("2024-01-15T10:05:00Z")),
      Row("uuid-e2", "view", "uuid-c2", null, null, null, ts("2024-02-20T14:00:00Z")),
      Row("uuid-e3", "purchase", "uuid-c1", 3, "{\"action\":\"buy\"}",
        Seq("urgent"), ts("2024-03-10T08:20:00Z"))), schema)
  }

  def orderItemsDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("order_id", IntegerType, nullable = false),
      StructField("product_id", StringType, nullable = false),
      StructField("quantity", IntegerType, nullable = false),
      StructField("unit_price", DecT, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "uuid-p1", 2, dec("25.00")),
      Row(1, "uuid-p2", 1, dec("40.00")),
      Row(2, "uuid-p2", 5, dec("40.00")),
      Row(5, "uuid-p3", 3, dec("15.00"))), schema)
  }

  def samplesDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("email", StringType, nullable = false),
      StructField("category", StringType, nullable = false),
      StructField("amount", DecT, nullable = false),
      StructField("discount", DecT, nullable = true),
      StructField("status", StringType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
      StructField("scores", ArrayType(IntegerType, containsNull = false), nullable = true),
      StructField("is_active", BooleanType, nullable = true),
      StructField("note", StringType, nullable = true),
      StructField("created_at", TimestampType, nullable = false),
      StructField("due_date", DateType, nullable = true),
      StructField("external_id", StringType, nullable = false),
      StructField("manager_id", IntegerType, nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "Alpha", "alpha@test.com", "electronics", dec("100.00"), dec("10.00"),
        "active", Seq("fast", "new"), Seq(1, 2), true, "note-1",
        ts("2024-01-15T10:00:00Z"), d("2024-02-20"), "uuid-s1", null),
      Row(2, "Beta", "beta@test.com", "clothing", dec("200.00"), null,
        "paid", Seq("slow"), Seq(3), true, null,
        ts("2024-02-20T14:30:00Z"), d("2024-03-25"), "uuid-s2", 1),
      Row(3, "Gamma", "gamma@test.com", "electronics", dec("50.00"), dec("5.00"),
        "cancelled", Seq("fast"), null, false, "note-3",
        ts("2024-03-10T08:15:00Z"), null, "uuid-s3", 1),
      Row(4, "Delta", "delta@test.com", "food", dec("300.00"), null,
        "active", null, Seq(), null, null,
        ts("2024-04-05T16:45:00Z"), d("2024-05-01"), "uuid-s4", null),
      Row(5, "Epsilon", "epsilon@test.com", "electronics", dec("150.00"), dec("0.00"),
        "shipped", Seq("fast", "slow", "new"), Seq(1, 2, 3), true, "note-5",
        ts("2024-05-12T12:00:00Z"), d("2024-06-15"), "uuid-s5", 2)), schema)
  }

  def sampleItemsDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("sample_id", IntegerType, nullable = false),
      StructField("label", StringType, nullable = false),
      StructField("category", StringType, nullable = false),
      StructField("amount", DecT, nullable = false),
      StructField("quantity", IntegerType, nullable = false),
      StructField("status", StringType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(1, 1, "item-A", "electronics", dec("25.00"), 2, "active"),
      Row(2, 1, "item-B", "clothing", dec("120.00"), 1, "active"),
      Row(3, 2, "item-C", "clothing", dec("40.00"), 5, "paid"),
      Row(4, 3, "item-D", "electronics", dec("60.00"), 3, "cancelled"),
      Row(5, 5, "item-E", "food", dec("10.00"), 1, "active"),
      Row(6, 5, "item-F", "electronics", dec("20.00"), 2, "paid")), schema)
  }

  def sampleDetailsDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("sample_item_id", IntegerType, nullable = false),
      StructField("info", StringType, nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(1, 1, "detail-1"), Row(2, 2, null), Row(3, 3, "detail-3"),
      Row(4, 5, "detail-4")), schema)
  }

  /** In-memory Redis stand-in over the users seed (keyPattern users:{id}). */
  final class UsersCache(spark: SparkSession) extends CacheProvider {
    private lazy val rows: Map[String, Map[String, Any]] =
      usersDf(spark).collect().map { r =>
        val m = usersTable.columns.map(cm =>
          cm.apiName -> r.get(r.fieldIndex(cm.physicalName))).toMap
        s"users:${m("id")}" -> m
      }.toMap
    override def getMany(keys: Seq[String]): Map[String, Map[String, Any]] =
      keys.flatMap(k => rows.get(k).map(k -> _)).toMap
  }

  def registry(spark: SparkSession): SourceRegistry = {
    def l(df: => DataFrame): () => DataFrame = () => df
    SourceRegistry(
      loaders = Map(
        ("pg-main", "orders") -> l(ordersDf(spark)),
        ("pg-main", "products") -> l(productsDf(spark)),
        ("pg-main", "users") -> l(usersDf(spark)),
        ("pg-main", "invoices") -> l(invoicesDf(spark)),
        ("ch-analytics", "events") -> l(eventsDf(spark)),
        ("pg-main", "orderItems") -> l(orderItemsDf(spark)),
        ("pg-main", "samples") -> l(samplesDf(spark)),
        ("ch-analytics", "chSamples") -> l(samplesDf(spark)),
        ("pg-main", "sampleItems") -> l(sampleItemsDf(spark)),
        ("ch-analytics", "chSampleItems") -> l(sampleItemsDf(spark)),
        ("pg-main", "sampleDetails") -> l(sampleDetailsDf(spark)),
        ("ch-analytics", "chSampleDetails") -> l(sampleDetailsDf(spark)),
      ),
      replicaLoaders = Map(("ch-analytics", "orders") -> l(ordersDf(spark))),
      cacheProviders = Map("redis-main" -> new UsersCache(spark)),
      executorTimeoutMs = Map("pg-main" -> 30000L, "ch-analytics" -> 60000L),
    )
  }

  def multiDb(spark: SparkSession, trinoEnabled: Boolean = true): MultiDb =
    MultiDb(spark, config(trinoEnabled), roles, registry(spark))
}
