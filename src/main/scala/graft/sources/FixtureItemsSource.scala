package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 in-memory table — the second *physical source kind* next
  * to parquet (reference README.md:20-30 has one executor per engine; here
  * each engine maps to a Spark source implementation, and this one shows
  * the full connector surface: TableProvider → Table → ScanBuilder →
  * Batch → partitioned PartitionReaders).
  *
  * Rows are a pure function of the row number, so the DuckDB oracle can
  * regenerate the exact table with `generate_series` — the fixture gives
  * the correctness gate a nullable column and an array column (absent from
  * the TPC-H testdata), plus a second source format inside oracle-gated
  * plans. Partitioned into 4 id ranges like a real distributed scan.
  */
class FixtureItemsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixtureItems.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FixtureItemsTable(
      Option(properties.get("rows")).map(_.toInt).getOrElse(FixtureItems.DefaultRows))
}

object FixtureItems {
  val DefaultRows = 200

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("tag", StringType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("parentId", LongType, nullable = true)))

  /** Deterministic row i (1-based) — mirrored by the oracle SQL:
    * tag NULL every 5th row; tags NULL every 11th, empty every 7th;
    * parentId = i/2 (a self-relation for self-EXISTS), NULL for the root
    * and every 9th row.
    */
  def row(i: Long): InternalRow = {
    val tag = if (i % 5 == 0) null else UTF8String.fromString("tag" + (i % 3))
    val tags =
      if (i % 11 == 0) null
      else if (i % 7 == 0) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](
        UTF8String.fromString("t" + (i % 4)), UTF8String.fromString("t" + (i % 6))))
    val parent: Any = if (i == 1 || i % 9 == 0) null else java.lang.Long.valueOf(i / 2)
    new GenericInternalRow(Array[Any](i, UTF8String.fromString("item_" + i), tag, tags, parent))
  }

  /** The oracle-side CTE regenerating this table in DuckDB. */
  val oracleCte: String =
    """items AS (
      |  SELECT i AS id, 'item_' || i AS name,
      |    CASE WHEN i % 5 = 0 THEN NULL ELSE 'tag' || (i % 3) END AS tag,
      |    CASE WHEN i % 11 = 0 THEN NULL
      |         WHEN i % 7 = 0 THEN []::VARCHAR[]
      |         ELSE ['t' || (i % 4), 't' || (i % 6)] END AS tags,
      |    CASE WHEN i = 1 OR i % 9 = 0 THEN NULL ELSE i // 2 END AS "parentId"
      |  FROM generate_series(1, 200) t(i))""".stripMargin
}

class FixtureItemsTable(rows: Int) extends Table with SupportsRead {
  override def name(): String = "graft_fixture_items"
  override def schema(): StructType = FixtureItems.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val n = rows
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = FixtureItems.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val slices = 4
        (0 until slices).map { s =>
          FixtureRange(n.toLong * s / slices + 1, n.toLong * (s + 1) / slices): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = FixtureReaderFactory
    }
  }
}

case class FixtureRange(lo: Long, hi: Long) extends InputPartition

object FixtureReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FixtureRange]
    new PartitionReader[InternalRow] {
      private var cur = r.lo - 1
      override def next(): Boolean = { cur += 1; cur <= r.hi }
      override def get(): InternalRow = FixtureItems.row(cur)
      override def close(): Unit = ()
    }
  }
}
