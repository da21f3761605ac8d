package graft.source.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Monday.com GraphQL boards (SURVEY.md §2.1 —
  * "at scale, a DSv2 TableProvider with one InputPartition per board/page").
  *
  * `spark.read.format("monday").option("pages", "<p1>,<p2>,...")` — each
  * page (one GraphQL response document: the cursor-pagination unit the
  * driver-side client walks sequentially) becomes its own `InputPartition`,
  * so a 1000-page board fans out across the cluster instead of serializing
  * through the driver. Offline-first: a page spec is a file path of a canned
  * response (tests, replay); a production deployment maps page specs to
  * HTTP fetches behind the same reader.
  *
  * Pushdown surface:
  *  - `SupportsPushDownLimit` → per-partition item cap (the GraphQL
  *    `limit:` argument of `items_page`; Spark still applies the final
  *    global limit)
  *  - `SupportsPushDownRequiredColumns` → only requested envelope fields
  *    are materialized (the reference's GraphQL queries request only needed
  *    fields — source-side projection, `monday_etl_automated.py:203-228`)
  * Both are surfaced in `Scan.description()` so plans show what was pushed.
  */
class MondayTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "monday"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MondaySource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MondayTable(new CaseInsensitiveStringMap(properties))
}

object MondaySource {
  val fullSchema: StructType = StructType(Seq(
    StructField("board_id", StringType),
    StructField("item_id", StringType),
    StructField("item_name", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("n_column_values", IntegerType)))

  def pages(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("pages")).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)
}

class MondayTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"monday(${MondaySource.pages(options).size} pages)"
  override def schema(): StructType = MondaySource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new MondayScanBuilder(MondaySource.pages(options))
}

class MondayScanBuilder(pages: Seq[String])
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {

  private var limit: Int = -1
  private var required: StructType = MondaySource.fullSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve connector column order, keep only requested fields
    required = StructType(MondaySource.fullSchema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new MondayScan(pages, required, limit)
}

class MondayScan(pages: Seq[String], required: StructType, limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MondayScan(pages=${pages.size}, PushedLimit=${if (limit >= 0) limit else "none"}, " +
      s"ReadColumns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] =
    pages.map(p => MondayPagePartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new MondayReaderFactory(required.fieldNames, limit)
}

case class MondayPagePartition(pageSpec: String) extends InputPartition

class MondayReaderFactory(columns: Array[String], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MondayPageReader(
      partition.asInstanceOf[MondayPagePartition].pageSpec, columns, limit)
}

/** Parses one page document and emits one row per item. Runs ON EXECUTORS —
  * the Jackson parse and projection happen where the partition is scheduled,
  * not on the driver. */
class MondayPageReader(pageSpec: String, columns: Array[String], limit: Int)
    extends PartitionReader[InternalRow] {

  private lazy val items: Iterator[InternalRow] = {
    val body = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pageSpec)), "UTF-8")
    val root = new ObjectMapper().readTree(body)
    val boards = root.path("data").path("boards")
    val rows = (0 until boards.size()).iterator.flatMap { b =>
      val board = boards.get(b)
      val boardId = board.path("id").asText(null)
      val arr = board.path("items_page").path("items")
      (0 until arr.size()).iterator.map { i =>
        val item = arr.get(i)
        def s(field: String): UTF8String =
          if (item.path(field).isMissingNode || item.path(field).isNull) null
          else UTF8String.fromString(item.path(field).asText)
        val values: Array[Any] = columns.map {
          case "board_id" =>
            if (boardId == null) null else UTF8String.fromString(boardId)
          case "item_id" => s("id")
          case "item_name" => s("name")
          case "created_at" => s("created_at")
          case "updated_at" => s("updated_at")
          case "n_column_values" => item.path("column_values").size()
        }
        new GenericInternalRow(values): InternalRow
      }
    }
    if (limit >= 0) rows.take(limit) else rows
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (items.hasNext) { current = items.next(); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
