package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Op 2 as a production-shaped source (SURVEY.md §2 row 2): a DataSource
 * V2 `TableProvider` whose scan issues the GET — one input partition per
 * URL, fetched on the EXECUTOR, so a million payload endpoints fan out
 * across the cluster instead of funneling through the driver (the
 * reference fetches on the single Airflow worker,
 * weather_etl_pipeline.py:51-53).
 *
 * The source models the TRANSPORT only: each fetched document becomes
 * one row of a single `raw` string column; parsing stays in the query
 * layer (`from_json` + Schemas.owmPayload), exactly like
 * [[Sources.jsonDocuments]]. `http(s)://` and `file://` URLs both work —
 * tests exercise a real localhost HTTP round-trip.
 *
 * Usage: `spark.read.format("http-json").option("urls", "u1,u2").load()`
 */
class PayloadSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-json"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PayloadSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PayloadTable(properties.getOrDefault("urls", ""))
}

object PayloadSource {
  val schema: StructType = StructType(Seq(StructField("raw", StringType, nullable = true)))

  /** One GET (or file read), body as string. Executor-side. */
  def fetch(url: String): String = {
    val conn = new java.net.URL(url).openConnection()
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    val in = conn.getInputStream
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}

private class PayloadTable(urls: String) extends Table with SupportsRead {
  override def name(): String = s"http-json(${urls.take(80)})"
  override def schema(): StructType = PayloadSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val list = Option(options.get("urls")).filter(_.nonEmpty).getOrElse(urls)
    new PayloadScanBuilder(list.split(",").map(_.trim).filter(_.nonEmpty))
  }
}

private class PayloadScanBuilder(urls: Array[String]) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = PayloadSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    urls.map(u => PayloadPartition(u): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory = PayloadReaderFactory()
}

private case class PayloadPartition(url: String) extends InputPartition

private case class PayloadReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[PayloadPartition].url
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (done) false
        else {
          row = InternalRow(UTF8String.fromString(PayloadSource.fetch(url)))
          done = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
