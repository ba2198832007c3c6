package graft.rdf.io

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.rdf.Triple

/** DataSource V2 connector for Turtle: `spark.read.format("turtle")
  * .load(pathOrGlob)` yields the canonical triple DataFrame — the same
  * rows as [[TurtleReader.read]] with one InputPartition per file and
  * per-file bnode remapping (S4 discipline), sharing the
  * [[RdfFileBatch]] machinery with the jsonld source. Read-only: the
  * reference emits Turtle through the single-document serializer
  * ([[Turtle.write]], K2); a distributed turtle SINK would emit one
  * document per partition like [[JsonLdWriteBuilder]] — add it there if
  * ever needed. */
class TurtleSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "turtle"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Triple.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TurtleTable(RdfSourceUtil.resolvePaths(schema, properties, "turtle"))
}

private[io] class TurtleTable(paths: Seq[String])
  extends Table with SupportsRead {
  override def name(): String = s"turtle(${paths.mkString(",")})"
  override def schema(): StructType = Triple.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = Triple.schema
      override def description(): String = name()
      override def toBatch: Batch =
        new RdfFileBatch(paths, (text, sfx) => TurtleReader.parse(text, sfx))
    }
}
