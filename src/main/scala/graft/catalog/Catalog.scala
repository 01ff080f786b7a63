package graft.catalog

import org.apache.spark.sql.types._

/** Warehouse data layers.
  *
  * Mirrors the reference's five logical layers mapped onto two physical
  * databases (reference: betl/ConfClass.py:25-31). Here each layer is a
  * namespace (directory of Parquet tables) inside the warehouse root.
  */
sealed abstract class Layer(val id: String, val db: String) {
  override def toString: String = id
}

object Layer {
  case object EXT extends Layer("EXT", "ETL") // extracted source copies
  case object TRN extends Layer("TRN", "ETL") // transform intermediates
  case object LOD extends Layer("LOD", "ETL") // load-ready staging
  case object BSE extends Layer("BSE", "TRG") // base star schema
  case object SUM extends Layer("SUM", "TRG") // summary tables

  val all: Seq[Layer] = Seq(EXT, TRN, LOD, BSE, SUM)

  def apply(id: String): Layer =
    all.find(_.id == id.toUpperCase)
      .getOrElse(throw new IllegalArgumentException(
        s"Unknown data layer '$id' (expected one of ${all.mkString(", ")})"))
}

/** Column roles in the dimensional model
  * (reference: betl/datamodel/ColumnClass.py:15-24).
  */
sealed trait ColumnRole
object ColumnRole {
  case object SurrogateKey extends ColumnRole
  case object NaturalKey extends ColumnRole
  case object ForeignKey extends ColumnRole
  case object Attribute extends ColumnRole
}

/** Table kinds derived from the reference's name-prefix convention
  * (reference: betl/datamodel/TableClass.py:115-132).
  */
sealed trait TableType
object TableType {
  case object Dimension extends TableType // dm_
  case object Fact extends TableType // ft_
  case object Summary extends TableType // su_
  case object Other extends TableType

  def fromName(name: String): TableType =
    if (name.startsWith("dm_")) Dimension
    else if (name.startsWith("ft_")) Fact
    else if (name.startsWith("su_")) Summary
    else Other
}

/** A logical column: name + Spark type + dimensional role. The role is also
  * carried on the StructField metadata so it survives round-trips through
  * DataFrame schemas.
  */
case class ColumnDef(
    name: String,
    dataType: DataType = StringType,
    role: ColumnRole = ColumnRole.Attribute,
    fkDimension: Option[String] = None,
    nullable: Boolean = true) {

  def toStructField: StructField = {
    val roleStr = role match {
      case ColumnRole.SurrogateKey => "SK"
      case ColumnRole.NaturalKey   => "NK"
      case ColumnRole.ForeignKey   => "FK"
      case ColumnRole.Attribute    => "ATT"
    }
    val mb = new MetadataBuilder().putString("graft.role", roleStr)
    fkDimension.foreach(d => mb.putString("graft.fkDimension", d))
    StructField(name, dataType, nullable, mb.build())
  }
}

/** A logical table: ordered columns within a layer. Column ORDER is part of
  * the contract — `write` reorders datasets to this order and rejects
  * unknown/missing columns (reference: betl/dataflow/dfl_io.py:108-160).
  */
case class TableDef(
    name: String,
    layer: Layer,
    columns: Seq[ColumnDef]) {

  def tableType: TableType = TableType.fromName(name)
  def columnNames: Seq[String] = columns.map(_.name)
  def surrogateKey: Option[ColumnDef] =
    columns.find(_.role == ColumnRole.SurrogateKey)
  def naturalKeys: Seq[ColumnDef] =
    columns.filter(_.role == ColumnRole.NaturalKey)
  def foreignKeys: Seq[ColumnDef] =
    columns.filter(_.role == ColumnRole.ForeignKey)
  def structType: StructType = StructType(columns.map(_.toStructField))
}

/** The logical warehouse schema: layer → table → columns.
  *
  * Equivalent of the reference's DataLayer/Dataset/Table/Column object
  * hierarchy (betl/datamodel/DataLayerClass.py:9-53) minus the GSheet
  * plumbing: definitions are registered programmatically or derived from
  * data on first write (auto-registration keeps ad-hoc dataflows cheap).
  */
class Catalog extends Serializable {
  // all access synchronized: pipeline stages run ops concurrently and each
  // op's write() may auto-register tables (see graft.pipeline.Pipeline)
  private val tables =
    scala.collection.mutable.LinkedHashMap[(String, String), TableDef]()

  def register(t: TableDef): TableDef = tables.synchronized {
    tables((t.layer.id, t.name)) = t
    t
  }

  def lookup(layer: Layer, name: String): Option[TableDef] =
    tables.synchronized { tables.get((layer.id, name)) }

  def apply(layer: Layer, name: String): TableDef =
    lookup(layer, name).getOrElse(throw new IllegalArgumentException(
      s"Table '$name' not registered in layer ${layer.id}"))

  def tablesIn(layer: Layer): Seq[TableDef] = tables.synchronized {
    tables.collect { case ((l, _), t) if l == layer.id => t }.toSeq
  }

  /** Derive a TableDef from an observed DataFrame schema. */
  def registerFromSchema(
      layer: Layer, name: String, schema: StructType): TableDef =
    register(TableDef(name, layer, schema.fields.toSeq.map { f =>
      val role = if (f.metadata.contains("graft.role"))
        f.metadata.getString("graft.role") match {
          case "SK" => ColumnRole.SurrogateKey
          case "NK" => ColumnRole.NaturalKey
          case "FK" => ColumnRole.ForeignKey
          case _    => ColumnRole.Attribute
        }
      else ColumnRole.Attribute
      ColumnDef(f.name, f.dataType, role, nullable = f.nullable)
    }))
}
