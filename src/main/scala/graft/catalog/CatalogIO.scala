package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types.DataType

import scala.jdk.CollectionConverters._

/** Declarative warehouse schema files — the Spark-side equivalent of the
  * reference's `schema/dbSchemaDesc_<DB>.txt` JSON descriptions
  * (betl/ConfClass.py:258-264, betl/datamodel/DataLayerClass.py:26-53).
  *
  * Format:
  * {{{
  * { "layers": { "BSE": { "tables": [
  *     { "name": "dm_customer", "columns": [
  *         {"name": "sk_customer", "type": "bigint", "role": "SK"},
  *         {"name": "c_custkey",   "type": "bigint", "role": "NK"},
  *         {"name": "c_name",      "type": "string"},
  *         {"name": "sk_region",   "type": "bigint", "role": "FK",
  *          "fkDimension": "dm_region"} ] } ] } } }
  * }}}
  * Types are Spark DDL strings (`DataType.fromDDL`); role defaults to
  * attribute.
  */
object CatalogIO {

  private val mapper = new ObjectMapper()

  private def roleOf(s: String): ColumnRole = s match {
    case "SK" => ColumnRole.SurrogateKey
    case "NK" => ColumnRole.NaturalKey
    case "FK" => ColumnRole.ForeignKey
    case _    => ColumnRole.Attribute
  }

  private def roleStr(r: ColumnRole): String = r match {
    case ColumnRole.SurrogateKey => "SK"
    case ColumnRole.NaturalKey   => "NK"
    case ColumnRole.ForeignKey   => "FK"
    case ColumnRole.Attribute    => "ATT"
  }

  def fromJson(json: String): Catalog = {
    val root = mapper.readTree(json)
    val cat = new Catalog
    val layers = Option(root.get("layers")).getOrElse(
      throw new IllegalArgumentException("schema file: missing 'layers'"))
    layers.properties().asScala.foreach { e =>
      val layer = Layer(e.getKey)
      e.getValue.get("tables").elements().asScala.foreach { t =>
        val cols = t.get("columns").elements().asScala.map { c =>
          ColumnDef(
            name = c.get("name").asText(),
            dataType = DataType.fromDDL(
              Option(c.get("type")).map(_.asText()).getOrElse("string")),
            role = Option(c.get("role")).map(n => roleOf(n.asText()))
              .getOrElse(ColumnRole.Attribute),
            fkDimension = Option(c.get("fkDimension")).map(_.asText()))
        }.toSeq
        cat.register(TableDef(t.get("name").asText(), layer, cols))
      }
    }
    cat
  }

  def fromJsonFile(path: String): Catalog =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))

  def toJson(cat: Catalog): String = {
    val root = mapper.createObjectNode()
    val layers = root.putObject("layers")
    Layer.all.foreach { layer =>
      val tables = cat.tablesIn(layer)
      if (tables.nonEmpty) {
        val arr = layers.putObject(layer.id).putArray("tables")
        tables.foreach { t =>
          val tn = arr.addObject()
          tn.put("name", t.name)
          val cols = tn.putArray("columns")
          t.columns.foreach { c =>
            val cn = cols.addObject()
            cn.put("name", c.name)
            cn.put("type", c.dataType.simpleString)
            if (c.role != ColumnRole.Attribute) cn.put("role", roleStr(c.role))
            c.fkDimension.foreach(cn.put("fkDimension", _))
          }
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def toJsonFile(cat: Catalog, path: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path), toJson(cat).getBytes("UTF-8"))
}
