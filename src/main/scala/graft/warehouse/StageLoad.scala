package graft.warehouse

import graft.GraftConf
import graft.catalog.Layer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** A default row appended to every dimension with a negative surrogate key
  * (reference: per-dimension default-row files synced from a sheet,
  * betl/defaultdataflows/stageLoad.py:76-93,233-268; conventionally
  * -1 = MISSING, -2 = UNRECOGNISED). Per-column `values` override
  * specific columns (cast from string to the column's type); otherwise
  * string attributes get the label and everything else stays null.
  */
case class DefaultRow(
    sk: Long, label: String, values: Map[String, String] = Map.empty)

object DefaultRow {
  val standard: Seq[DefaultRow] =
    Seq(DefaultRow(-1L, "MISSING"), DefaultRow(-2L, "UNRECOGNISED"))

  /** File-driven default rows (the reference's per-dimension txt files):
    * a JSON array of `{"sk": -1, "label": "MISSING",
    * "values": {"col": "literal"}}` objects.
    */
  def fromJsonFile(path: String): Seq[DefaultRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map { n =>
      DefaultRow(
        sk = n.get("sk").asLong(),
        label = n.get("label").asText(),
        values = Option(n.get("values")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty))
    }.toSeq
  }
}

/** Declarative description of a dimension bulk load. `skName` and the
  * SK/NK-map table name derive from the table name by convention:
  * `dm_customer` → `sk_customer` (reference stageLoad.py:270-316 emits the
  * same `sk_<dim>` map back to the LOD layer).
  */
case class DimensionSpec(
    name: String,
    nkCols: Seq[String],
    attrCols: Seq[String],
    defaultRows: Seq[DefaultRow] = DefaultRow.standard) {
  def baseName: String = name.stripPrefix("dm_")
  def skName: String = s"sk_$baseName"
  def mapTableName: String = s"sk_$baseName"
}

/** One FK resolution on a fact: `factNkCol` in the fact joins `mapNkCol`
  * in the dimension's SK/NK map, producing the dim's SK column.
  */
case class FkMapping(factNkCol: String, dimName: String, mapNkCol: String) {
  def baseName: String = dimName.stripPrefix("dm_")
  def skName: String = s"sk_$baseName"
}

case class FactSpec(name: String, fks: Seq[FkMapping])

/** Bulk dimension/fact loading — the engine's rendering of the reference's
  * load stage (betl/defaultdataflows/stageLoad.py:184-430).
  *
  * Differences by design:
  *  - SKs are deterministic NK-rank (see [[SurrogateKeys]]) instead of DB
  *    sequences; the truncate-to-reset-sequence dance disappears.
  *  - The SK/NK map is a pure projection of the loaded dimension.
  *  - Fact FK resolution is a chain of LEFT broadcast joins against the
  *    (small) SK/NK maps with -1 defaulting — the reference's per-FK pandas
  *    merge loop (stageLoad.py:361-409) at cluster scale.
  *  - Index DDL around the load (stageLoad.py:96-131) is a Parquet no-op.
  */
object StageLoad {

  /** truncate BSE dim → read LOD → assign SKs → append default rows →
    * write BSE + emit SK/NK map to LOD
    * (reference bulkLoadDimension, stageLoad.py:184-316).
    */
  def bulkLoadDimension(
      spark: SparkSession, conf: GraftConf, spec: DimensionSpec): DataFrame = {
    val lod = spark.read.parquet(conf.tablePath(Layer.LOD, spec.name))
    val deduped = lod
      .select((spec.nkCols ++ spec.attrCols).map(col): _*)
      .dropDuplicates(spec.nkCols)
    val keyed = SurrogateKeys.assign(deduped, spec.nkCols, spec.skName)

    // default rows: negative SKs; explicit per-column values win, then
    // label in string attrs, null elsewhere
    spec.defaultRows.foreach { dr =>
      val unknown = dr.values.keySet -- keyed.columns.toSet
      require(unknown.isEmpty,
        s"default row sk=${dr.sk}: values reference unknown column(s) " +
          s"${unknown.mkString(", ")} (have: ${keyed.columns.mkString(", ")})")
    }
    val defaults = spec.defaultRows.map { dr =>
      keyed.schema.fields.foldLeft(
        spark.range(1).toDF("_one").select(lit(dr.sk).as(spec.skName))) {
        case (d, f) if f.name == spec.skName => d
        case (d, f) if dr.values.contains(f.name) =>
          d.withColumn(f.name, lit(dr.values(f.name)).cast(f.dataType))
        case (d, f) if f.dataType == StringType &&
            spec.attrCols.contains(f.name) =>
          d.withColumn(f.name, lit(dr.label))
        case (d, f) =>
          d.withColumn(f.name, lit(null).cast(f.dataType))
      }.select(keyed.columns.map(col): _*)
    }
    val dim = defaults.foldLeft(keyed)(_.unionByName(_))

    dim.write.mode("overwrite").parquet(conf.tablePath(Layer.BSE, spec.name))
    // the SK/NK map is just a projection; keep only real members
    val skMap = dim
      .filter(col(spec.skName) > 0)
      .select((spec.skName +: spec.nkCols).map(col): _*)
    skMap.write.mode("overwrite")
      .parquet(conf.tablePath(Layer.LOD, spec.mapTableName))
    spark.read.parquet(conf.tablePath(Layer.BSE, spec.name))
  }

  /** Broadcast only when the SK/NK map's on-disk size is under the
    * session's autoBroadcastJoinThreshold. A 500M-member dimension's map
    * would OOM the driver if broadcast unconditionally; above the
    * threshold we leave the join strategy to Catalyst/AQE (which still
    * broadcasts runtime-small sides). Compressed Parquet bytes understate
    * the in-memory size, so a 4× inflation factor is applied.
    */
  private def maybeBroadcast(
      spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val threshold =
      try spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        .replaceAll("(?i)b$", "").toLong
      catch { case _: NumberFormatException => 10L * 1024 * 1024 }
    val onDisk = graft.io.ParquetUtil.dirSizeBytes(spark, path)
    if (threshold > 0 && onDisk >= 0 && onDisk * 4 <= threshold) broadcast(df)
    else df
  }

  /** read LOD fact → per-FK left join on NK (broadcast when the map is
    * small, see [[maybeBroadcast]]) → missing → -1 → write BSE
    * (reference bulkLoadFact, stageLoad.py:331-430).
    */
  def bulkLoadFact(
      spark: SparkSession, conf: GraftConf, spec: FactSpec): DataFrame = {
    val lod = spark.read.parquet(conf.tablePath(Layer.LOD, spec.name))
    val resolved = spec.fks.foldLeft(lod) { (df, fk) =>
      val mapPath = conf.tablePath(Layer.LOD, s"sk_${fk.baseName}")
      val skMap = spark.read.parquet(mapPath)
        .withColumnRenamed(fk.mapNkCol, fk.factNkCol)
      df.join(maybeBroadcast(spark, skMap, mapPath), Seq(fk.factNkCol), "left")
        .withColumn(fk.skName,
          coalesce(col(fk.skName).cast(LongType), lit(-1L)))
        .drop(fk.factNkCol)
    }
    resolved.write.mode("overwrite")
      .parquet(conf.tablePath(Layer.BSE, spec.name))
    spark.read.parquet(conf.tablePath(Layer.BSE, spec.name))
  }
}
