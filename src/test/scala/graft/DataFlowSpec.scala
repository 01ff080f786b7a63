package graft

import graft.catalog.Layer
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Ports of the reference behavioural suite (betl/betl-test) plus the
  * error contracts the oracle corpus cannot cover. Same tiny string
  * frames, same expected column lists / values.
  */
class DataFlowSpec extends SparkSpec {

  /** Standard 3-col + audit-stamped frame, as in the reference conftest. */
  private def stampedFlow()(implicit c: GraftConf): DataFlow = {
    val dfl = flow("spec")
    dfl.createDataset("t", Map(
      "col_a" -> Seq("1", "2", "3"),
      "col_b" -> Seq("x", "y", "x"),
      "col_c" -> Seq("p", "q", "r")))
    dfl.setAuditCols("t", "BULK", "TEST_SRC")
    dfl
  }

  // --- dropColumns matrix (test_dataflow_changeSchema_dropColumns.py) ---

  test("dropColumns drop-list keeps audit cols by default") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", colsToDrop = Seq("col_b"))
    assert(dfl.getColumnList("t") ==
      Seq("col_a", "col_c") ++ Audit.all)
  }

  test("dropColumns drop-list with dropAuditCols removes audit cols") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", colsToDrop = Seq("col_b"), dropAuditCols = true)
    assert(dfl.getColumnList("t") == Seq("col_a", "col_c"))
  }

  test("dropColumns keep-list keeps audit cols by default") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", colsToKeep = Seq("col_a"))
    assert(dfl.getColumnList("t") == Seq("col_a") ++ Audit.all)
  }

  test("dropColumns keep-list with dropAuditCols keeps only the list") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", colsToKeep = Seq("col_b", "col_c"),
      dropAuditCols = true)
    assert(dfl.getColumnList("t") == Seq("col_b", "col_c"))
  }

  test("dropColumns rejects drop-list and keep-list together") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    val e = intercept[IllegalArgumentException] {
      dfl.dropColumns("t", colsToDrop = Seq("col_a"),
        colsToKeep = Seq("col_b"))
    }
    assert(e.getMessage.contains("not both"))
  }

  // --- addColumns forms (test_dataflow_changeSchema_addColumns.py) ---

  test("addColumns adds literal and computed columns") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.addColumns("t", Map(
      "lit_col" -> lit("k"),
      "calc_col" -> concat(col("col_b"), lit("!"))))
    val rows = dfl.getColumns("t", Seq("col_a", "lit_col", "calc_col"))
      .orderBy("col_a").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("k", "k", "k"))
    assert(rows.map(_.getString(2)).toSeq == Seq("x!", "y!", "x!"))
  }

  test("setColumns overwrites an existing column (alias of addColumns)") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.setColumns("t", Map("col_c" -> upper(col("col_c"))))
    assert(dfl.getColumns("t", Seq("col_c")).orderBy("col_c")
      .collect().map(_.getString(0)).toSeq == Seq("P", "Q", "R"))
  }

  test("withRowFunction computes a row-wise column (apply axis=1)") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.withRowFunction("t", "joined",
      r => s"${r.getAs[String]("col_a")}-${r.getAs[String]("col_b")}")
    assert(dfl.getColumns("t", Seq("joined")).orderBy("joined")
      .collect().map(_.getString(0)).toSeq == Seq("1-x", "2-y", "3-x"))
  }

  // --- pivotColsToRows (test_dataflow_changeSchema_pivotColsToRows.py) ---

  test("pivotColsToRows melts chosen columns, audit cols ride along") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.pivotColsToRows("t", Seq("col_a"), Seq("col_b", "col_c"),
      "variable", "value")
    val cols = dfl.getColumnList("t")
    assert(cols.toSet == (Seq("col_a", "variable", "value") ++ Audit.all).toSet)
    val rows = dfl.getColumns("t", Seq("col_a", "variable", "value"))
      .orderBy("col_a", "variable").collect()
    assert(rows.length == 6)
    assert(rows.head.toSeq == Seq("1", "col_b", "x"))
  }

  test("pivotColsToRows with multiple id vars") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", dropAuditCols = true)
    dfl.pivotColsToRows("t", Seq("col_a", "col_b"), Seq("col_c"),
      "k", "v")
    assert(dfl.getColumnList("t") == Seq("col_a", "col_b", "k", "v"))
    assert(dfl.get("t").count() == 3)
  }

  // --- renameColumns (test_dataflow_changeSchema_renameColumns.py) ---

  test("renameColumns renames via map") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.renameColumns("t", Map("col_a" -> "id", "col_c" -> "tag"))
    assert(dfl.getColumnList("t") ==
      Seq("id", "col_b", "tag") ++ Audit.all)
  }

  // --- write/read round trip (test_dataflow_io_queueForLoad.py) ---

  test("prepForLoad writes LOD and read round-trips it") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", dropAuditCols = true)
    dfl.prepForLoad("t", "dm_test_dimension",
      nkColumns = Seq("col_a", "col_b"))
    val dfl2 = flow("reader")
    dfl2.read("dm_test_dimension", Layer.LOD)
    assert(dfl2.getColumnList("dm_test_dimension") == Seq("col_c", "nk"))
    assert(dfl2.get("dm_test_dimension").orderBy("nk")
      .collect().map(_.getString(1)).toSeq == Seq("1_x", "2_y", "3_x"))
  }

  test("write reorders columns to the registered schema") {
    implicit val c: GraftConf = tmpConf()
    c.catalog.register(graft.catalog.TableDef("ordered", Layer.EXT,
      Seq("col_c", "col_a", "col_b").map(n =>
        graft.catalog.ColumnDef(n))))
    val dfl = stampedFlow()
    dfl.dropColumns("t", dropAuditCols = true)
    dfl.write("t", "ordered", Layer.EXT)
    val dfl2 = flow("reader")
    dfl2.read("ordered", Layer.EXT)
    assert(dfl2.getColumnList("ordered") == Seq("col_c", "col_a", "col_b"))
  }

  test("write raises a schema-mismatch report for unknown/missing columns") {
    implicit val c: GraftConf = tmpConf()
    c.catalog.register(graft.catalog.TableDef("strict", Layer.EXT,
      Seq("col_a", "col_z").map(n => graft.catalog.ColumnDef(n))))
    val dfl = stampedFlow()
    dfl.dropColumns("t", dropAuditCols = true)
    val e = intercept[IllegalArgumentException] {
      dfl.write("t", "strict", Layer.EXT)
    }
    assert(e.getMessage.contains("col_b") && e.getMessage.contains("col_z"))
  }

  test("write overwrite is safe when lineage reads the same table") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", dropAuditCols = true)
    dfl.write("t", "self", Layer.EXT)
    // read → transform → write back to the same path (delta pattern)
    val dfl2 = flow("rewriter")
    dfl2.read("self", Layer.EXT)
    dfl2.setColumns("self", Map("col_b" -> upper(col("col_b"))))
    dfl2.write("self", "self", Layer.EXT)
    val dfl3 = flow("reader")
    dfl3.read("self", Layer.EXT)
    assert(dfl3.get("self").count() == 3)
    assert(dfl3.getColumns("self", Seq("col_b")).orderBy("col_b")
      .collect().map(_.getString(0)).toSeq == Seq("X", "X", "Y"))
  }

  // --- filter semantics ---

  test("filter Ne and NotIn keep null rows (pandas parity)") {
    implicit val c: GraftConf = tmpConf()
    val dfl = flow("nulls")
    dfl.createDataset("n", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a"), Row("b"), Row(null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType)))))
    dfl.filter("n", Map("v" -> FilterSpec.Ne("a")),
      targetDataset = Some("ne"))
    dfl.filter("n", Map("v" -> FilterSpec.NotIn(Seq("a", "b"))),
      targetDataset = Some("ni"))
    assert(dfl.get("ne").count() == 2) // b + null
    assert(dfl.get("ni").count() == 1) // null survives
  }

  test("filter applies the intended < for Lt (reference bug fixed)") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.filter("t", Map("col_a" -> FilterSpec.Lt("3")))
    assert(dfl.get("t").count() == 2)
  }

  test("filterWhereNotIn anti-joins on composite keys") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.createDataset("lookup", Map(
      "col_a" -> Seq("1", "3"),
      "col_b" -> Seq("x", "zzz")))
    dfl.filterWhereNotIn("t", Seq("col_a", "col_b"), "lookup")
    // (1,x) removed; (3,x) kept because lookup has (3,zzz)
    assert(dfl.getColumns("t", Seq("col_a")).orderBy("col_a")
      .collect().map(_.getString(0)).toSeq == Seq("2", "3"))
  }

  // --- misc operators ---

  test("toNumeric strips garbage, coerces blanks to 0") {
    implicit val c: GraftConf = tmpConf()
    val dfl = flow("nums")
    dfl.createDataset("n", Map(
      "raw" -> Seq("id#42-v", "n/a", "1.2.3", "7.9")))
    dfl.toNumeric("n", Seq("raw"), Seq("clean"))
    assert(dfl.getColumns("n", Seq("clean")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 0L, 7L, 42L))
  }

  test("union raises with sorted column lists on mismatch") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.createDataset("other", Map("different" -> Seq("1")))
    val e = intercept[IllegalArgumentException] {
      dfl.union(Seq("t", "other"), "u")
    }
    assert(e.getMessage.contains("column mismatch"))
    assert(e.getMessage.contains("different"))
  }

  test("truncate empties a table but preserves its schema") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.dropColumns("t", dropAuditCols = true)
    dfl.write("t", "trunc_me", Layer.EXT)
    dfl.truncate("trunc_me", Layer.EXT)
    val dfl2 = flow("reader")
    dfl2.read("trunc_me", Layer.EXT)
    assert(dfl2.get("trunc_me").count() == 0)
    assert(dfl2.getColumnList("trunc_me") == Seq("col_a", "col_b", "col_c"))
  }

  test("get of a missing dataset names the dataflow and candidates") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    val e = intercept[IllegalArgumentException] { dfl.get("nope") }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("t"))
  }

  test("replace literal touches only chosen columns; regex replaces") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.replace("t", "x", "XX", columns = Seq("col_b"))
    dfl.replace("t", "^[pq]", "Z", regex = true, columns = Seq("col_c"))
    val rows = dfl.getColumns("t", Seq("col_b", "col_c"))
      .orderBy("col_b", "col_c").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("XX", "XX", "y"))
    assert(rows.map(_.getString(1)).sorted.toSeq == Seq("Z", "Z", "r"))
  }

  test("customSQL sees every named dataset as a view") {
    implicit val c: GraftConf = tmpConf()
    val dfl = stampedFlow()
    dfl.createDataset("dim", Map(
      "col_b" -> Seq("x", "y"), "label" -> Seq("ex", "why")))
    dfl.customSQL(
      "SELECT label, count(*) AS n FROM t JOIN dim USING (col_b) " +
        "GROUP BY label ORDER BY label",
      targetDataset = Some("out"))
    val rows = dfl.get("out").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ex", 2L), ("why", 1L)))
  }

  test("saltedJoin equals the plain join on skewed keys; rejects outer") {
    import graft.operators.SkewJoin
    import spark.implicits._
    // 1000 rows on one hot key + a tail, incl. an unmatched probe key
    val probe = ((1 to 1000).map(i => ("hot", i)) ++
      Seq(("warm", 1), ("cold", 2), ("nokey", 3)))
      .toDF("k", "v")
    val build = Seq(("hot", 10), ("warm", 20), ("cold", 30), ("unused", 40))
      .toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "v").collect()
        .map(r => (r.getString(0), r.getInt(1), r.get(2))).toSeq
    assert(canon(SkewJoin.saltedJoin(probe, build, Seq("k"), "inner", 8))
      == canon(probe.join(build, Seq("k"), "inner")))
    assert(canon(SkewJoin.saltedJoin(probe, build, Seq("k"), "left", 8))
      == canon(probe.join(build, Seq("k"), "left")))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe, build, Seq("k"), "full_outer", 8)
    }
  }
}
