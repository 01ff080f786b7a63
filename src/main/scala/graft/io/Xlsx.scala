package graft.io

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import scala.collection.immutable.ListMap
import scala.xml.{Elem, XML}

/** Minimal OOXML spreadsheet (.xlsx) codec — enough of ECMA-376 to carry
  * the reference's Excel contract (betl/io/_excel.py:5-44,
  * excelIO.py:4-35: named worksheets of stringly cells, first row =
  * column names) without a POI dependency. An xlsx file is a zip of XML
  * parts; reading handles shared, inline and raw cell values, writing
  * emits inline strings only.
  *
  * Scale stance: this is a CONTROL-PLANE codec (MDM mappings, schema
  * descriptions — the things the reference keeps in spreadsheets), not a
  * data path; everything is driver-side by design.
  */
object Xlsx {

  /** "BC12" → zero-based column index (0 = A). */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Zero-based column index → "A".."Z","AA".. */
  private[graft] def colName(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      sb.insert(0, ('A' + (n - 1) % 26).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def zipEntries(path: String): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new FileInputStream(path))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
        val buf = new ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        Iterator.continually(zin.read(chunk)).takeWhile(_ > 0)
          .foreach(buf.write(chunk, 0, _))
        e.getName -> buf.toByteArray
      }.toMap
    } finally zin.close()
  }

  /** Decode OOXML `_xHHHH_` character escapes (ECMA-376 §22.4.2.4 — how
    * spreadsheet strings carry XML-illegal characters). Single
    * left-to-right pass, so `_x005F_x0041_` decodes to the literal
    * `_x0041_` rather than re-decoding.
    */
  private[graft] def decodeEscapes(s: String): String =
    if (!s.contains("_x")) s
    else {
      val m = java.util.regex.Pattern
        .compile("_x([0-9A-Fa-f]{4})_").matcher(s)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        sb.append(s, last, m.start())
        sb.append(Integer.parseInt(m.group(1), 16).toChar)
        last = m.end()
      }
      sb.append(s, last, s.length).toString
    }

  /** Inverse of [[decodeEscapes]]: escape XML-illegal control characters
    * as `_xHHHH_`, first protecting literal text that would itself parse
    * as an escape.
    */
  private[graft] def encodeEscapes(s: String): String = {
    // Single pass deciding per-underscore whether to protect. A literal
    // "_xHHHH" is dangerous iff the OUTPUT char that follows it is '_' —
    // which happens when the next input char is a literal '_' (protected
    // or not, its output starts with '_') OR a control char the encoder
    // is about to escape (escapes start with '_'). A trailing-underscore
    // lookahead on the raw input misses the second case: "_x0041"+''
    // would encode to "_x0041_x0004_" and decode to "Ax0004_".
    def needsEnc(c: Char) = c < 0x20 && c != '\t' && c != '\n' && c != '\r'
    def isHex(c: Char) =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (needsEnc(c)) sb.append(f"_x${c.toInt}%04X_")
      else if (c == '_' && i + 6 < n && s.charAt(i + 1) == 'x' &&
               isHex(s.charAt(i + 2)) && isHex(s.charAt(i + 3)) &&
               isHex(s.charAt(i + 4)) && isHex(s.charAt(i + 5)) &&
               (s.charAt(i + 6) == '_' || needsEnc(s.charAt(i + 6))))
        sb.append("_x005F_")
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def cellText(c: scala.xml.Node, shared: IndexedSeq[String]): String =
    decodeEscapes((c \ "@t").text match {
      case "s" => // shared-string index
        (c \ "v").text.toIntOption.map(shared.lift(_).getOrElse(""))
          .getOrElse("")
      case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
      case _ => (c \ "v").text // "str" formula results and raw numerics
    })

  /** Read every worksheet: sheet name → rows of cells (ragged rows are
    * preserved; callers pad against the header).
    */
  def readSheets(path: String): ListMap[String, Seq[Seq[String]]] = {
    val entries = zipEntries(path)
    def parse(name: String): Option[Elem] =
      entries.get(name).map(b => XML.loadString(new String(b, "UTF-8")))
    val shared: IndexedSeq[String] = parse("xl/sharedStrings.xml")
      .map(ss => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString)
        .toIndexedSeq)
      .getOrElse(IndexedSeq.empty)
    val wb = parse("xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException(s"$path: not an xlsx (no workbook)"))
    val rels = parse("xl/_rels/workbook.xml.rels")
      .map(r => (r \ "Relationship").map(n =>
        (n \ "@Id").text -> (n \ "@Target").text).toMap)
      .getOrElse(Map.empty)
    val sheets = (wb \\ "sheet").map { s =>
      val name = (s \ "@name").text
      val rid = s.attributes.asAttrMap.collectFirst {
        case (k, v) if k == "r:id" || k.endsWith(":id") => v
      }.getOrElse("")
      val target = rels.getOrElse(rid, s"worksheets/sheet1.xml")
        .stripPrefix("/xl/").stripPrefix("./")
      name -> s"xl/$target"
    }
    ListMap(sheets.flatMap { case (name, part) =>
      parse(part).map { sheet =>
        val rows = (sheet \ "sheetData" \ "row").map { r =>
          // the r= cell reference is optional in ECMA-376: cells without
          // one occupy the column after their predecessor
          var next = 0
          val cells = (r \ "c").map { c =>
            val ref = (c \ "@r").text
            val i = if (ref.isEmpty) next else colIndex(ref)
            next = i + 1
            (i, cellText(c, shared))
          }
          if (cells.isEmpty) Seq.empty[String]
          else {
            val width = cells.map(_._1).max + 1
            val arr = Array.fill(width)("")
            cells.foreach { case (i, v) => if (i >= 0) arr(i) = v }
            arr.toSeq
          }
        }
        name -> rows
      }
    }: _*)
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c   => c.toString
  }

  /** Write worksheets (inline strings) as a complete xlsx file. */
  def writeSheets(
      path: String, sheets: ListMap[String, Seq[Seq[String]]]): Unit = {
    val names = sheets.keys.toSeq
    def sheetXml(rows: Seq[Seq[String]]): String = {
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.map { case (v, ci) =>
          s"""<c r="${colName(ci)}${ri + 1}" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(encodeEscapes(v))}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
        .stripMargin
    }
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |${names.indices.map(i => s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |</Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>
         |${names.zipWithIndex.map { case (n, i) => s"""<sheet name="${xmlEscape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString("\n")}
         |</sheets>
         |</workbook>""".stripMargin
    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${names.indices.map(i => s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin
    val parts: Seq[(String, String)] =
      Seq("[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> wbRels) ++
        names.zipWithIndex.map { case (n, i) =>
          s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(sheets(n))
        }
    val out = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
