package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

/** Edge-dialect tests against synthesized minimal workbooks: inline
  * rich-text runs, boolean/error cells, missing headers (fail-fast),
  * headerless mode. */
class XlsxEdgeSpec extends SparkTestBase {

  private def makeXlsx(sheetXml: String, sharedXml: Option[String] = None,
      date1904: Boolean = false): String = {
    val dir = Files.createTempDirectory("xlsx-edge")
    val path = dir.resolve("t.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val wbPr = if (date1904) """<workbookPr date1904="1"/>""" else ""
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">$wbPr<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    sharedXml.foreach(x => put("xl/sharedStrings.xml", x))
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetXml</sheetData></worksheet>""")
    zos.close()
    path
  }

  test("inline rich-text runs concatenate; booleans and errors decode") {
    val path = makeXlsx(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>col_a</t></is></c><c r="B1" t="inlineStr"><is><t>col_b</t></is></c><c r="C1" t="inlineStr"><is><t>col_c</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><r><t>foo</t></r><r><t>bar</t></r></is></c><c r="B2" t="b"><v>1</v></c><c r="C2" t="e"><v>#DIV/0!</v></c></row>""".stripMargin)
    val schema = StructType(Seq(
      StructField("col_a", StringType), StructField("col_b", BooleanType),
      StructField("col_c", StringType)))
    val rows = spark.read.format("xlsx").schema(schema).load(path).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "foobar") // runs concatenated, not last-wins
    assert(rows(0).getBoolean(1))
    assert(rows(0).isNullAt(2)) // error cell → null
  }

  test("sparse rows, skipped row numbers, and empty trailing rows decode as " +
      "nulls / absent rows") {
    // row 2: only B present (A, C sparse); row 3 entirely absent from the
    // file (Excel omits untouched rows); row 4: values again; row 5: an
    // empty <row> element with no cells (some writers emit these)
    val path = makeXlsx(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>col_a</t></is></c><c r="B1" t="inlineStr"><is><t>col_b</t></is></c><c r="C1" t="inlineStr"><is><t>col_c</t></is></c></row>
        |<row r="2"><c r="B2"><v>7</v></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>x</t></is></c><c r="B4"><v>8</v></c><c r="C4"><v>9</v></c></row>
        |<row r="5"/>""".stripMargin)
    val schema = StructType(Seq(
      StructField("col_a", StringType), StructField("col_b", LongType),
      StructField("col_c", LongType)))
    val rows = spark.read.format("xlsx").schema(schema).load(path)
      .collect()
    // the empty <row/> carries no cells → all-null row or skipped; either
    // way the two DATA rows must decode exactly
    val data = rows.filterNot(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(data.length == 2, s"got ${rows.mkString(";")}")
    assert(data(0).isNullAt(0) && data(0).getLong(1) == 7L && data(0).isNullAt(2))
    assert(data(1).getString(0) == "x" && data(1).getLong(1) == 8L &&
      data(1).getLong(2) == 9L)
  }

  test("declared column missing from the header fails fast, not silently null") {
    val path = makeXlsx(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>present</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c></row>""".stripMargin)
    val schema = StructType(Seq(
      StructField("present", LongType), StructField("missing_col", StringType)))
    val e = intercept[Exception] {
      spark.read.format("xlsx").schema(schema).load(path).collect()
    }
    assert(e.getMessage.contains("missing_col") ||
      Option(e.getCause).exists(_.getMessage.contains("missing_col")))
  }

  test("header=false maps columns positionally") {
    val path = makeXlsx(
      """<row r="1"><c r="A1"><v>10</v></c><c r="B1"><v>20</v></c></row>
        |<row r="2"><c r="A2"><v>30</v></c><c r="B2"><v>40</v></c></row>""".stripMargin)
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", LongType)))
    val rows = spark.read.format("xlsx").option("header", "false")
      .schema(schema).load(path).collect().sortBy(_.getLong(0))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 20L), (30L, 40L)))
  }

  test("shared strings with multiple rich-text runs concatenate") {
    val path = makeXlsx(
      """<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c></row>""".stripMargin,
      sharedXml = Some(
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>h</t></si><si><r><t>ab</t></r><r><t>cd</t></r></si></sst>"""))
    val schema = StructType(Seq(StructField("h", StringType)))
    val rows = spark.read.format("xlsx").schema(schema).load(path).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "abcd")
  }

  test("1904 date system offsets serials by 1,462 days vs the 1900 system") {
    // serial 100: 1900-system → 1899-12-30 + 100d = 1900-04-09;
    //             1904-system → 1904-01-01 + 100d = 1904-04-10
    val sheet =
      """<row r="1"><c r="A1" t="inlineStr"><is><t>d</t></is></c></row>
        |<row r="2"><c r="A2"><v>100</v></c></row>""".stripMargin
    val schema = StructType(Seq(StructField("d", DateType)))
    val d1900 = spark.read.format("xlsx").schema(schema)
      .load(makeXlsx(sheet)).collect()(0).getDate(0)
    val d1904 = spark.read.format("xlsx").schema(schema)
      .load(makeXlsx(sheet, date1904 = true)).collect()(0).getDate(0)
    assert(d1900.toString == "1900-04-09")
    assert(d1904.toString == "1904-04-10")
    val dayMs = 86400000L
    assert((d1904.getTime - d1900.getTime) / dayMs == 1462L)
  }

  test("pushed filters drop rows at the source and appear in the scan description") {
    val path = makeXlsx(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>qty</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>keep</t></is></c><c r="B2"><v>10</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>drop</t></is></c><c r="B3"><v>3</v></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>keep</t></is></c><c r="B4"><v>7</v></c></row>""".stripMargin)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("qty", LongType)))
    val df = spark.read.format("xlsx").schema(schema).load(path)
      .filter(org.apache.spark.sql.functions.col("name") === "keep")
      .filter(org.apache.spark.sql.functions.col("qty") > 5L)
    assert(df.collect().map(_.getLong(1)).sorted.toSeq == Seq(7L, 10L))
    // the scan node must advertise what it pushed (plan-visible contract)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") && plan.contains("EqualTo(name,keep)"),
      plan)
  }

  test("pushed In/startsWith/null filters agree with Spark's residual semantics") {
    import org.apache.spark.sql.functions.col
    // beta's qty cell is ABSENT → null through the declared schema
    val path = makeXlsx(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>qty</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>alpha</t></is></c><c r="B2"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>beta</t></is></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>alphonse</t></is></c><c r="B4"><v>3</v></c></row>""".stripMargin)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("qty", LongType)))
    def read = spark.read.format("xlsx").schema(schema).load(path)
    assert(read.filter(col("name").startsWith("alph"))
      .collect().map(_.getString(0)).sorted.toSeq == Seq("alpha", "alphonse"))
    assert(read.filter(col("qty").isNull)
      .collect().map(_.getString(0)).toSeq == Seq("beta"))
    assert(read.filter(col("qty").isin(1L, 3L)).count() == 2)
    // null comparison drops the row at the source AND in the residual
    assert(read.filter(col("qty") > 0L).count() == 2)
  }

  /** 0-based column index → A1-style column letters (25→Z, 26→AA). */
  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Multi-sheet workbook: sheet "Narrow" (2 cols) + sheet "Wide"
    * (`width` cols — past Z, so data cells carry AA+ refs, the classic
    * hand-rolled-parser decode bug) + blank trailing rows on Wide:
    * an empty <row/> and a style-only row with no <v> cells. */
  private def makeWideXlsx(width: Int, dataRows: Int): String = {
    val dir = Files.createTempDirectory("xlsx-wide")
    val path = dir.resolve("wide.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Narrow" sheetId="1" r:id="rId1"/><sheet name="Wide" sheetId="2" r:id="rId2"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>""")
    def sheetXml(rows: String) =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rows</sheetData></worksheet>"""
    put("xl/worksheets/sheet1.xml", sheetXml(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>only_a</t></is></c><c r="B1" t="inlineStr"><is><t>only_b</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c></row>""".stripMargin))
    val header = (0 until width).map(j =>
      s"""<c r="${colRef(j)}1" t="inlineStr"><is><t>c${"%02d".format(j + 1)}</t></is></c>""").mkString
    val data = (0 until dataRows).map { i =>
      val cells = (0 until width).map(j =>
        s"""<c r="${colRef(j)}${i + 2}"><v>${(i + 1) * 100 + (j + 1)}</v></c>""").mkString
      s"""<row r="${i + 2}">$cells</row>"""
    }.mkString
    // blank trailing rows: an EMPTY row element, then a style-only row
    // (cells with no <v> — what Excel leaves after formatting-then-clear)
    val trailing =
      s"""<row r="${dataRows + 2}"/>""" +
      s"""<row r="${dataRows + 3}"><c r="A${dataRows + 3}" s="1"/><c r="${colRef(width - 1)}${dataRows + 3}" s="1"/></row>"""
    put("xl/worksheets/sheet2.xml", sheetXml(s"""<row r="1">$header</row>$data$trailing"""))
    zos.close()
    path
  }

  test("sheet selection + >26 columns: AA+ cell refs land in the right fields; " +
      "blank trailing rows are skipped") {
    val width = 30
    val path = makeWideXlsx(width, dataRows = 3)
    val schema = StructType((1 to width).map(j =>
      StructField("c" + "%02d".format(j), LongType)))
    val rows = spark.read.format("xlsx").schema(schema)
      .option("sheet", "Wide").load(path)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 3) // the two trailing blank rows never surface
    for (i <- 0 until 3; j <- 0 until width)
      assert(rows(i).getLong(j) == (i + 1) * 100 + (j + 1),
        s"cell decode wrong at row $i col $j (${colRef(j)}): ${rows(i)}")
  }

  test("combined pushed filter + pruned columns on an AA+ column") {
    import org.apache.spark.sql.functions.col
    val width = 30
    val path = makeWideXlsx(width, dataRows = 3)
    val schema = StructType((1 to width).map(j =>
      StructField("c" + "%02d".format(j), LongType)))
    // c28 sits at index 27 = column AB — both the filter column and one
    // projected column are past Z
    val df = spark.read.format("xlsx").schema(schema)
      .option("sheet", "Wide").load(path)
      .filter(col("c28") > 128L) // keeps rows 2,3 (228, 328)
      .select("c02", "c28")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((202L, 228L), (302L, 328L)))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThan(c28,128)"), s"filter not pushed: $scan")
    assert(scan.contains("columns=[c02, c28]") || scan.contains("columns=[c02,c28]"),
      s"pruning missing in: $scan")
  }
}
