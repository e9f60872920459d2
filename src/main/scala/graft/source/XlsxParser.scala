package graft.source

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Minimal xlsx (SpreadsheetML) parser on JDK built-ins only — the
  * environment ships no Apache POI, so the source reads the zip container
  * with `java.util.zip` and streams the sheet XML with StAX.
  *
  * Dialect covered (what Excel/openpyxl actually write, and everything
  * the reference fixture `/root/reference/uploads/dados_importacao.xlsx`
  * uses — see `importador.py:47` for the reference's reader):
  * shared strings (`t="s"`, incl. rich-text runs), inline strings
  * (`t="inlineStr"`), formula strings (`t="str"`), booleans (`t="b"`),
  * errors (`t="e"` → null), bare numerics (no `t`), sparse cells, and
  * empty trailing rows (skipped). Dates are numeric serials; typing them
  * is the schema's job (see XlsxPartitionReader) — styles.xml is not
  * consulted.
  */
object XlsxParser {

  sealed trait Cell
  final case class SCell(v: String) extends Cell
  final case class NCell(v: Double) extends Cell
  final case class BCell(v: Boolean) extends Cell

  final case class SheetRef(name: String, entry: String)

  private val factory = {
    val f = XMLInputFactory.newFactory()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def reader(zip: ZipFile, entry: String): XMLStreamReader = {
    val e = zip.getEntry(entry)
    require(e != null, s"xlsx entry not found: $entry")
    factory.createXMLStreamReader(zip.getInputStream(e))
  }

  /** Sheet name → worksheet entry path, in workbook order (the reference
    * enumerates sheet names the same way, `importador.py:33–39`). */
  def sheetRefs(zip: ZipFile): Seq[SheetRef] = {
    // relationship id -> target from xl/_rels/workbook.xml.rels
    val rels = scala.collection.mutable.Map[String, String]()
    val rr = reader(zip, "xl/_rels/workbook.xml.rels")
    try while (rr.hasNext) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT &&
          rr.getLocalName == "Relationship") {
        val target = rr.getAttributeValue(null, "Target")
        val id = rr.getAttributeValue(null, "Id")
        if (id != null && target != null)
          rels(id) = if (target.startsWith("/")) target.drop(1)
                     else if (target.startsWith("xl/")) target
                     else s"xl/$target"
      }
    } finally rr.close()

    val out = ArrayBuffer[SheetRef]()
    val wr = reader(zip, "xl/workbook.xml")
    try while (wr.hasNext) {
      if (wr.next() == XMLStreamConstants.START_ELEMENT &&
          wr.getLocalName == "sheet") {
        val name = wr.getAttributeValue(null, "name")
        val rid = wr.getAttributeValue(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id")
        rels.get(rid).foreach(t => out += SheetRef(name, t))
      }
    } finally wr.close()
    out.toSeq
  }

  /** Whether the workbook uses the 1904 (Mac-origin) date system:
    * `<workbookPr date1904="1"/>` in xl/workbook.xml. Serials in a 1904
    * workbook count from 1904-01-01, not 1899-12-30 — reading one as
    * 1900-system silently shifts every date by 1,462 days. */
  def isDate1904(zip: ZipFile): Boolean = {
    val r = reader(zip, "xl/workbook.xml")
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
          val v = r.getAttributeValue(null, "date1904")
          return v == "1" || (v != null && v.equalsIgnoreCase("true"))
        }
      }
      false
    } finally r.close()
  }

  /** Shared-string table; rich-text runs inside one `<si>` concatenate. */
  def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return IndexedSeq.empty
    val out = ArrayBuffer[String]()
    val r = reader(zip, "xl/sharedStrings.xml")
    val sb = new StringBuilder
    var inSi = false
    var inT = false
    try while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ =>
          }
        case _ =>
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** "BC12" → 0-based column index (54). */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Stream the rows of one worksheet as sparse (colIdx, Cell) arrays.
    * Rows with no valued cells are skipped (trailing style-only rows).
    * The iterator owns a StAX cursor over the zip stream — fully lazy,
    * O(row) memory; `close` the ZipFile only after consumption. */
  def rows(zipFile: ZipFile, entry: String, shared: IndexedSeq[String]): Iterator[IndexedSeq[(Int, Cell)]] =
    new Iterator[IndexedSeq[(Int, Cell)]] {
      private val r = reader(zipFile, entry)
      private var nextRow: IndexedSeq[(Int, Cell)] = null
      private var done = false

      private def parseRow(): IndexedSeq[(Int, Cell)] = {
        // cursor is ON a <row> start element
        val cells = ArrayBuffer[(Int, Cell)]()
        var col = -1
        var t: String = null
        var inV = false
        var inIs = false
        var inT = false
        val sb = new StringBuilder
        var depthEnd = false
        while (!depthEnd && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "c" =>
                  val ref = r.getAttributeValue(null, "r")
                  col = if (ref != null) colIndex(ref) else col + 1
                  t = r.getAttributeValue(null, "t")
                  sb.clear()
                case "v" => inV = true; sb.clear()
                case "is" => inIs = true; sb.clear() // runs concatenate
                case "t" if inIs => inT = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              if (inV || inT) sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" | "t" if inV || inT =>
                  inV = false; inT = false
                case "c" =>
                  val raw = sb.toString
                  if (raw.nonEmpty) {
                    val cell: Cell = t match {
                      case "s" => SCell(shared(raw.toInt))
                      case "str" | "inlineStr" => SCell(raw)
                      case "b" => BCell(raw == "1" || raw.equalsIgnoreCase("true"))
                      case "e" => null
                      case _ => NCell(raw.toDouble)
                    }
                    if (cell != null) cells += ((col, cell))
                  }
                  sb.clear()
                case "is" => inIs = false
                case "row" => depthEnd = true
                case _ =>
              }
            case _ =>
          }
        }
        cells.toIndexedSeq
      }

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && !done) {
          var found = false
          while (!found && r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT &&
                r.getLocalName == "row") found = true
          }
          if (!found) { done = true; r.close() }
          else {
            val cells = parseRow()
            if (cells.nonEmpty) nextRow = cells
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): IndexedSeq[(Int, Cell)] = {
        val out = nextRow; advance(); out
      }
    }
}
