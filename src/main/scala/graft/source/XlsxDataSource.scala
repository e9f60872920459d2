package graft.source

import java.util
import java.util.zip.ZipFile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 xlsx reader: `spark.read.format("xlsx")
  * .option("sheet", name).schema(declared).load(path)`.
  *
  * Design (SURVEY §7.3): the reference reads Excel eagerly into pandas
  * with dtype inference (`importador.py:47`) — the inference is the root
  * of its phone-as-float and mixed-CEP quirks (SURVEY Q3). This source
  * instead takes a DECLARED schema and converts cells per field type;
  * with no schema it reads every column as string (safe, lossless).
  *
  * Scale posture: one InputPartition per sheet — a zip deflate stream is
  * not splittable, so parallelism comes from many files/sheets, which is
  * how a 100 TB spreadsheet-shaped corpus arrives in practice. Column
  * pruning is pushed into the cell decoder (`SupportsPushDownRequiredColumns`):
  * unneeded cells are skipped before any conversion cost.
  *
  * Typing rules per declared field:
  *  - String: numeric cells render integrals without ".0" (canonicalizes
  *    reference quirk Q3 at the source; `etl_process.py:14–15` turns
  *    NaN into "nan" and leaves "…73.0" — we do neither)
  *  - Date/Timestamp: numeric cells are Excel 1900-system serials
  *    (days since 1899-12-30); strings are rejected as null
  *  - numeric/boolean/decimal: direct conversion, null on mismatch
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxDataSource.headerSchema(XlsxDataSource.opts(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XlsxTable(schema, XlsxDataSource.opts(new CaseInsensitiveStringMap(properties)))
}

object XlsxDataSource {
  final case class Opts(path: String, sheet: Option[String], header: Boolean)
      extends Serializable

  private[source] def opts(m: CaseInsensitiveStringMap): Opts = {
    val path = Option(m.get("path")).getOrElse(
      throw new IllegalArgumentException("xlsx source requires a path"))
    Opts(path, Option(m.get("sheet")), Option(m.get("header")).forall(_.toBoolean))
  }

  /** A path may be one .xlsx file or a directory of them — a zip
    * deflate stream is not splittable, so the parallelism unit is the
    * FILE (sorted for deterministic partition numbering). This is the
    * 100 TB shape: spreadsheet corpora arrive as many files. */
  private[source] def expandFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.toLowerCase.endsWith(".xlsx"))
        .map(_.getAbsolutePath).sorted.toSeq
    else Seq(path)
  }

  private[source] def resolveSheet(zip: ZipFile, o: Opts): XlsxParser.SheetRef = {
    val refs = XlsxParser.sheetRefs(zip)
    o.sheet match {
      case Some(n) => refs.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$n' not found; sheets: ${refs.map(_.name).mkString(", ")}"))
      case None => refs.head
    }
  }

  /** Header row → all-string StructType (inference = names only, never
    * types). */
  private[source] def headerSchema(o: Opts): StructType = {
    val first = expandFiles(o.path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .xlsx files at ${o.path}"))
    val zip = new ZipFile(first)
    try {
      val ref = resolveSheet(zip, o)
      val shared = XlsxParser.sharedStrings(zip)
      val it = XlsxParser.rows(zip, ref.entry, shared)
      if (!it.hasNext) return StructType(Nil)
      val header = it.next()
      if (o.header) {
        StructType(header.map { case (i, c) =>
          StructField(cellToHeaderName(c, i), StringType)
        })
      } else {
        val width = header.map(_._1).max + 1
        StructType((0 until width).map(i => StructField(s"_c$i", StringType)))
      }
    } finally zip.close()
  }

  private def cellToHeaderName(c: XlsxParser.Cell, i: Int): String = c match {
    case XlsxParser.SCell(s) => s
    case XlsxParser.NCell(d) => numToString(d)
    case XlsxParser.BCell(b) => b.toString
    case _ => s"_c$i"
  }

  /** Integral doubles print without ".0" (15 significant digits is
    * Excel's own display bound for exact integers). */
  private[source] def numToString(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** 1970-01-01 minus the serial-0 date of each Excel date system. */
  private[source] val Excel1900EpochOffsetDays = 25569L // serial 0 = 1899-12-30
  private[source] val Excel1904EpochOffsetDays = 24107L // serial 0 = 1904-01-01

  /** Convert a raw cell to the Catalyst internal value for `dt`;
    * `epochOffsetDays` selects the workbook's date system (1900 vs
    * 1904 — `XlsxParser.isDate1904`). */
  private[source] def convert(cell: XlsxParser.Cell, dt: DataType,
      epochOffsetDays: Long = Excel1900EpochOffsetDays): Any = cell match {
    case null => null
    case XlsxParser.SCell(s) => dt match {
      case StringType => UTF8String.fromString(s)
      case IntegerType => s.toIntOption.orNull
      case LongType => s.toLongOption.map(Long.box).orNull
      case DoubleType => s.toDoubleOption.map(Double.box).orNull
      case FloatType => s.toFloatOption.map(Float.box).orNull
      case d: DecimalType =>
        try org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(s).setScale(d.scale, java.math.RoundingMode.HALF_UP))
        catch { case _: NumberFormatException => null }
      case BooleanType => s.toBooleanOption.map(Boolean.box).orNull
      case DateType | TimestampType => null // strings are not date serials
      case _ => null
    }
    case XlsxParser.NCell(v) => dt match {
      case StringType => UTF8String.fromString(numToString(v))
      case IntegerType => Int.box(v.toInt)
      case LongType => Long.box(v.toLong)
      case DoubleType => Double.box(v)
      case FloatType => Float.box(v.toFloat)
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(
          java.math.BigDecimal.valueOf(v).setScale(d.scale, java.math.RoundingMode.HALF_UP))
      case BooleanType => Boolean.box(v != 0.0)
      case DateType => Int.box((v.toLong - epochOffsetDays).toInt)
      case TimestampType =>
        Long.box(math.round((v - epochOffsetDays) * 86400.0 * 1e6))
      case _ => null
    }
    case XlsxParser.BCell(b) => dt match {
      case BooleanType => Boolean.box(b)
      case StringType => UTF8String.fromString(b.toString)
      case _ => null
    }
  }
}

class XlsxTable(tableSchema: StructType, o: XlsxDataSource.Opts)
    extends Table with SupportsRead {
  override def name(): String = s"xlsx:${o.path}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tableSchema, o)
}

class XlsxScanBuilder(full: StructType, o: XlsxDataSource.Opts)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** BEST-EFFORT pushdown: predicates the row decoder can evaluate are
    * applied before a row is emitted (skipping the conversion +
    * materialization of non-matching rows), but every filter is ALSO
    * returned as residual so Catalyst re-applies it — correctness never
    * depends on the source's evaluation semantics (nulls, collations),
    * exactly the posture of the built-in file sources. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(XlsxFilterEval.supports(full, _))
    filters // all residual: Spark re-evaluates (see doc above)
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new XlsxScan(full, required, pushed, o)
}

class XlsxScan(full: StructType, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter], o: XlsxDataSource.Opts)
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    XlsxDataSource.expandFiles(o.path)
      .map(f => XlsxInputPartition(o.copy(path = f), full, required, pushed)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxPartitionReaderFactory
  override def description(): String =
    s"XlsxScan path=${o.path} sheet=${o.sheet.getOrElse("<first>")} " +
      s"columns=[${required.fieldNames.mkString(",")}] " +
      s"PushedFilters=[${pushed.mkString(", ")}]"
}

final case class XlsxInputPartition(o: XlsxDataSource.Opts,
    full: StructType, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter]) extends InputPartition

class XlsxPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val xp = p.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(xp.o, xp.full, xp.required, xp.pushed)
  }
}

class XlsxPartitionReader(o: XlsxDataSource.Opts, full: StructType,
    required: StructType, pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReader[InternalRow] {
  import XlsxParser._

  private val zip = new ZipFile(o.path)
  private val sheet = XlsxDataSource.resolveSheet(zip, o)
  // per-workbook date system: a 1904-mode workbook read as 1900-mode
  // would shift every date/timestamp by 1,462 days
  private val epochOffsetDays =
    if (XlsxParser.isDate1904(zip)) XlsxDataSource.Excel1904EpochOffsetDays
    else XlsxDataSource.Excel1900EpochOffsetDays
  private val rowIter = XlsxParser.rows(zip, sheet.entry, sharedStrings(zip))

  /** Sheet column index → position in `required` (pruned = absent).
    * Declared fields that resolve to NO header cell fail fast — a typo
    * or stray whitespace in a header would otherwise silently turn the
    * whole column to nulls (declared-schema posture: loud, not null). */
  private val colToOut: Map[Int, Int] = {
    val nameToOut = required.fieldNames.zipWithIndex.toMap
    if (o.header) {
      if (!rowIter.hasNext) Map.empty
      else {
        val headerCells = rowIter.next()
        val m = headerCells.flatMap { case (i, c) =>
          val name = c match {
            case SCell(s) => s
            case NCell(d) => XlsxDataSource.numToString(d)
            case BCell(b) => b.toString
            case _ => s"_c$i"
          }
          nameToOut.get(name).map(i -> _)
        }.toMap
        val missing = required.fieldNames.toSet --
          m.values.map(required.fieldNames(_)).toSet
        require(missing.isEmpty,
          s"declared columns not found in sheet header: ${missing.mkString(", ")}")
        m
      }
    } else {
      full.fieldNames.zipWithIndex
        .flatMap { case (n, i) => nameToOut.get(n).map(i -> _) }.toMap
    }
  }
  private val outTypes = required.fields.map(_.dataType)
  private val rowFilter = XlsxFilterEval.compile(pushed, required)
  private var current: InternalRow = null

  override def next(): Boolean = {
    while (rowIter.hasNext) {
      val cells = rowIter.next()
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(required.length)
      cells.foreach { case (i, c) =>
        colToOut.get(i).foreach { out =>
          row.update(out, XlsxDataSource.convert(c, outTypes(out), epochOffsetDays))
        }
      }
      // pushed-filter short-circuit: non-matching rows are dropped here,
      // before Spark ever materializes them (Catalyst re-checks — see
      // XlsxScanBuilder.pushFilters)
      if (rowFilter(row)) { current = row; return true }
    }
    current = null
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = zip.close()
}

/** Source-side evaluator for the pushed-down subset of
  * `org.apache.spark.sql.sources.Filter` — conjunctive top-level
  * filters over string/numeric/boolean columns. `supports` gates what
  * `pushFilters` accepts; `compile` builds a row predicate. Unknown or
  * null-valued comparisons evaluate to FALSE (SQL semantics for a
  * top-level predicate: a null comparison never satisfies the filter),
  * except IsNull/IsNotNull which test nullity directly. */
private[source] object XlsxFilterEval {
  import org.apache.spark.sql.sources._

  /** Types whose literals we can compare without timezone/collation
    * subtleties. */
  private def comparable(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | DoubleType | FloatType |
         BooleanType => true
    case _ => false
  }

  def supports(schema: StructType, f: Filter): Boolean = {
    def col(n: String): Boolean =
      schema.fields.exists(sf => sf.name == n && comparable(sf.dataType))
    f match {
      case EqualTo(n, _) => col(n)
      case GreaterThan(n, _) => col(n)
      case GreaterThanOrEqual(n, _) => col(n)
      case LessThan(n, _) => col(n)
      case LessThanOrEqual(n, _) => col(n)
      case In(n, _) => col(n)
      case IsNull(n) => schema.fieldNames.contains(n)
      case IsNotNull(n) => schema.fieldNames.contains(n)
      case StringStartsWith(n, _) => col(n)
      case StringEndsWith(n, _) => col(n)
      case StringContains(n, _) => col(n)
      case And(l, r) => supports(schema, l) && supports(schema, r)
      case _ => false
    }
  }

  /** Compare a Catalyst internal value against a filter literal; None
    * when either side is null or the pairing is incomparable. EXACT
    * comparisons only — rows dropped here never reach Spark's residual
    * re-check, so any approximation would silently lose rows:
    * strings compare in UTF8String binary (code-point) order, not Java
    * UTF-16 order; integral/integral compares as long (a double detour
    * would collapse values beyond 2^53); mixed integral/fractional
    * compares as double — exactly the promotion Catalyst itself applies
    * to a long-vs-double comparison, so semantics match Spark's. */
  private def cmp(v: Any, lit: Any): Option[Int] = (v, lit) match {
    case (null, _) | (_, null) => None
    case (u: UTF8String, s: String) => Some(u.compareTo(UTF8String.fromString(s)))
    case (b: java.lang.Boolean, l: Boolean) => Some(b.compareTo(l))
    case (n: java.lang.Number, l: java.lang.Number) =>
      def integral(x: java.lang.Number) =
        x.isInstanceOf[java.lang.Integer] || x.isInstanceOf[java.lang.Long] ||
          x.isInstanceOf[java.lang.Short] || x.isInstanceOf[java.lang.Byte]
      if (integral(n) && integral(l))
        Some(java.lang.Long.compare(n.longValue(), l.longValue()))
      else
        Some(java.lang.Double.compare(n.doubleValue(), l.doubleValue()))
    case _ => None
  }

  def compile(filters: Array[Filter], required: StructType): InternalRow => Boolean = {
    val idx = required.fieldNames.zipWithIndex.toMap
    // a filter whose column Spark pruned away cannot be evaluated here —
    // skip it (Catalyst re-checks every residual filter anyway; dropping
    // a row on a guess would be a correctness bug)
    val applicable = filters.filter(_.references.forall(idx.contains))
    if (applicable.isEmpty) return _ => true
    val types = required.fields.map(_.dataType)
    def value(row: InternalRow, n: String): Any = {
      val i = idx(n)
      if (row.isNullAt(i)) null else row.get(i, types(i))
    }
    def eval(f: Filter, row: InternalRow): Boolean = f match {
      case EqualTo(n, l) => cmp(value(row, n), l).contains(0)
      case GreaterThan(n, l) => cmp(value(row, n), l).exists(_ > 0)
      case GreaterThanOrEqual(n, l) => cmp(value(row, n), l).exists(_ >= 0)
      case LessThan(n, l) => cmp(value(row, n), l).exists(_ < 0)
      case LessThanOrEqual(n, l) => cmp(value(row, n), l).exists(_ <= 0)
      case In(n, vs) => vs.exists(l => cmp(value(row, n), l).contains(0))
      case IsNull(n) => row.isNullAt(idx(n))
      case IsNotNull(n) => !row.isNullAt(idx(n))
      case StringStartsWith(n, p) => value(row, n) match {
        case u: UTF8String => u.toString.startsWith(p); case _ => false
      }
      case StringEndsWith(n, p) => value(row, n) match {
        case u: UTF8String => u.toString.endsWith(p); case _ => false
      }
      case StringContains(n, p) => value(row, n) match {
        case u: UTF8String => u.toString.contains(p); case _ => false
      }
      case And(l, r) => eval(l, row) && eval(r, row)
      case _ => true // unsupported never reaches here (supports() gate)
    }
    row => applicable.forall(eval(_, row))
  }
}
