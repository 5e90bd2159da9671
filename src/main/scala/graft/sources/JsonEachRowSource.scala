package graft.sources

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for `JSONEachRow` directories — the reference's
  * ingest wire format (/root/reference/src/1-naive.test.ts:68,
  * `format: "JSONEachRow"`) surfaced as a first-class Spark table:
  *
  *   spark.read.format("jsoneachrow").schema(s).load(dir)
  *
  * Built on the V2 read contract, with the optimizations that matter at
  * 100 TB implemented for real, not just declared:
  *
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): only the
  *    pruned fields are extracted from each parsed line — a 2-column query
  *    over a 40-field log materializes 2 values per row;
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): equality/range/
  *    null-test predicates on top-level fields are evaluated inside the
  *    reader BEFORE any row is materialized into the engine, and appear in
  *    the scan description (`PushedFilters: …`) for plan asserts, same as
  *    the parquet source;
  *  - **statistics** ([[SupportsReportStatistics]]): on-disk byte size is
  *    reported at plan time, so joins against small connector tables get
  *    broadcast (without it DSv2 defaults to Long.Max and NOTHING ever
  *    broadcasts) and CBO sees real sizes;
  *  - **limit pushdown** ([[SupportsPushDownLimit]]): a bare LIMIT stops
  *    each partition reader after N rows instead of draining the file —
  *    partial pushdown, Spark's global Limit still applies.
  *
  * Explicit schema is REQUIRED (the no-inference contract every graft
  * ingest edge shares — inference would be a second pass over the data).
  * One input partition per file; a production deployment would split large
  * files by byte range exactly as the parquet reader does.
  *
  * Scope: a READ connector (the write side of this format is
  * [[Ingest.jsonLines]] + a line sink). Supported field types: the ones
  * the reference's wire format uses — string, boolean, all integral/
  * floating numerics, and second-precision timestamps as ISO-8601 strings.
  */
class JsonEachRowSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "jsoneachrow"

  // schema must be user-supplied; fail loudly rather than infer
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "jsoneachrow requires an explicit .schema(...) — inference is not supported")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new JsonEachRowTable(schema, properties.get("path"))
}

private[sources] class JsonEachRowTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  require(path != null, "jsoneachrow requires a path")
  override def name(): String = s"jsoneachrow:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonEachRowScanBuilder(tableSchema, path)
}

private[graft] class JsonEachRowScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown: each partition reader stops after emitting `limit`
    * rows instead of draining its file. Reported as PARTIALLY pushed
    * (`isPartiallyPushed` default true), so Spark keeps its own global
    * Limit — the reader-side cut is purely an early-stop optimization and
    * can never change results, exactly like the filter contract above. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** Accept the filter shapes the row-level evaluator understands, and
    * return EVERY filter as a post-scan filter: the V2 contract applies
    * only the returned filters after the scan, so a reader that kept an
    * accepted filter to itself would be trusted blindly — a semantic
    * mismatch would silently corrupt results. Returning them all makes the
    * reader-side evaluation purely an early-skip optimization: a row the
    * reader keeps too eagerly dies in Spark's re-check, and the reader's
    * own comparisons (UTF8-binary for strings, integral-only numerics)
    * match Spark's, so it never drops a row Spark would keep. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(JsonEachRowScan.evaluable(fullSchema, _))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new JsonEachRowScan(fullSchema, required, pushed, path, limit,
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
}

private[sources] class JsonEachRowScan(fullSchema: StructType, required: StructType,
                                       filters: Array[Filter], path: String,
                                       limit: Int, sessionTz: String)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"JsonEachRowScan PushedFilters: [${filters.mkString(", ")}], " +
    (if (limit >= 0) s"PushedLimit: $limit, " else "") +
    s"ReadSchema: ${required.catalogString}"

  private def listFiles(): Array[java.io.File] = {
    val dir = new java.io.File(path)
    if (dir.isFile) Array(dir)
    else Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
  }

  /** On-disk byte size as the plan-time size estimate — the same signal the
    * file sources feed the optimizer. Without it, a DSv2 relation defaults
    * to `spark.sql.defaultSizeInBytes` (= Long.Max), so a join against even
    * a tiny connector table would never broadcast and CBO would treat every
    * connector read as unbounded. JSON text is a conservative OVERestimate
    * of the pruned row width (UTF-8 + field names + punctuation vs binary
    * columns), so a broadcast decision made on it is safe: the in-memory
    * build side is smaller than what the threshold approved. Row count is
    * left unset — lines are unknown without a scan; CBO treats it as
    * absent rather than guessing. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = listFiles().map(_.length()).sum
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    listFiles().sortBy(_.getName).map(f => JsonFilePartition(f.getAbsolutePath): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonEachRowReaderFactory(fullSchema, required, filters, limit, sessionTz)
}

private[sources] case class JsonFilePartition(file: String) extends InputPartition

private[sources] object JsonEachRowScan {
  /** Filter shapes the reader evaluates: (not-)null tests and =, <, <=, >,
    * >= against literals on top-level fields of supported types. */
  def evaluable(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _)            => simpleField(schema, a)
    case GreaterThan(a, _)        => simpleField(schema, a)
    case GreaterThanOrEqual(a, _) => simpleField(schema, a)
    case LessThan(a, _)           => simpleField(schema, a)
    case LessThanOrEqual(a, _)    => simpleField(schema, a)
    case IsNull(a)                => simpleField(schema, a)
    case IsNotNull(a)             => simpleField(schema, a)
    case And(l, r)                => evaluable(schema, l) && evaluable(schema, r)
    case _                        => false
  }

  private def simpleField(schema: StructType, name: String): Boolean =
    !name.contains(".") && schema.fields.exists(f =>
      f.name == name && (f.dataType match {
        case _: StringType | _: BooleanType | _: LongType | _: IntegerType |
             _: ShortType | _: ByteType | _: DoubleType | _: FloatType => true
        case _ => false
      }))
}

private[sources] class JsonEachRowReaderFactory(fullSchema: StructType,
                                                required: StructType,
                                                filters: Array[Filter],
                                                limit: Int, sessionTz: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonEachRowReader(p.asInstanceOf[JsonFilePartition].file,
                          fullSchema, required, filters, limit, sessionTz)
}

private[sources] class JsonEachRowReader(file: String, fullSchema: StructType,
                                         required: StructType, filters: Array[Filter],
                                         limit: Int, sessionTz: String)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  // REPLACE on malformed bytes: one bad byte must degrade to U+FFFD in that
  // line (Jackson then fails just that record, which is skipped below) —
  // never a MalformedInputException that kills the whole partition. Same
  // resilience contract as the built-in JSON reader's PERMISSIVE mode.
  private val decoder = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
    .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(new java.io.FileInputStream(file), decoder))
  private val it = Iterator.continually(reader.readLine()).takeWhile(_ != null)
  private val zone = java.time.ZoneId.of(sessionTz)
  private var emitted = 0L
  private var current: InternalRow = _

  // resolved once per reader: no per-row schema scans, no per-row literal
  // conversion (string literals pre-encoded to UTF8String for binary cmp)
  private val fieldType: Map[String, DataType] =
    fullSchema.fields.map(f => f.name -> f.dataType).toMap
  private val filterLit: Map[String, UTF8String] = {
    def lits(f: Filter): Seq[(String, UTF8String)] = f match {
      case EqualTo(_, v: String)            => Seq(v -> UTF8String.fromString(v))
      case GreaterThan(_, v: String)        => Seq(v -> UTF8String.fromString(v))
      case GreaterThanOrEqual(_, v: String) => Seq(v -> UTF8String.fromString(v))
      case LessThan(_, v: String)           => Seq(v -> UTF8String.fromString(v))
      case LessThanOrEqual(_, v: String)    => Seq(v -> UTF8String.fromString(v))
      case And(l, r)                        => lits(l) ++ lits(r)
      case _                                => Seq.empty
    }
    filters.flatMap(lits).toMap
  }

  private def extract(node: JsonNode, name: String, dt: DataType): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) return null
    dt match {
      case StringType  => UTF8String.fromString(if (v.isTextual) v.asText else v.toString)
      case BooleanType => if (v.isBoolean) java.lang.Boolean.valueOf(v.asBoolean) else null
      // integral targets demand integral JSON tokens: 3.7 must become null
      // (the built-in reader's malformed-field behaviour), never truncate —
      // a truncated value would also poison reader-side filter evaluation
      case LongType    => if (v.isIntegralNumber && v.canConvertToLong) java.lang.Long.valueOf(v.asLong) else null
      case IntegerType => if (v.isIntegralNumber && v.canConvertToInt) java.lang.Integer.valueOf(v.asInt) else null
      case ShortType   => if (v.isIntegralNumber && v.canConvertToInt) java.lang.Short.valueOf(v.asInt.toShort) else null
      case ByteType    => if (v.isIntegralNumber && v.canConvertToInt) java.lang.Byte.valueOf(v.asInt.toByte) else null
      case DoubleType  => if (v.isNumber) java.lang.Double.valueOf(v.asDouble) else null
      case FloatType   => if (v.isNumber) java.lang.Float.valueOf(v.asDouble.toFloat) else null
      case TimestampType =>
        // ISO-8601 (the wire format's best_effort contract); micros.
        // Offset-less values resolve in the SESSION timezone — the built-in
        // JSON reader's behaviour — not to null.
        if (!v.isTextual) null
        else try {
          val inst = try java.time.OffsetDateTime.parse(v.asText).toInstant
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDateTime.parse(v.asText).atZone(zone).toInstant
          }
          java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
        } catch { case _: java.time.format.DateTimeParseException => null }
      case _ => null
    }
  }

  // An integral field against a FRACTIONAL literal must compare exactly —
  // longValue truncation would turn `x > -3.5` into `x > -3` and reader-drop
  // -3, violating the never-drop invariant. BigDecimal via the literal's
  // digit string is exact for every (long, double) pair; the lane is cold
  // (Spark unwraps casts before pushdown, so fractional literals against
  // integral fields are rare-to-unreachable).
  private def cmpLongExact(x: Long, y: Number): Int = y match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => java.lang.Long.compare(x, y.longValue)
    case _ =>
      java.math.BigDecimal.valueOf(x).compareTo(new java.math.BigDecimal(y.toString))
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: java.lang.Long, y: Number)    => Some(cmpLongExact(x, y))
    case (x: java.lang.Integer, y: Number) => Some(cmpLongExact(x.longValue, y))
    case (x: java.lang.Short, y: Number)   => Some(cmpLongExact(x.longValue, y))
    case (x: java.lang.Byte, y: Number)    => Some(cmpLongExact(x.longValue, y))
    case (x: java.lang.Double, y: Number)  => Some(java.lang.Double.compare(x, y.doubleValue))
    case (x: java.lang.Float, y: Number)   => Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
    // UTF8String.compareTo is UTF-8 BINARY order — Spark's string order;
    // java String.compareTo (UTF-16 units) diverges beyond the BMP and
    // would drop rows Spark keeps
    case (x: UTF8String, y: String) =>
      Some(x.compareTo(filterLit.getOrElse(y, UTF8String.fromString(y))))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  private def eval(node: JsonNode, f: Filter): Boolean = f match {
    case EqualTo(a, v)            => cmp(raw(node, a), v).contains(0)
    case GreaterThan(a, v)        => cmp(raw(node, a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(raw(node, a), v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(raw(node, a), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(raw(node, a), v).exists(_ <= 0)
    case IsNull(a)                => raw(node, a) == null
    case IsNotNull(a)             => raw(node, a) != null
    case And(l, r)                => eval(node, l) && eval(node, r)
    case _                        => true
  }

  private def raw(node: JsonNode, name: String): Any =
    fieldType.get(name).map(dt => extract(node, name, dt)).orNull

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false // pushed per-partition limit
    while (it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val node = try mapper.readTree(line) catch { case _: Exception => null }
        if (node != null && filters.forall(eval(node, _))) {
          current = InternalRow.fromSeq(
            required.fields.toSeq.map(f => extract(node, f.name, f.dataType)))
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
