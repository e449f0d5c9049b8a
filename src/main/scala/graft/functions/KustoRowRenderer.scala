package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.collection.mutable

/** How timestamps render — CLI `-t/--timestamp {isostr|ticks|unixms}`,
  * default isostr (`/root/reference/pq2json/src/main.rs:60-73`,
  * `settings.rs:12-17`). */
sealed trait TimestampMode
object TimestampMode {
  case object IsoStr extends TimestampMode
  case object Ticks extends TimestampMode
  case object UnixMs extends TimestampMode
  def parse(s: String): TimestampMode = s match {
    case "isostr" => IsoStr
    case "ticks"  => Ticks
    case "unixms" => UnixMs
    case other    => throw new IllegalArgumentException(
      s"timestamp mode must be isostr|ticks|unixms, got '$other'")
  }
}

/** Render options — the reference's `Settings` minus I/O paths
  * (`/root/reference/pq2json/src/settings.rs:1-10`). `prune` = all three
  * omissions (`main.rs:41-51,137-140`). */
final case class KustoRenderOptions(
    omitNulls: Boolean = false,
    omitEmptyBags: Boolean = false,
    omitEmptyLists: Boolean = false,
    convertTypes: Boolean = false,
    timestampMode: TimestampMode = TimestampMode.IsoStr,
    // dotted paths of parquet UINT64 columns (from the file FOOTER —
    // ParquetMetadata.unsignedInt64Paths): Spark surfaces u64 as
    // Decimal(20,0), schema-indistinguishable from a true decimal, but
    // the reference renders raw u64 as a bare unsigned JSON NUMBER
    // (`converter.rs:296-302`). Empty when no footer is available (the
    // engine-API path), which keeps the decimal-string rendering.
    unsignedPaths: Set[String] = Set.empty) {
  def pruned: KustoRenderOptions =
    copy(omitNulls = true, omitEmptyBags = true, omitEmptyLists = true)
}

/** Converts a Spark `InternalRow` of any schema into a [[KValue]] tree with
  * the reference's exact rendering semantics
  * (`/root/reference/pq2json/src/converter.rs:95-303`):
  *
  *   - float/double: NaN/±Inf -> null (`:291-295`)
  *   - decimal: plain non-scientific string, scale-padded (`:345-371` —
  *     `BigDecimal.toPlainString` is the same algorithm)
  *   - binary: JSON array of unsigned byte numbers (`:283-289`)
  *   - date: "yyyy-MM-dd"; negative days (u32 reinterpret overflow) -> null
  *     (`:334-343`)
  *   - timestamp: micros truncated to millis (`:117-120`), then
  *     ticks (overflow->null, `:307-316`) / 6-fraction-digit ISO UTC
  *     (`:318-328`) / raw unix millis (`:330`)
  *   - struct: JSON object, omit-nulls / empty-bag->null (`:214-230`)
  *   - array: JSON array, empty-list->null (`:232-245`)
  *   - map: JSON object with stringified primitive keys (`:247-281`);
  *     non-primitive keys rejected at plan time instead of the reference's
  *     runtime panic (`:266`)
  *
  * The per-field closures are bound once per schema (driver side), so the
  * per-row hot loop does no type dispatch — analogous to how the reference
  * pays `element_to_value!` dispatch per value but we hoist it.
  */
final class KustoRowRenderer(schema: StructType, opts: KustoRenderOptions,
    pathPrefix: String = "") extends Serializable {

  import KustoRowRenderer._

  private type FieldRender = (org.apache.spark.sql.catalyst.expressions.SpecializedGetters, Int) => KValue

  private val fieldNames: Array[String] = schema.fields.map(_.name)
  private val fieldRenders: Array[FieldRender] =
    schema.fields.map(f => renderOf(f.dataType, pathPrefix + f.name))
  /** Field indices in sorted-name order, precomputed once per schema so
    * per-row object building inserts keys already sorted (see [[KObj]]).
    * Sorted by UTF-8 bytes, not UTF-16 code units: serde_json's BTreeMap
    * compares the keys' UTF-8 bytes, and the two orders differ when
    * supplementary-plane keys mix with U+E000..U+FFFF keys. */
  private val sortedFieldOrder: Array[Int] =
    fieldNames.indices.sortBy(i => fieldNames(i))(Utf8Ordering).toArray

  /** Render one top-level field of a row (null-safe); used by the CSV line
    * encoder to emit fields positionally without re-wrapping rows. */
  def renderField(row: InternalRow, i: Int): KValue =
    if (row.isNullAt(i)) KNull else fieldRenders(i)(row, i)

  /** Top level: null/pruned-empty row renders as `{}` (`converter.rs:135-139`). */
  def renderTopLevel(row: InternalRow): KValue = {
    val v = renderStruct(row)
    if (v.isNull) KObj(mutable.LinkedHashMap.empty) else v
  }

  def renderStruct(row: InternalRow): KValue = {
    val m = mutable.LinkedHashMap.empty[String, KValue]
    var j = 0
    while (j < sortedFieldOrder.length) {
      val i = sortedFieldOrder(j)
      val v = if (row.isNullAt(i)) KNull else fieldRenders(i)(row, i)
      if (!(opts.omitNulls && v.isNull)) m.put(fieldNames(i), v)
      j += 1
    }
    if (opts.omitEmptyBags && m.isEmpty) KNull else KObj(m)
  }

  private def renderOf(dt: DataType, path: String): FieldRender = dt match {
    case NullType => (_, _) => KNull
    case BooleanType => (g, i) => KBool(g.getBoolean(i))
    case ByteType => (g, i) => KNum(g.getByte(i).toString)
    case ShortType => (g, i) => KNum(g.getShort(i).toString)
    case IntegerType => (g, i) => KNum(g.getInt(i).toString)
    case LongType => (g, i) => KNum(g.getLong(i).toString)
    case FloatType => (g, i) => doubleValue(g.getFloat(i).toDouble)
    case DoubleType => (g, i) => doubleValue(g.getDouble(i))
    case d: DecimalType if opts.convertTypes && d.precision == 20 && d.scale == 0 =>
      // Spark surfaces parquet UINT64 as Decimal(20,0); under
      // --convert-types the reference reinterprets u64 as i64
      // (`converter.rs:297-303`) and renders a NUMBER. BigInteger.longValue
      // is exactly the two's-complement wrap.
      (g, i) => KNum(g.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.toBigInteger.longValue().toString)
    case d: DecimalType if d.precision == 20 && d.scale == 0 &&
        opts.unsignedPaths.contains(path) =>
      // raw u64 WITHOUT --convert-types: the reference renders the
      // UNSIGNED value as a bare JSON number (`converter.rs:296-302`,
      // `l.into()` — full u64 range). The footer (unsignedPaths) is what
      // distinguishes this column from a true DECIMAL(20,0), which Spark's
      // schema alone cannot.
      (g, i) => KNum(g.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.toBigInteger.toString)
    case d: DecimalType =>
      (g, i) => KStr(g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString)
    case StringType => (g, i) => KStr(g.getUTF8String(i).toString)
    case BinaryType => (g, i) => bytesValue(g.getBinary(i))
    case DateType => (g, i) => dateValue(g.getInt(i))
    case TimestampType | TimestampNTZType =>
      val mode = opts.timestampMode
      (g, i) => timestampValue(g.getLong(i), mode)
    case st: StructType =>
      val nested = new KustoRowRenderer(st, opts, path + ".")
      (g, i) => nested.renderStruct(g.getStruct(i, st.size))
    case ArrayType(et, _) =>
      // list/map element paths never enter unsignedPaths (repeated
      // parquet groups are excluded there), so the element path is moot
      val elem = renderOf(et, path + ".element")
      (g, i) => {
        val arr = g.getArray(i)
        val out = new mutable.ArrayBuffer[KValue](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out += (if (arr.isNullAt(j)) KNull else elem(arr, j))
          j += 1
        }
        if (opts.omitEmptyLists && out.isEmpty) KNull else KArr(out)
      }
    case MapType(kt, vt, _) =>
      val keyRender = mapKeyRenderOf(kt)
      val valRender = renderOf(vt, path + ".value")
      (g, i) => mapValue(g.getMap(i), keyRender, valRender)
    case other =>
      throw new IllegalArgumentException(s"Kusto render: unsupported type $other")
  }

  private def mapValue(map: MapData, keyOf: (ArrayData, Int) => String,
      valOf: FieldRender): KValue = {
    val keys = map.keyArray()
    val vals = map.valueArray()
    val n = map.numElements()
    // dynamic keys: sort per value (BTreeMap semantics = UTF-8 byte order);
    // dedup keeps the LAST occurrence like repeated BTreeMap inserts.
    val order = Array.tabulate(n)(identity).sortBy(j => keyOf(keys, j))(Utf8Ordering)
    val m = mutable.LinkedHashMap.empty[String, KValue]
    var x = 0
    while (x < n) {
      val j = order(x)
      val k = keyOf(keys, j)
      val v = if (vals.isNullAt(j)) KNull else valOf(vals, j)
      if (!(opts.omitNulls && v.isNull)) m.put(k, v)
      x += 1
    }
    if (opts.omitEmptyBags && m.isEmpty) KNull else KObj(m)
  }

  private def timestampValue(us: Long, mode: TimestampMode): KValue = mode match {
    case TimestampMode.Ticks =>
      // Reference does u64 checked math (`converter.rs:309-316`); negative
      // millis reinterpret to huge u64 and overflow -> null either way.
      val ms = micros2millis(us)
      if (ms < 0 || ms > (Long.MaxValue - TicksTillUnixTime) / 10000) KNull
      else KNum((ms * 10000 + TicksTillUnixTime).toString)
    case TimestampMode.UnixMs =>
      // u64 passthrough (`converter.rs:330`): the reference reinterprets the
      // RAW micros as u64 and THEN divides, so pre-epoch values must use
      // unsigned division of the micros, not floorDiv-then-reinterpret
      // (us = -1e6 -> 18446744073708551, not 18446744073709550616).
      KNum(java.lang.Long.toUnsignedString(java.lang.Long.divideUnsigned(us, 1000L)))
    case TimestampMode.IsoStr =>
      val ms = micros2millis(us)
      if (ms < 0) KNull // u64 seconds out of chrono range -> null (`:322-325`)
      else KStr(IsoFmt.format(java.time.Instant.ofEpochMilli(ms)))
  }
}

object KustoRowRenderer {
  /** 100ns ticks from 0001-01-01 to 1970-01-01 (`converter.rs:305`). */
  val TicksTillUnixTime: Long = 621355968000000000L

  // Locale.ROOT pins ASCII digits regardless of the JVM default locale.
  private val IsoFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'", java.util.Locale.ROOT)
    .withZone(java.time.ZoneOffset.UTC)

  /** serde_json BTreeMap key order = UTF-8 byte order. UTF8String.compareTo
    * compares the underlying UTF-8 bytes unsigned-lexicographically, which
    * differs from String's UTF-16 order for supplementary-plane text. */
  val Utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }

  /** Micros -> millis truncation (`converter.rs:117-120`; Rust `/` on u64). */
  def micros2millis(us: Long): Long = Math.floorDiv(us, 1000L)

  def doubleValue(d: Double): KValue =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) KNull
    else KDouble(d)

  def bytesValue(bytes: Array[Byte]): KValue = {
    val out = new mutable.ArrayBuffer[KValue](bytes.length)
    var i = 0
    while (i < bytes.length) { out += KNum((bytes(i) & 0xff).toString); i += 1 }
    KArr(out)
  }

  def dateValue(days: Int): KValue =
    if (days < 0) KNull // reference reads u32; i32 negatives overflow chrono
    else KStr(LocalDate.ofEpochDay(days.toLong).format(DateTimeFormatter.ISO_LOCAL_DATE))

  /** Map keys stringify from primitives only (`converter.rs:253-267`). */
  def mapKeyRenderOf(kt: DataType): (ArrayData, Int) => String = kt match {
    case BooleanType => (a, i) => if (a.getBoolean(i)) "true" else "false"
    case ByteType    => (a, i) => a.getByte(i).toString
    case ShortType   => (a, i) => a.getShort(i).toString
    case IntegerType => (a, i) => a.getInt(i).toString
    case LongType    => (a, i) => a.getLong(i).toString
    case StringType  => (a, i) => a.getUTF8String(i).toString
    case other => throw new IllegalArgumentException(
      s"Kusto render: unsupported map key type $other (reference panics too, converter.rs:266)")
  }

  /** CSV quoting of the Rust `csv` crate with `Terminator::Any(b'\r')`
    * (`converter.rs:152-154`): quote only when the field contains a quote,
    * the delimiter, or the terminator byte; embedded quotes double. Note
    * '\n' does NOT trigger quoting under this terminator — reproduced. */
  def csvQuote(field: String): String = {
    var needs = false
    var i = 0
    while (i < field.length && !needs) {
      val c = field.charAt(i)
      needs = c == '"' || c == ',' || c == '\r'
      i += 1
    }
    if (!needs) field
    else "\"" + field.replace("\"", "\"\"") + "\""
  }

  def toUtf8(s: String): UTF8String = UTF8String.fromString(s)
}
