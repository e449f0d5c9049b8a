package graft.functions

import scala.collection.mutable

/** In-flight JSON value model for the Kusto render pipeline — the Scala
  * counterpart of the `serde_json::Value` tree the reference builds per row
  * (`/root/reference/pq2json/src/converter.rs:214-303`). One tree per row is
  * built inside the render expressions, serialized, and discarded; memory
  * stays O(row) exactly like the reference's streaming loop
  * (`converter.rs:128-143`).
  */
sealed trait KValue { def isNull: Boolean = this eq KNull }
case object KNull extends KValue
final case class KBool(v: Boolean) extends KValue
/** A number rendered from an integral source; text held verbatim so u64
  * reinterpretation (`converter.rs:297-303`) and tick arithmetic keep their
  * exact decimal form. */
final case class KNum(text: String) extends KValue
/** A finite double; serialized via [[Ryu]] (JSON keeps ".0", CSV strips). */
final case class KDouble(v: Double) extends KValue
final case class KStr(v: String) extends KValue
final case class KArr(v: mutable.ArrayBuffer[KValue]) extends KValue
/** Object with keys ALREADY in sorted order. The reference's serde_json
  * uses a BTreeMap (no `preserve_order` feature in its Cargo.lock), so keys
  * serialize sorted; producers here insert in sorted order up front —
  * structs via a schema-bound precomputed field order, maps by sorting the
  * (dynamic) keys — and the serializer emits insertion order verbatim. */
final case class KObj(v: mutable.LinkedHashMap[String, KValue]) extends KValue

object KValue {

  /** serde_json-compatible string escaping: `"`, `\`, and control chars
    * (<0x20) — `\b \t \n \f \r` shorthands, `\u00xx` for the rest; nothing
    * else is escaped (non-ASCII passes through as UTF-8). */
  def escapeInto(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Serialize as compact JSON (serde_json `to_string` form: no spaces,
    * object keys in sorted order — see [[KObj]] doc). */
  def writeJson(sb: java.lang.StringBuilder, v: KValue): Unit = v match {
    case KNull       => sb.append("null")
    case KBool(b)    => sb.append(if (b) "true" else "false")
    case KNum(t)     => sb.append(t)
    case KDouble(d)  => sb.append(Ryu.shortest(d))
    case KStr(s)     => escapeInto(sb, s)
    case KArr(xs) =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(',')
        first = false
        writeJson(sb, x)
      }
      sb.append(']')
    case KObj(m) =>
      sb.append('{')
      var first = true
      m.foreach { case (k, v) => // insertion order IS sorted order (see KObj)
        if (!first) sb.append(',')
        first = false
        escapeInto(sb, k)
        sb.append(':')
        writeJson(sb, v)
      }
      sb.append('}')
  }

  def toJson(v: KValue): String = {
    val sb = new java.lang.StringBuilder(64)
    writeJson(sb, v)
    sb.toString
  }

  /** One CSV field, mirroring `value_to_csv` (`converter.rs:190-208`):
    * null -> empty, bool -> true/false, integral -> decimal text, float ->
    * ryu with trailing-zero strip, string -> raw (quoting applied by the
    * line writer), nested -> embedded JSON text. */
  def toCsvField(v: KValue): String = v match {
    case KNull      => ""
    case KBool(b)   => if (b) "true" else "false"
    case KNum(t)    => t
    case KDouble(d) => Ryu.shortestCsv(d)
    case KStr(s)    => s
    case other      => toJson(other)
  }
}
