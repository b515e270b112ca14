package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** F14: JSON pretty-print matching the reference's
  * `json.dumps(parsed, indent=2, ensure_ascii=False)`
  * (export_chromadb_to_text.py:156-162): 2-space indent, `"key": value`
  * separators, trailing-comma-free, object key order preserved, non-ASCII
  * passed through raw. Invalid JSON → null (the reference's fallback is to
  * write the raw text instead).
  *
  * Jackson — already on Spark's classpath — does the parsing; rendering is
  * a small recursive walk so the output style is pinned here, not by a
  * library's printer defaults.
  */
object JsonPretty {

  private def escape(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c) // ensure_ascii=False: non-ASCII raw
    }
    sb.append('"')
  }

  private def render(n: JsonNode, depth: Int, sb: StringBuilder): Unit = {
    val pad = "  " * (depth + 1)
    val close = "  " * depth
    if (n.isObject) {
      if (!n.fields().hasNext) { sb.append("{}"); return }
      sb.append("{\n")
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(",\n")
        first = false
        sb.append(pad); escape(e.getKey, sb); sb.append(": ")
        render(e.getValue, depth + 1, sb)
      }
      sb.append('\n').append(close).append('}')
    } else if (n.isArray) {
      if (n.size() == 0) { sb.append("[]"); return }
      sb.append("[\n")
      (0 until n.size()).foreach { i =>
        if (i > 0) sb.append(",\n")
        sb.append(pad); render(n.get(i), depth + 1, sb)
      }
      sb.append('\n').append(close).append(']')
    } else if (n.isTextual) escape(n.asText(), sb)
    else if (n.isNull) sb.append("null")
    else sb.append(n.toString) // numbers, booleans
  }

  private[graft] def pretty(json: String): String =
    if (json == null) null
    else try {
      val node = new ObjectMapper().readTree(json)
      // bare scalars parse but aren't the reference's use case; still render
      val sb = new StringBuilder
      render(node, 0, sb)
      sb.toString
    } catch { case _: Exception => null }

  private val prettyUdf = udf(pretty _)

  /** JSON string column → pretty-printed (or null when unparseable). */
  def jsonPretty(c: Column): Column = prettyUdf(c)
}
