package graft.streaming

/** RFC 8259-complete JSON string escaping, shared by every
  * hand-rendered JSON surface (health body, webhook payload): the
  * strings these embed are EXCEPTION MESSAGES and wire-derived trace
  * ids — multi-line JDBC errors are routine, and an unescaped control
  * character makes the whole body unparseable by strict consumers
  * (k8s probes, monitoring agents) exactly when they most need to
  * read it. */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
