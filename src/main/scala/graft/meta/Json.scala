package graft.meta

/** Minimal JSON AST + renderer/parser for metadata documents (STAC, attrs).
  * Zero-dependency by design — the build resolves nothing beyond Spark.
  */
sealed trait JValue {
  def render: String = this match {
    case JNull => "null"
    case JBool(b) => b.toString
    case JNum(n) =>
      if (n == math.rint(n) && !n.isInfinite && math.abs(n) < 1e15) n.toLong.toString
      else n.toString
    case JStr(s) => JValue.quote(s)
    case JArr(items) => items.map(_.render).mkString("[", ",", "]")
    case JObj(fields) =>
      fields.map { case (k, v) => s"${JValue.quote(k)}:${v.render}" }
        .mkString("{", ",", "}")
  }
}
case object JNull extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JNum(n: Double) extends JValue
final case class JStr(s: String) extends JValue
final case class JArr(items: Seq[JValue]) extends JValue
final case class JObj(fields: Seq[(String, JValue)]) extends JValue {
  def get(key: String): Option[JValue] = fields.collectFirst { case (`key`, v) => v }
  def updated(key: String, v: JValue): JObj =
    if (fields.exists(_._1 == key))
      JObj(fields.map { case (k, old) => (k, if (k == key) v else old) })
    else JObj(fields :+ (key -> v))
}

object JValue {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Recursive-descent parser (strict enough for our own documents). */
  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"Trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"Expected '$c' at $pos")
      pos += 1
    }
    def value(): JValue = {
      skipWs()
      require(!eof, "Unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => num()
      }
    }
    private def lit(text: String, v: JValue): JValue = {
      require(s.startsWith(text, pos), s"Bad literal at $pos")
      pos += text.length; v
    }
    private def obj(): JObj = {
      expect('{'); skipWs()
      if (s.charAt(pos) == '}') { pos += 1; return JObj(Seq.empty) }
      val buf = Seq.newBuilder[(String, JValue)]
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        expect(':')
        buf += (k -> value())
        skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(buf.result())
    }
    private def arr(): JArr = {
      expect('['); skipWs()
      if (s.charAt(pos) == ']') { pos += 1; return JArr(Seq.empty) }
      val buf = Seq.newBuilder[JValue]
      var done = false
      while (!done) {
        buf += value()
        skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(buf.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          s.charAt(pos + 1) match {
            case '"' => sb += '"'; pos += 2
            case '\\' => sb += '\\'; pos += 2
            case '/' => sb += '/'; pos += 2
            case 'n' => sb += '\n'; pos += 2
            case 'r' => sb += '\r'; pos += 2
            case 't' => sb += '\t'; pos += 2
            case 'b' => sb += '\b'; pos += 2
            case 'f' => sb += '\f'; pos += 2
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 2, pos + 6), 16).toChar
              pos += 6
            case other => throw new IllegalArgumentException(s"Bad escape \\$other")
          }
        } else { sb += c; pos += 1 }
      }
      pos += 1
      sb.toString
    }
    private def num(): JNum = {
      val start = pos
      while (!eof && "+-.eE0123456789".indexOf(s.charAt(pos)) >= 0) pos += 1
      JNum(s.substring(start, pos).toDouble)
    }
  }
}
