package graft.types

import MySqlType._

/** Parser for MySQL column-type text (`int unsigned`, `varchar(255)`,
  * `enum('a','b')`, `numeric(10,2)`, ...), the strings that appear in
  * `SHOW CREATE TABLE` / information_schema.
  *
  * Mirrors the behavior of the reference's string-matching switch
  * (converter.py:384-533) and its hand-rolled quote-aware enum parser
  * (enum/parser.py:1-183): enum/set values may contain commas, quotes
  * escaped as `''` or `\'`, and are matched case-insensitively
  * (values are lowercased, enum/converter.py:11-27).
  */
object TypeParser {

  final case class Parsed(tpe: MySqlType, sourceText: String)

  /** User overrides, e.g. Map("char(36)" -> MUuid) — checked before the
    * built-in switch, like the reference's `types_mapping` config
    * (converter.py:387-389). */
  def parse(typeText: String,
            overrides: Map[String, MySqlType] = Map.empty): Parsed = {
    val txt = typeText.trim
    val norm = txt.toLowerCase
    overrides.get(norm) match {
      case Some(t) => return Parsed(t, txt)
      case None => ()
    }
    Parsed(parseBuiltin(norm), txt)
  }

  private val WithParams = """^([a-z ]+?)\s*\(([^)]*)\)\s*(unsigned)?\s*(zerofill)?$""".r
  private val Plain = """^([a-z ]+?)\s*(unsigned)?\s*(zerofill)?$""".r

  private def parseBuiltin(norm: String): MySqlType = {
    // enum/set need the quote-aware splitter, not the regex (values may
    // contain parens/commas).
    if (norm.startsWith("enum(")) return MEnum(parseQuotedList(inner(norm, 4)))
    if (norm.startsWith("set(")) return MSet(parseQuotedList(inner(norm, 3)))
    norm match {
      // ZEROFILL implies UNSIGNED in MySQL — a zerofill int column holds
      // values up to the unsigned max, so dropping the flag would map it
      // to a too-narrow Spark type and overflow silently
      case WithParams(base, params, unsigned, zerofill) =>
        withParams(base.trim, params.split(",").map(_.trim).toSeq,
          unsigned != null || zerofill != null)
      case Plain(base, unsigned, zerofill) =>
        plain(base.trim, unsigned != null || zerofill != null)
      case other => throw new IllegalArgumentException(s"unparseable MySQL type: '$other'")
    }
  }

  private def inner(s: String, prefixLen: Int): String = {
    require(s.endsWith(")"), s"unterminated type: $s")
    s.substring(prefixLen + 1, s.length - 1)
  }

  private def intBytes(base: String): Option[Int] = base match {
    case "tinyint" => Some(1)
    case "smallint" => Some(2)
    case "mediumint" => Some(3)
    case "int" | "integer" => Some(4)
    case "bigint" => Some(8)
    case _ => None
  }

  private def withParams(base: String, params: Seq[String],
                         unsigned: Boolean): MySqlType = base match {
    case "tinyint" if params.headOption.contains("1") && !unsigned => MBool
    case b if intBytes(b).isDefined => MInt(intBytes(b).get, unsigned)
    case "bit" => MBit(params.head.toInt)
    case "decimal" | "numeric" | "fixed" | "dec" =>
      val p = params.head.toInt
      val s = if (params.length > 1) params(1).toInt else 0
      MDecimal(p, s)
    case "float" => MFloat // float(m,d) stays Float32, converter.py:450
    case "double" | "double precision" | "real" => MDouble
    case "datetime" => MDateTime(params.head.toInt)
    case "timestamp" => MTimestamp(params.head.toInt)
    case "time" => MTime
    case "year" => MYear
    case "char" | "character" | "varchar" | "character varying" |
         "national char" | "national character" | "national varchar" |
         "national character varying" | "national char varying" |
         "nchar" | "nvarchar" => MString(None)
    // binary(n) is NUL-padded to n; varbinary/blob are not
    case "binary" => MBinary(Some(params.head.toInt))
    case "varbinary" => MBinary(None)
    case "blob" | "tinyblob" | "mediumblob" | "longblob" => MBinary(None)
    case "text" | "tinytext" | "mediumtext" | "longtext" => MString(None)
    case other => throw new IllegalArgumentException(s"unknown MySQL type: '$other(...)'")
  }

  private def plain(base: String, unsigned: Boolean): MySqlType = base match {
    case b if intBytes(b).isDefined => MInt(intBytes(b).get, unsigned)
    case "bool" | "boolean" => MBool
    case "bit" => MBit(1)
    case "decimal" | "numeric" | "fixed" | "dec" => MDecimalBare
    case "float" => MFloat
    case "double" | "double precision" | "real" => MDouble
    case "date" => MDate
    case "datetime" => MDateTime(0)
    case "timestamp" => MTimestamp(0)
    case "time" => MTime
    case "year" => MYear
    case "char" | "character" | "varchar" | "national char" |
         "national character" | "national varchar" | "nchar" |
         "nvarchar" | "text" | "tinytext" | "mediumtext" |
         "longtext" => MString(None)
    case "binary" => MBinary(Some(1)) // bare `binary` ≡ binary(1)
    case "varbinary" | "blob" | "tinyblob" | "mediumblob" |
         "longblob" => MBinary(None)
    case "json" => MJson
    case "point" => MPoint
    case "polygon" => MPolygon
    case "multipolygon" => MMultiPolygon
    case "geometry" => MBinary(None) // opaque passthrough
    case other => throw new IllegalArgumentException(s"unknown MySQL type: '$other'")
  }

  /** Split `'a','b,c','it''s','esc\'d'` into lowercased values —
    * quote-aware, handling both `''` and `\'` escapes
    * (reference enum/parser.py:1-183 + lowercasing enum/converter.py:17).
    */
  def parseQuotedList(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && (s(i) == ',' || s(i).isWhitespace)) i += 1
      if (i < n) {
        require(s(i) == '\'', s"expected quote at $i in: $s")
        i += 1
        val sb = new StringBuilder
        var done = false
        while (!done) {
          require(i < n, s"unterminated quoted value in: $s")
          s(i) match {
            case '\'' if i + 1 < n && s(i + 1) == '\'' => sb += '\''; i += 2
            case '\'' => i += 1; done = true
            case '\\' if i + 1 < n => sb += s(i + 1); i += 2
            case c => sb += c; i += 1
          }
        }
        out += sb.result().toLowerCase
      }
    }
    out.result()
  }
}
