package graft.ddl

import graft.types.{MySqlType, TypeParser}
import SqlText._

/** MySQL DDL → [[DdlOp]]. Covers the statement subset the reference
  * replicates (SURVEY.md §2.10; converter.py:711-1292, 1419-1574):
  * CREATE TABLE (incl. LIKE), ALTER TABLE (ADD/DROP/MODIFY/CHANGE/RENAME
  * COLUMN with FIRST/AFTER, index/constraint clauses ignored), DROP,
  * RENAME, TRUNCATE. Anything else parses to `Ignored` — binlog QUERY
  * events carry plenty of noise (BEGIN, GRANT, analyze...).
  *
  * Spark's own parser can't be used here: this is the MySQL dialect
  * (backticks, enum literals, column attributes, COMMENT clauses).
  */
object DdlParser {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  private val typeOverrides: ThreadLocal[Map[String, MySqlType]] =
    ThreadLocal.withInitial(() => Map.empty[String, MySqlType])

  /** Parse one statement. `overrides` = user types_mapping. */
  def parse(sql: String,
            overrides: Map[String, MySqlType] = Map.empty): DdlOp = {
    typeOverrides.set(overrides)
    try parseClean(stripComments(sql).trim.stripSuffix(";").trim)
    finally typeOverrides.remove()
  }

  private def parseClean(sql: String): DdlOp = {
    // quote-aware: `enum('a;b')` / COMMENT 'x; y' are single statements
    // (converter.py:673-679 rejects real multi-statement text)
    if (SqlText.splitTopLevel(sql, ';').count(_.trim.nonEmpty) > 1)
      throw ParseError("multi-statement query not supported")
    val lower = sql.toLowerCase
    if (lower.startsWith("create table")) parseCreate(sql)
    else if (lower.startsWith("alter table")) parseAlter(sql)
    else if (lower.startsWith("drop table")) parseDrop(sql)
    else if (lower.startsWith("rename table")) parseRename(sql)
    else if (lower.startsWith("truncate")) parseTruncate(sql)
    else DdlOp.Ignored
  }

  // ---------------------------------------------------------------- CREATE

  private def parseCreate(sql: String): DdlOp = {
    var rest = sql.substring("create table".length).trim
    val ifNotExists = rest.toLowerCase.startsWith("if not exists")
    if (ifNotExists) rest = rest.substring("if not exists".length).trim

    val parenIdx = indexOfTopLevel(rest, '(')
    if (parenIdx < 0) {
      // CREATE TABLE a LIKE b
      val toks = tokenize(rest)
      if (toks.length >= 3 && toks(1).equalsIgnoreCase("like")) {
        val (db, t) = parseQualified(toks(0))
        val (sdb, st) = parseQualified(toks(2))
        return DdlOp.CreateTableLike(db, t, sdb, st, ifNotExists)
      }
      throw ParseError(s"unsupported CREATE TABLE form: $sql")
    }
    val nameText = rest.substring(0, parenIdx).trim
    // CREATE TABLE a LIKE b — parenthesized LIKE form: (LIKE b)
    val bodyEnd = matchParen(rest, parenIdx)
    val body = rest.substring(parenIdx + 1, bodyEnd)
    val tail = rest.substring(bodyEnd + 1)
    if (body.trim.toLowerCase.startsWith("like ")) {
      val (db, t) = parseQualified(nameText)
      val (sdb, st) = parseQualified(body.trim.substring(5).trim)
      return DdlOp.CreateTableLike(db, t, sdb, st, ifNotExists)
    }

    val (db, table) = parseQualified(nameText)
    val items = splitTopLevel(body)
    val fields = Vector.newBuilder[FieldSchema]
    var explicitPks = Seq.empty[String]
    val perColumnPks = Vector.newBuilder[String]

    // Skip keywords matched as a WHOLE first token (optionally directly
    // followed by '('), never as a string prefix — `checksum int` /
    // `indexed_at datetime` are columns, not constraints (the reference
    // whole-line-prefix matches a shorter list, converter.py:1495-1513;
    // all of these are reserved words in MySQL so whole-token is safe).
    val skipKeywords = Set("key", "index", "unique", "constraint",
      "fulltext", "spatial", "foreign", "check")
    items.foreach { item =>
      val low = item.toLowerCase
      val firstTok = low.takeWhile(c => !c.isWhitespace && c != '(')
      // table-level PK, bare or named: PRIMARY KEY (...) and
      // CONSTRAINT [name] PRIMARY KEY (...) — the name (if any) sits
      // before any paren, so a "(" ahead of "primary key" rules out a
      // false match on e.g. CHECK (col <> 'primary key')
      val pkAt =
        if (low.startsWith("primary key")) 0
        else if (firstTok == "constraint") {
          val idx = low.indexOf("primary key")
          if (idx >= 0 && !item.substring(0, idx).contains("(")) idx else -1
        } else -1
      if (pkAt >= 0) {
        val sub = item.substring(pkAt)
        val p = sub.indexOf('(')
        require(p >= 0, s"PRIMARY KEY clause without columns: $item")
        val cols = sub.substring(p + 1, matchParen(sub, p))
        // strip prefix lengths: `name`(10)
        explicitPks = splitTopLevel(cols).map { c =>
          unquoteIdent(c.takeWhile(_ != '(').trim) }
      } else if (skipKeywords.contains(firstTok)) {
        () // secondary indexes/constraints don't replicate
      } else {
        val (f, isPk) = parseColumnDef(item)
        fields += f
        if (isPk) perColumnPks += f.name
      }
    }
    val fs = fields.result()
    val pks = TableSchema.inferPrimaryKeys(fs, explicitPks,
      perColumnPks.result(), table)
    val charset = parseTableCharset(tail)
    // PK columns are implicitly NOT NULL in MySQL
    val fsFixed = fs.map(f =>
      if (pks.contains(f.name)) f.copy(nullable = false) else f)
    DdlOp.CreateTable(db,
      TableSchema(table, fsFixed, pks, charset, ifNotExists))
  }

  private def parseTableCharset(tail: String): Option[String] = {
    // blank out quoted strings first: COMMENT='... charset=latin1 ...'
    // must not read as a table charset clause
    val sb = new StringBuilder(tail)
    var i = 0
    var quote: Char = 0
    while (i < sb.length) {
      val c = sb(i)
      if (quote != 0) { if (c == quote) quote = 0 else sb(i) = ' ' }
      else if (c == '\'' || c == '"') quote = c
      i += 1
    }
    val m = """(?i)(?:default\s+)?(?:charset|character\s+set)\s*=?\s*([a-z0-9_]+)""".r
    m.findFirstMatchIn(sb.toString).map(_.group(1).toLowerCase)
  }

  /** One column definition → (field, isPerColumnPk). */
  private[ddl] def parseColumnDef(item: String): (FieldSchema, Boolean) = {
    val toks = tokenize(item)
    require(toks.nonEmpty, s"empty column def")
    val name = unquoteIdent(toks.head)
    var i = 1
    require(i < toks.length, s"column '$name' missing type")
    // assemble multi-token types: "double precision", "character varying(20)",
    // "national varchar(20)", plus trailing unsigned/zerofill
    val typeSb = new StringBuilder(toks(i)); i += 1
    val lowFirst = typeSb.toString.toLowerCase
    if ((lowFirst == "double" || lowFirst == "character" ||
         lowFirst == "national") && i < toks.length &&
        Set("precision", "varying", "char", "varchar")
          .exists(w => toks(i).toLowerCase.startsWith(w))) {
      typeSb += ' '; typeSb ++= toks(i); i += 1
      // third word: NATIONAL CHARACTER VARYING(n) / NATIONAL CHAR VARYING(n)
      if (lowFirst == "national" && i < toks.length &&
          toks(i).toLowerCase.startsWith("varying")) {
        typeSb += ' '; typeSb ++= toks(i); i += 1
      }
    }
    while (i < toks.length &&
           Set("unsigned", "zerofill").contains(toks(i).toLowerCase)) {
      typeSb += ' '; typeSb ++= toks(i); i += 1
    }
    val parsed = TypeParser.parse(typeSb.toString, typeOverrides.get())

    var nullable = true
    var default: Option[String] = None
    var isPk = false
    var charset: Option[String] = None
    while (i < toks.length) {
      val t = toks(i).toLowerCase
      t match {
        case "not" if peek(toks, i + 1) == "null" => nullable = false; i += 2
        case "null" => i += 1
        case "default" =>
          // DEFAULT <literal | NULL | CURRENT_TIMESTAMP[(n)] | (expr)>
          default = Some(toks(i + 1)); i += 2
          if (peek(toks, i) == "on" && peek(toks, i + 1) == "update") i += 3
        case "primary" if peek(toks, i + 1) == "key" => isPk = true; i += 2
        case "unique" => i += (if (peek(toks, i + 1) == "key") 2 else 1)
        case "key" => i += 1
        case "auto_increment" => i += 1
        case "comment" => i += 2 // skip the string token
        case "character" if peek(toks, i + 1) == "set" =>
          charset = Some(toks(i + 2).toLowerCase); i += 3
        case "charset" => charset = Some(toks(i + 1).toLowerCase); i += 2
        case "collate" => i += 2
        case "on" if peek(toks, i + 1) == "update" => i += 3
        case "generated" | "virtual" | "stored" | "always" => i += 1
        case "as" => i += 2 // generated column expr (paren group = 1 token)
        case "invisible" | "visible" => i += 1
        case "references" => i = toks.length // FK tail — ignore rest
        case _ => i += 1 // unknown attribute: skip (reference is lenient)
      }
    }
    val tpe = (parsed.tpe, charset) match {
      case (MySqlType.MString(None), Some(cs)) => MySqlType.MString(Some(cs))
      case (t, _) => t
    }
    (FieldSchema(name, tpe, parsed.sourceText, nullable, default), isPk)
  }

  private def peek(toks: Vector[String], i: Int): String =
    if (i < toks.length) toks(i).toLowerCase else ""

  // ----------------------------------------------------------------- ALTER

  private def parseAlter(sql: String): DdlOp = {
    // qualified name consumed at character level — `db`.`t` must stay one
    // name (ADVICE r1: tokenize splits it and the clause was silently lost)
    val (db, table, rest0) = consumeQualified(sql.substring("alter table".length))
    var rest = rest0.trim

    // ALTER TABLE t RENAME [TO|AS] x  → table-level rename. Clause-split
    // FIRST: previously `RENAME TO t2, ADD c int` swallowed the ADD into
    // the rename target, and `ADD c int, RENAME TO t2` dropped the
    // rename as a Noop — both silent. Mixed forms now fail loudly (the
    // pipeline logs and skips) instead of half-applying.
    def isTableRename(c: String): Boolean = {
      val l = c.trim.toLowerCase
      l.startsWith("rename to ") || l.startsWith("rename as ") ||
        (l.startsWith("rename ") && !l.startsWith("rename column") &&
          !l.startsWith("rename index") && !l.startsWith("rename key"))
    }
    val clauses = splitTopLevel(rest)
    if (clauses.exists(isTableRename)) {
      if (clauses.length > 1)
        throw ParseError(
          s"ALTER TABLE mixing RENAME TO with other clauses: $sql")
      var target = clauses.head.trim.substring("rename".length).trim
      val lowT = target.toLowerCase
      if (lowT.startsWith("to ") || lowT.startsWith("as "))
        target = target.substring(2).trim
      val (newDb, newName, _) = consumeQualified(target)
      return DdlOp.RenameTable(Seq((db, table) -> (newDb.orElse(db), newName)))
    }
    val ops = clauses.map(parseAlterClause)
    DdlOp.AlterTable(db, table, ops)
  }

  private def parseAlterClause(clause: String): AlterOp = {
    val toks = tokenize(clause)
    val low = toks.map(_.toLowerCase)
    def dropColKeyword(from: Int): Int =
      if (peekAt(low, from) == "column") from + 1 else from

    low.headOption match {
      case Some("add") =>
        // ADD INDEX/KEY/CONSTRAINT/UNIQUE/FULLTEXT/SPATIAL/FOREIGN/PRIMARY → noop
        val kw = peekAt(low, 1)
        if (Set("index", "key", "constraint", "unique", "fulltext",
                "spatial", "foreign", "primary").contains(kw)) AlterOp.Noop
        else {
          var start = dropColKeyword(1)
          // MariaDB dialect: ADD [COLUMN] IF NOT EXISTS `c` type
          val cond = peekAt(low, start) == "if" &&
            peekAt(low, start + 1) == "not" &&
            peekAt(low, start + 2) == "exists"
          if (cond) start += 3
          val (defText, pos) = splitPosition(toks, start)
          val (f, _) = parseColumnDef(defText)
          AlterOp.AddColumn(f, pos.getOrElse(ColumnPosition.Last),
            ifNotExists = cond)
        }
      case Some("drop") =>
        val kw = peekAt(low, 1)
        if (Set("index", "key", "constraint", "foreign", "primary",
                "check").contains(kw)) AlterOp.Noop
        else {
          var start = dropColKeyword(1)
          // MariaDB dialect: DROP [COLUMN] IF EXISTS `c`
          val cond = peekAt(low, start) == "if" &&
            peekAt(low, start + 1) == "exists"
          if (cond) start += 2
          AlterOp.DropColumn(unquoteIdent(toks(start)), ifExists = cond)
        }
      case Some("modify") =>
        val start = dropColKeyword(1)
        val (defText, pos) = splitPosition(toks, start)
        val (f, _) = parseColumnDef(defText)
        AlterOp.ModifyColumn(f, pos)
      case Some("change") =>
        val start = dropColKeyword(1)
        val from = unquoteIdent(toks(start))
        val (defText, pos) = splitPosition(toks, start + 1)
        val (f, _) = parseColumnDef(defText)
        AlterOp.ChangeColumn(from, f, pos)
      case Some("rename") if peekAt(low, 1) == "column" =>
        AlterOp.RenameColumn(unquoteIdent(toks(2)), unquoteIdent(toks(4)))
      case Some("rename") => AlterOp.Noop // RENAME INDEX/KEY
      case Some("alter") => AlterOp.Noop  // ALTER COLUMN SET/DROP DEFAULT
      case Some("auto_increment") | Some("engine") | Some("convert") |
           Some("character") | Some("charset") | Some("collate") |
           Some("comment") | Some("row_format") | Some("algorithm") |
           Some("lock") | Some("order") | Some("force") => AlterOp.Noop
      case _ => AlterOp.Noop
    }
  }

  private def peekAt(low: Vector[String], i: Int): String =
    if (i < low.length) low(i) else ""

  /** Split trailing FIRST / AFTER `col` off a column-def token span. */
  private def splitPosition(toks: Vector[String], start: Int)
      : (String, Option[ColumnPosition]) = {
    val low = toks.map(_.toLowerCase)
    val n = toks.length
    if (n >= start + 2 && low(n - 2) == "after")
      (toks.slice(start, n - 2).mkString(" "),
        Some(ColumnPosition.After(unquoteIdent(toks(n - 1)))))
    else if (n >= start + 1 && low(n - 1) == "first")
      (toks.slice(start, n - 1).mkString(" "), Some(ColumnPosition.First))
    else (toks.slice(start, n).mkString(" "), None)
  }

  // ------------------------------------------------------- DROP / RENAME / TRUNCATE

  private def parseDrop(sql: String): DdlOp = {
    var rest = sql.substring("drop table".length).trim
    val ifExists = rest.toLowerCase.startsWith("if exists")
    if (ifExists) rest = rest.substring("if exists".length).trim
    // DROP TABLE a, b, c — every listed table drops (trailing
    // RESTRICT/CASCADE noise survives consumeQualified per name)
    val tables = splitTopLevel(rest).map { part =>
      val (db, t, _) = consumeQualified(part)
      (db, t)
    }
    DdlOp.DropTable(tables, ifExists)
  }

  private def parseRename(sql: String): DdlOp = {
    val rest = sql.substring("rename table".length).trim
    val renames = splitTopLevel(rest).map { part =>
      val (fromDb, from, mid) = consumeQualified(part)
      val midT = mid.trim
      require(midT.toLowerCase.startsWith("to"), s"bad RENAME clause: $part")
      val (toDb, to, _) = consumeQualified(midT.substring(2))
      (fromDb, from) -> (toDb, to)
    }
    DdlOp.RenameTable(renames)
  }

  private def parseTruncate(sql: String): DdlOp = {
    var rest = sql.substring("truncate".length).trim
    if (rest.toLowerCase.startsWith("table")) rest = rest.substring(5).trim
    val (db, t, _) = consumeQualified(rest)
    DdlOp.TruncateTable(db, t)
  }

  // ----------------------------------------------------------------- utils

  private def indexOfTopLevel(s: String, target: Char): Int = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"' || c == '`') quote = c
      else if (c == target) return i
      i += 1
    }
    -1
  }

  /** Index of the ')' matching the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        if (c == '\\') i += 1 else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') quote = c
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw ParseError(s"unbalanced parens in: $s")
  }
}
