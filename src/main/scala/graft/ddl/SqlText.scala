package graft.ddl

/** Low-level SQL-text utilities: comment stripping and quote/paren-aware
  * splitting. The reference hand-rolls the same primitives
  * (converter.py:283-343 top-level split, 1297-1417 comment stripping);
  * they exist because MySQL DDL can't be handed to a standard SQL parser
  * (backticks, enum literals with commas, COMMENT clauses...).
  */
object SqlText {

  /** Strip line comments (`-- `, `#`) and block comments, outside quotes. */
  def stripComments(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    var quote: Char = 0
    while (i < n) {
      val c = sql(i)
      if (quote != 0) {
        sb += c
        if (c == '\\' && quote != '`' && i + 1 < n) { sb += sql(i + 1); i += 1 }
        else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; sb += c; i += 1
      } else if (c == '-' && i + 2 < n && sql(i + 1) == '-' &&
                 (sql(i + 2) == ' ' || sql(i + 2) == '\t' || sql(i + 2) == '\n')) {
        while (i < n && sql(i) != '\n') i += 1
      } else if (c == '#') {
        while (i < n && sql(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql(i) == '*' && sql(i + 1) == '/')) i += 1
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.result()
  }

  /** Split on `sep` at paren depth 0, outside quotes (converter.py:283-343). */
  def splitTopLevel(s: String, sep: Char = ','): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (quote != 0) {
        sb += c
        if (c == '\\' && quote != '`' && i + 1 < n) { sb += s(i + 1); i += 1 }
        else if (c == quote) {
          // '' escape inside single quotes
          if (quote == '\'' && i + 1 < n && s(i + 1) == '\'') { sb += '\''; i += 1 }
          else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; sb += c
        case '(' => depth += 1; sb += c
        case ')' => depth -= 1; sb += c
        case `sep` if depth == 0 => out += sb.result().trim; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    val last = sb.result().trim
    if (last.nonEmpty || s.nonEmpty) out += last
    out.result().filter(_.nonEmpty)
  }

  /** Tokenize respecting backtick-quoted identifiers, quoted strings and
    * parenthesized groups as single tokens (the ALTER tokenizer,
    * converter.py:791-849). */
  def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '`') {
        val j = s.indexOf('`', i + 1)
        require(j > 0, s"unterminated backtick in: $s")
        out += s.substring(i, j + 1); i = j + 1
      } else if (c == '\'' || c == '"') {
        var j = i + 1
        var done = false
        while (!done) {
          require(j < n, s"unterminated quote in: $s")
          if (s(j) == '\\') j += 2
          else if (s(j) == c && j + 1 < n && s(j + 1) == c) j += 2
          else if (s(j) == c) { done = true }
          else j += 1
        }
        out += s.substring(i, j + 1); i = j + 1
      } else if (c == '(') {
        var depth = 1
        var j = i + 1
        var quote: Char = 0
        while (depth > 0) {
          require(j < n, s"unbalanced parens in: $s")
          val cj = s(j)
          if (quote != 0) {
            if (cj == '\\') j += 1
            else if (cj == quote) quote = 0
          } else if (cj == '\'' || cj == '"' || cj == '`') quote = cj
          else if (cj == '(') depth += 1
          else if (cj == ')') depth -= 1
          j += 1
        }
        out += s.substring(i, j); i = j
      } else if (c == ',') { out += ","; i += 1 }
      else {
        var j = i
        while (j < n && !s(j).isWhitespace && s(j) != ',' && s(j) != '(' &&
               s(j) != '`') j += 1
        // reattach a directly-following paren group: `decimal(10,2)`
        if (j < n && s(j) == '(') {
          var depth = 1
          var k = j + 1
          var quote: Char = 0
          while (depth > 0) {
            require(k < n, s"unbalanced parens in: $s")
            val ck = s(k)
            if (quote != 0) { if (ck == '\\') k += 1 else if (ck == quote) quote = 0 }
            else if (ck == '\'' || ck == '"' || ck == '`') quote = ck
            else if (ck == '(') depth += 1
            else if (ck == ')') depth -= 1
            k += 1
          }
          out += s.substring(i, k); i = k
        } else { out += s.substring(i, j); i = j }
      }
    }
    out.result()
  }

  def unquoteIdent(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  /** Consume a leading qualified name — ident ['.' ident], each part
    * optionally backticked — off the front of raw statement text.
    * Returns (db, name, rest). The reference whitespace-splits so
    * `` `db`.`t` `` stays one token (converter.py:681-688); our tokenizer
    * treats '`' as a boundary, so ALTER/DROP/RENAME/TRUNCATE consume the
    * name at character level with this instead of `tokenize(...).head`.
    */
  def consumeQualified(s: String): (Option[String], String, String) = {
    val t = s.trim
    require(t.nonEmpty, "empty name")
    def ident(i0: Int): (String, Int) =
      if (t(i0) == '`') {
        val j = t.indexOf('`', i0 + 1)
        require(j > 0, s"unterminated backtick in: $s")
        (t.substring(i0 + 1, j), j + 1)
      } else {
        var j = i0
        while (j < t.length && !t(j).isWhitespace && t(j) != '.' &&
               t(j) != '(' && t(j) != ',' && t(j) != '`' && t(j) != ';') j += 1
        require(j > i0, s"expected identifier at '${t.substring(i0)}'")
        (t.substring(i0, j), j)
      }
    val (first, i1) = ident(0)
    if (i1 < t.length && t(i1) == '.') {
      val (second, i2) = ident(i1 + 1)
      (Some(first), second, t.substring(i2))
    } else (None, first, t.substring(i1))
  }

  /** `db.table` / `` `db`.`table` `` → (Some(db), table). */
  def parseQualified(s: String): (Option[String], String) = {
    val t = s.trim
    // split on the first dot outside backticks
    var i = 0
    var quote = false
    var dot = -1
    while (i < t.length && dot < 0) {
      if (t(i) == '`') quote = !quote
      else if (t(i) == '.' && !quote) dot = i
      i += 1
    }
    if (dot < 0) (None, unquoteIdent(t))
    else (Some(unquoteIdent(t.substring(0, dot))), unquoteIdent(t.substring(dot + 1)))
  }
}
