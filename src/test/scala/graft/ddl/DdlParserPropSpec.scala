package graft.ddl

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property fuzz over the MySQL DDL parser: random identifiers
  * (including reserved-word prefixes), random quoting, random type pool,
  * optional qualifiers/charsets — the parsed schema must reproduce the
  * generated columns in order with the right PK, and the quote-aware
  * splitter must never be confused by commas inside enum literals.
  */
object DdlParserPropSpec extends Properties("DdlParser") {

  private val ident: Gen[String] = for {
    // reserved-ish heads are the historical trap (checksum, keyword...)
    head <- Gen.oneOf("col", "key", "index", "checksum", "unique", "x",
      "constraint", "foreign", "data")
    n <- Gen.choose(0, 999)
  } yield s"${head}_$n"

  private val colType: Gen[(String, String)] = Gen.oneOf(
    "int" -> "int", "bigint unsigned" -> "bigint unsigned",
    "varchar(255)" -> "varchar(255)", "decimal(10,2)" -> "decimal(10,2)",
    "datetime(6)" -> "datetime(6)", "text" -> "text",
    "enum('a,b','c''d','e')" -> "enum", // commas + escaped quote inside
    "set('x','y,z')" -> "set",
    "double" -> "double", "json" -> "json", "tinyint(1)" -> "bool")

  private case class Col(name: String, tpe: String, backtick: Boolean,
                         notNull: Boolean)

  private val colGen: Gen[Col] = for {
    n <- ident
    (t, _) <- colType
    b <- Gen.oneOf(true, false)
    nn <- Gen.oneOf(true, false)
  } yield Col(n, t, b, nn)

  private def render(c: Col): String = {
    val name = if (c.backtick) s"`${c.name}`" else c.name
    s"$name ${c.tpe}${if (c.notNull) " NOT NULL" else ""}"
  }

  property("CREATE TABLE round-trips columns, order, and PK") = forAll(
    for {
      cols0 <- Gen.nonEmptyListOf(colGen)
      cols = ("id_0" +: cols0.map(_.name)).distinct.zip(
        Col("id_0", "int", backtick = false, notNull = true) +: cols0)
        .map { case (n, c) => c.copy(name = n) }
      qualified <- Gen.oneOf(true, false)
      pkIdx <- Gen.choose(0, cols.length - 1)
    } yield (cols, qualified, pkIdx)) { case (cols, qualified, pkIdx) =>
    val pk = cols(pkIdx).name
    val tbl = if (qualified) "`mydb`.`t`" else "`t`"
    val body = (cols.map(render) :+ s"PRIMARY KEY (`$pk`)" :+
      "KEY `k1` (`id_0`)").mkString(",\n  ")
    val sql = s"CREATE TABLE $tbl (\n  $body\n) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
    DdlParser.parse(sql) match {
      case DdlOp.CreateTable(db, s) =>
        Prop(db == (if (qualified) Some("mydb") else None)) :| "db qualifier" &&
        Prop(s.name == "t") :| "table name" &&
        Prop(s.fields.map(_.name) == cols.map(_.name).toVector) :| "columns in order" &&
        Prop(s.primaryKeys == Seq(pk)) :| "primary key" &&
        Prop(s.charset.contains("utf8mb4")) :| "charset" &&
        Prop(!s.fields(pkIdx).nullable) :| "pk implicitly not null"
      case other => Prop.falsified :| s"parsed $other"
    }
  }

  property("ALTER ADD/DROP round-trips for random identifiers") = forAll(
    for { n <- ident; (t, _) <- colType } yield (n, t)) { case (n, t) =>
    (DdlParser.parse(s"ALTER TABLE t ADD COLUMN `$n` $t AFTER `other`") match {
      case DdlOp.AlterTable(None, "t",
        Seq(AlterOp.AddColumn(f, ColumnPosition.After("other"), false))) =>
        f.name == n
      case _ => false
    }) &&
    (DdlParser.parse(s"ALTER TABLE t DROP COLUMN `$n`") match {
      case DdlOp.AlterTable(None, "t", Seq(AlterOp.DropColumn(c, false))) =>
        c == n
      case _ => false
    })
  }

  property("noise statements never throw, always Ignored") = forAll(
    Gen.oneOf("BEGIN", "COMMIT", "GRANT ALL ON *.* TO x",
      "ANALYZE TABLE t", "CREATE INDEX i ON t (c)", "FLUSH LOGS",
      "SET NAMES utf8mb4", "# comment only")) { sql =>
    DdlParser.parse(sql) == DdlOp.Ignored
  }
}
