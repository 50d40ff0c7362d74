package graft.ddl

import org.scalatest.funsuite.AnyFunSuite
import graft.types.MySqlType._

/** Parser cases ported from the reference's unit tests
  * (tests/test_mysql_ch_replicator.py:413-468, test_split_high_level.py,
  * test_strip_comments.py) plus the DDL-operations e2e shapes
  * (tests/test_ddl_operations.py).
  */
class DdlParserSpec extends AnyFunSuite {

  test("splitTopLevel respects quotes and parens") {
    assert(SqlText.splitTopLevel("a int, b enum('x,y','z'), c decimal(10,2)") ===
      Vector("a int", "b enum('x,y','z')", "c decimal(10,2)"))
    assert(SqlText.splitTopLevel("a 'q,in' b, c") === Vector("a 'q,in' b", "c"))
  }

  test("stripComments") {
    assert(SqlText.stripComments("create table t (a int) -- trailing")
      .trim === "create table t (a int)")
    assert(SqlText.stripComments("a /* inline */ b").trim === "a  b")
    assert(SqlText.stripComments("a '-- not a comment' b") ===
      "a '-- not a comment' b")
  }

  test("CREATE TABLE: backticks, enum commas, PK clause, charset") {
    val op = DdlParser.parse(
      """CREATE TABLE `shop`.`items` (
        |  `id` int unsigned NOT NULL AUTO_INCREMENT,
        |  `name` varchar(255) NOT NULL DEFAULT 'x',
        |  `status` enum('new','used,worn','N/A') DEFAULT 'new',
        |  `tags` set('a','b') DEFAULT NULL,
        |  `price` decimal(10,2) NOT NULL,
        |  `created` datetime(3),
        |  KEY `idx_name` (`name`),
        |  CONSTRAINT `fk` FOREIGN KEY (`id`) REFERENCES o(`id`),
        |  PRIMARY KEY (`id`)
        |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""".stripMargin)
    val DdlOp.CreateTable(db, s) = op: @unchecked
    assert(db.contains("shop"))
    assert(s.name === "items")
    assert(s.fields.map(_.name) ===
      Vector("id", "name", "status", "tags", "price", "created"))
    assert(s.primaryKeys === Seq("id"))
    assert(s.charset.contains("utf8mb4"))
    assert(s.fields(0).tpe === MInt(4, unsigned = true))
    assert(!s.fields(0).nullable) // PK implies NOT NULL
    assert(s.fields(2).tpe === MEnum(Seq("new", "used,worn", "n/a")))
    assert(s.fields(4).tpe === MDecimal(10, 2))
    assert(s.fields(5).tpe === MDateTime(3))
  }

  test("CREATE TABLE: per-column primary key and `id` fallback") {
    val DdlOp.CreateTable(_, s1) = DdlParser.parse(
      "CREATE TABLE t (code varchar(8) PRIMARY KEY, v int)"): @unchecked
    assert(s1.primaryKeys === Seq("code"))
    val DdlOp.CreateTable(_, s2) = DdlParser.parse(
      "CREATE TABLE t (id bigint, v int)"): @unchecked
    assert(s2.primaryKeys === Seq("id")) // converter.py:1566-1568
    assertThrows[IllegalArgumentException](
      DdlParser.parse("CREATE TABLE t (a int, b int)"))
  }

  test("CREATE TABLE IF NOT EXISTS / LIKE") {
    val DdlOp.CreateTable(_, s) = DdlParser.parse(
      "CREATE TABLE IF NOT EXISTS t (id int)"): @unchecked
    assert(s.ifNotExists)
    val like = DdlParser.parse("CREATE TABLE t2 LIKE t1")
    assert(like === DdlOp.CreateTableLike(None, "t2", None, "t1", ifNotExists = false))
  }

  test("composite primary key") {
    val DdlOp.CreateTable(_, s) = DdlParser.parse(
      "CREATE TABLE t (a int, b varchar(8), v int, PRIMARY KEY (a, b))"): @unchecked
    assert(s.primaryKeys === Seq("a", "b"))
    assert(s.primaryKeyIds === Seq(0, 1))
  }

  test("ALTER TABLE ADD/DROP/MODIFY/CHANGE/RENAME COLUMN with FIRST/AFTER") {
    val DdlOp.AlterTable(_, t, ops) = DdlParser.parse(
      """ALTER TABLE db.t
        |  ADD COLUMN c1 int unsigned NOT NULL FIRST,
        |  ADD c2 double precision AFTER c1,
        |  DROP COLUMN old1,
        |  MODIFY COLUMN m1 varchar(100) NOT NULL,
        |  CHANGE old2 new2 bigint,
        |  RENAME COLUMN a TO b,
        |  ADD INDEX idx (c1),
        |  DROP INDEX idx,
        |  RENAME INDEX i1 TO i2""".stripMargin): @unchecked
    assert(t === "t")
    assert(ops(0) === AlterOp.AddColumn(
      FieldSchema("c1", MInt(4, unsigned = true), "int unsigned", nullable = false),
      ColumnPosition.First))
    assert(ops(1) === AlterOp.AddColumn(
      FieldSchema("c2", MDouble, "double precision"),
      ColumnPosition.After("c1")))
    assert(ops(2) === AlterOp.DropColumn("old1"))
    assert(ops(3) === AlterOp.ModifyColumn(
      FieldSchema("m1", MString(None), "varchar(100)", nullable = false), None))
    assert(ops(4) === AlterOp.ChangeColumn("old2",
      FieldSchema("new2", MInt(8, unsigned = false), "bigint"), None))
    assert(ops(5) === AlterOp.RenameColumn("a", "b"))
    assert(ops(6) === AlterOp.Noop)
    assert(ops(7) === AlterOp.Noop)
    assert(ops(8) === AlterOp.Noop)
  }

  test("MariaDB conditional ALTER clauses (IF [NOT] EXISTS)") {
    val DdlOp.AlterTable(None, "t", ops) = DdlParser.parse(
      """ALTER TABLE t
        |  ADD COLUMN IF NOT EXISTS `stock` int DEFAULT 0,
        |  ADD IF NOT EXISTS note varchar(20),
        |  DROP COLUMN IF EXISTS `legacy`,
        |  DROP IF EXISTS legacy2""".stripMargin): @unchecked
    assert(ops(0) === AlterOp.AddColumn(
      FieldSchema("stock", MInt(4, unsigned = false), "int",
        defaultExpr = Some("0")),
      ColumnPosition.Last, ifNotExists = true))
    assert(ops(1) === AlterOp.AddColumn(
      FieldSchema("note", MString(None), "varchar(20)"),
      ColumnPosition.Last, ifNotExists = true))
    assert(ops(2) === AlterOp.DropColumn("legacy", ifExists = true))
    assert(ops(3) === AlterOp.DropColumn("legacy2", ifExists = true))
  }

  test("DROP / RENAME / TRUNCATE") {
    assert(DdlParser.parse("DROP TABLE IF EXISTS db.t") ===
      DdlOp.DropTable(Seq((Some("db"), "t")), ifExists = true))
    assert(DdlParser.parse("RENAME TABLE a TO b, `c` TO `d`") ===
      DdlOp.RenameTable(Seq(
        (None, "a") -> (None, "b"), (None, "c") -> (None, "d"))))
    assert(DdlParser.parse("TRUNCATE TABLE t") ===
      DdlOp.TruncateTable(None, "t"))
    assert(DdlParser.parse("TRUNCATE t") === DdlOp.TruncateTable(None, "t"))
    assert(DdlParser.parse("ALTER TABLE t RENAME TO t2") ===
      DdlOp.RenameTable(Seq((None, "t") -> (None, "t2"))))
  }

  test("pt-online-schema-change dance (test_ddl_operations.py:50-126)") {
    // percona creates `_t_new`, alters it, then atomically renames
    val DdlOp.CreateTable(_, s) = DdlParser.parse(
      "CREATE TABLE `_items_new` (id int, v int, PRIMARY KEY(id))"): @unchecked
    assert(s.name === "_items_new")
    assert(DdlParser.parse("RENAME TABLE `items` TO `_items_old`, `_items_new` TO `items`") ===
      DdlOp.RenameTable(Seq(
        (None, "items") -> (None, "_items_old"),
        (None, "_items_new") -> (None, "items"))))
  }

  test("backtick-qualified `db`.`t` names in ALTER/DROP/RENAME/TRUNCATE (ADVICE r1)") {
    val DdlOp.AlterTable(db, t, ops) = DdlParser.parse(
      "ALTER TABLE `shop`.`items` ADD COLUMN price decimal(10,2)"): @unchecked
    assert(db.contains("shop") && t === "items")
    assert(ops === Seq(AlterOp.AddColumn(
      FieldSchema("price", MDecimal(10, 2), "decimal(10,2)"),
      ColumnPosition.Last)))
    assert(DdlParser.parse("DROP TABLE `shop`.`items`") ===
      DdlOp.DropTable(Seq((Some("shop"), "items")), ifExists = false))
    assert(DdlParser.parse("TRUNCATE TABLE `shop`.`items`") ===
      DdlOp.TruncateTable(Some("shop"), "items"))
    assert(DdlParser.parse("RENAME TABLE `shop`.`a` TO `shop`.`b`") ===
      DdlOp.RenameTable(Seq((Some("shop"), "a") -> (Some("shop"), "b"))))
    assert(DdlParser.parse("ALTER TABLE `shop`.`a` RENAME TO `shop`.`b`") ===
      DdlOp.RenameTable(Seq((Some("shop"), "a") -> (Some("shop"), "b"))))
  }

  test("columns whose names start with constraint keywords are kept (ADVICE r1)") {
    val DdlOp.CreateTable(_, s) = DdlParser.parse(
      """CREATE TABLE t (id int, checksum int, indexed_at datetime,
        |  keyword varchar(10), uniqueness double,
        |  KEY `k` (`checksum`), PRIMARY KEY(id))""".stripMargin): @unchecked
    assert(s.fields.map(_.name) ===
      Vector("id", "checksum", "indexed_at", "keyword", "uniqueness"))
  }

  test("noise statements are Ignored") {
    assert(DdlParser.parse("BEGIN") === DdlOp.Ignored)
    assert(DdlParser.parse("CREATE DATABASE d") === DdlOp.Ignored)
    assert(DdlParser.parse("GRANT ALL ON *.* TO x") === DdlOp.Ignored)
    assert(DdlParser.parse("CREATE INDEX i ON t(a)") === DdlOp.Ignored)
  }

  test("multi-statement rejected (converter.py:673-679)") {
    assertThrows[DdlParser.ParseError](
      DdlParser.parse("CREATE TABLE t (id int); DROP TABLE u"))
  }

  test("COMMENT clauses stripped (test_strip_comments.py)") {
    val DdlOp.CreateTable(_, s) = DdlParser.parse(
      "CREATE TABLE t (id int COMMENT 'the, pk', v varchar(8) COMMENT 'x)y')"): @unchecked
    assert(s.fields.map(_.name) === Vector("id", "v"))
  }

  test("named CONSTRAINT primary key, semicolons in strings, multi-DROP") {
    // CONSTRAINT [name] PRIMARY KEY (...) must yield the composite PK,
    // not fall back to the id-column heuristic
    val DdlOp.CreateTable(_, s1) = DdlParser.parse(
      """CREATE TABLE t (id int, ts int, v int,
        |  CONSTRAINT pk_t PRIMARY KEY (id, ts))""".stripMargin): @unchecked
    assert(s1.primaryKeys === Seq("id", "ts"))
    val DdlOp.CreateTable(_, s2) = DdlParser.parse(
      "CREATE TABLE t (id int, CONSTRAINT PRIMARY KEY (id))"): @unchecked
    assert(s2.primaryKeys === Seq("id"))
    // ';' inside a string literal is NOT a statement separator
    val DdlOp.CreateTable(_, s3) = DdlParser.parse(
      "CREATE TABLE t (id int, c enum('a;b','c'), PRIMARY KEY(id))"): @unchecked
    assert(s3.fields.map(_.name) === Seq("id", "c"))
    val DdlOp.AlterTable(_, _, ops) = DdlParser.parse(
      "ALTER TABLE t ADD c int COMMENT 'step 1; step 2'"): @unchecked
    assert(ops.length === 1)
    intercept[DdlParser.ParseError] {
      DdlParser.parse("DROP TABLE a; DROP TABLE b")
    }
    // multi-table DROP keeps every name
    assert(DdlParser.parse("DROP TABLE IF EXISTS a, db.b, `c`") ===
      DdlOp.DropTable(Seq((None, "a"), (Some("db"), "b"), (None, "c")),
        ifExists = true))
  }

  test("ALTER mixing RENAME TO with other clauses fails loudly, not silently") {
    // half-applying either ordering silently corrupts the schema; a
    // ParseError surfaces in the pipeline log instead
    intercept[DdlParser.ParseError] {
      DdlParser.parse("ALTER TABLE t RENAME TO t2, ADD COLUMN c int")
    }
    intercept[DdlParser.ParseError] {
      DdlParser.parse("ALTER TABLE t ADD COLUMN c int, RENAME TO t2")
    }
  }

  test("charset clause inside a COMMENT string is not a table charset") {
    val DdlOp.CreateTable(_, s1) = DdlParser.parse(
      """CREATE TABLE t (id int, PRIMARY KEY(id))
        | COMMENT='migrated from charset=latin1 system'""".stripMargin): @unchecked
    assert(s1.charset === None)
    val DdlOp.CreateTable(_, s2) = DdlParser.parse(
      """CREATE TABLE t (id int, PRIMARY KEY(id))
        | ENGINE=InnoDB DEFAULT CHARSET=latin1 COMMENT='x'""".stripMargin): @unchecked
    assert(s2.charset === Some("latin1"))
  }

  test("zerofill implies unsigned; CHARACTER synonyms; decimal>38 clamps") {
    val DdlOp.CreateTable(_, s1) = DdlParser.parse(
      """CREATE TABLE t (id int, a int zerofill, b int(10) zerofill,
        |  c character(10), d national character varying(30),
        |  e decimal(40,10), PRIMARY KEY(id))""".stripMargin): @unchecked
    val byName = s1.fields.map(f => f.name -> f.tpe).toMap
    assert(byName("a") === MInt(4, unsigned = true))
    assert(byName("b") === MInt(4, unsigned = true))
    assert(byName("c") === MString(None))
    assert(byName("d") === MString(None))
    assert(byName("e") === MDecimal(40, 10))
    // Spark caps precision at 38: integer digits keep priority
    assert(graft.types.MySqlType.toSpark(MDecimal(40, 10)) ===
      org.apache.spark.sql.types.DecimalType(38, 8))
    assert(graft.types.MySqlType.toSpark(MDecimal(65, 30)) ===
      org.apache.spark.sql.types.DecimalType(38, 3))
    assert(graft.types.MySqlType.toSpark(MDecimal(38, 10)) ===
      org.apache.spark.sql.types.DecimalType(38, 10))
  }
}
