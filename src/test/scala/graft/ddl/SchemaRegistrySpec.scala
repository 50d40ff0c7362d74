package graft.ddl

import org.scalatest.funsuite.AnyFunSuite
import graft.types.MySqlType._

class SchemaRegistrySpec extends AnyFunSuite {

  private def reg(): SchemaRegistry = {
    val r = new SchemaRegistry
    r.applySql("CREATE TABLE t (id int, a varchar(10), b int, PRIMARY KEY(id))")
    r
  }

  test("schema evolution keeps field order in lock-step (SURVEY §7 risk)") {
    val r = reg()
    r.applySql("ALTER TABLE t ADD COLUMN z int FIRST")
    assert(r("t").fields.map(_.name) === Vector("z", "id", "a", "b"))
    r.applySql("ALTER TABLE t ADD COLUMN m int AFTER a")
    assert(r("t").fields.map(_.name) === Vector("z", "id", "a", "m", "b"))
    r.applySql("ALTER TABLE t DROP COLUMN z")
    assert(r("t").fields.map(_.name) === Vector("id", "a", "m", "b"))
    r.applySql("ALTER TABLE t CHANGE m m2 bigint")
    assert(r("t").fields.map(_.name) === Vector("id", "a", "m2", "b"))
    assert(r("t").fields(2).tpe === MInt(8, unsigned = false))
    r.applySql("ALTER TABLE t RENAME COLUMN m2 TO m3")
    assert(r("t").fields.map(_.name) === Vector("id", "a", "m3", "b"))
    r.applySql("ALTER TABLE t MODIFY COLUMN a varchar(200) NOT NULL")
    assert(!r("t").fields(1).nullable)
  }

  test("MariaDB conditional ALTER: present/absent columns become noops") {
    val r = reg()
    // present column + IF NOT EXISTS → noop, not a duplicate-add error
    r.applySql("ALTER TABLE t ADD COLUMN IF NOT EXISTS a varchar(99)")
    assert(r("t").fields.map(_.name) === Vector("id", "a", "b"))
    assert(r("t").fields(1).sourceType === "varchar(10)") // untouched
    // absent column + IF NOT EXISTS → applied
    r.applySql("ALTER TABLE t ADD COLUMN IF NOT EXISTS c int AFTER id")
    assert(r("t").fields.map(_.name) === Vector("id", "c", "a", "b"))
    // absent column + IF EXISTS → noop, not an unknown-column error
    r.applySql("ALTER TABLE t DROP COLUMN IF EXISTS nope")
    assert(r("t").fields.map(_.name) === Vector("id", "c", "a", "b"))
    // present column + IF EXISTS → applied
    r.applySql("ALTER TABLE t DROP COLUMN IF EXISTS c")
    assert(r("t").fields.map(_.name) === Vector("id", "a", "b"))
  }

  test("rename table / create like / drop") {
    val r = reg()
    r.applySql("CREATE TABLE t2 LIKE t")
    assert(r("t2").fields === r("t").fields)
    r.applySql("RENAME TABLE t TO t_old")
    assert(!r.contains("t") && r.contains("t_old"))
    r.applySql("DROP TABLE IF EXISTS t2")
    assert(!r.contains("t2"))
    // IF EXISTS tolerated, bare DROP of unknown errors
    r.applySql("DROP TABLE IF EXISTS nope")
    assertThrows[NoSuchElementException](r.applySql("DROP TABLE nope"))
  }

  test("PK rename follows the column") {
    val r = reg()
    r.applySql("ALTER TABLE t RENAME COLUMN id TO pk_id")
    assert(r("t").primaryKeys === Seq("pk_id"))
  }

  test("drop of PK column refuses") {
    val r = reg()
    assertThrows[IllegalArgumentException](
      r.applySql("ALTER TABLE t DROP COLUMN id"))
  }

  test("W6: state file round-trips schemas AND the DDL replay watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg")
    val file = dir.resolve("state.json").toString
    val r = new SchemaRegistry("maindb", Some(file))
    r.applySql("maindb", "CREATE TABLE t (id int, a varchar(10), PRIMARY KEY(id))")
    r.applyDdl("maindb",
      DdlParser.parse("ALTER TABLE t ADD COLUMN b bigint"), seq = 17L)
    assert(r.lastDdlSeq === 17L)

    // a restarted process reloads both pieces of state
    val r2 = new SchemaRegistry("maindb", Some(file))
    assert(r2("maindb", "t").fields.map(_.name) === Vector("id", "a", "b"))
    assert(r2("maindb", "t").fields.map(_.id) === Vector(0, 1, 2))
    assert(r2.lastDdlSeq === 17L)

    // at-least-once redelivery after restart: same (seq, DDL) is a no-op
    assert(r2.applyDdl("maindb",
      DdlParser.parse("ALTER TABLE t ADD COLUMN b bigint"), seq = 17L) === Nil)
    assert(r2("maindb", "t").fields.map(_.name) === Vector("id", "a", "b"))
    // the next new DDL applies
    assert(r2.applyDdl("maindb",
      DdlParser.parse("ALTER TABLE t DROP COLUMN b"), seq = 18L) === Seq("t"))
  }

  test("db-qualified RENAME resolves each side independently (ADVICE r2)") {
    val r = new SchemaRegistry("maindb")
    r.applySql("maindb", "CREATE TABLE a (id int, PRIMARY KEY(id))")
    r.applySql("archive", "CREATE TABLE old (id int, PRIMARY KEY(id))")
    // unqualified side resolves against the event db; qualified side wins
    r.applyDdl("maindb", DdlParser.parse("RENAME TABLE a TO archive.a_moved"))
    assert(!r.contains("maindb", "a"))
    assert(r.contains("archive", "a_moved"))
    // fully qualified, applied from an unrelated event db
    r.applyDdl("elsewhere",
      DdlParser.parse("RENAME TABLE archive.a_moved TO archive.a_back"))
    assert(r.contains("archive", "a_back"))
  }
}
