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
}
