package graft.sources

import graft.GraftConfig
import graft.ddl.SchemaRegistry
import org.scalatest.funsuite.AnyFunSuite

/** W8 — dynamic database discovery (runner.py:131-149). */
class DiscoverySpec extends AnyFunSuite {

  test("newDatabases: config globs + already-known filtering") {
    val registry = new SchemaRegistry("maindb")
    registry.applySql("CREATE TABLE t (id int, PRIMARY KEY(id))")
    val config = GraftConfig(includeDatabases = Seq("prod*"))
    val listed = Seq("prod1", "prod2", "staging", "maindb", "prod1")
    assert(Discovery.newDatabases(listed, registry, config) ===
      Seq("prod1", "prod2"))
  }

  test("tick registers new databases' tables once, honoring table globs") {
    val registry = new SchemaRegistry("maindb")
    val config = GraftConfig(includeDatabases = Seq("prod*"),
      excludeTables = Seq("tmp*"))
    val ddl = Map(
      "prod1" -> Seq(
        "CREATE TABLE users (id int, PRIMARY KEY(id))",
        "CREATE TABLE tmp_scratch (id int, PRIMARY KEY(id))"))

    val first = Discovery.tick(Seq("prod1", "staging"), registry, config,
      db => ddl.getOrElse(db, Nil))
    assert(first === Seq("prod1"))
    assert(registry.contains("prod1", "users"))
    assert(!registry.contains("prod1", "tmp_scratch")) // glob-filtered
    assert(!registry.hasDb("staging"))

    // second poll: nothing new
    assert(Discovery.tick(Seq("prod1", "staging"), registry, config,
      db => ddl.getOrElse(db, Nil)) === Nil)
  }

  test("one unparseable CREATE skips that table, not the db (no crash loop)") {
    val registry = new SchemaRegistry("maindb")
    val config = GraftConfig(includeDatabases = Seq("prod*"))
    val ddl = Map("prod1" -> Seq(
      "CREATE TABLE broken AS SELECT 1", // unsupported CREATE form
      "CREATE TABLE users (id int, PRIMARY KEY(id))"))
    // the bad statement must not abort the tick: the db registers, the
    // parseable table lands, and the next poll sees nothing new instead
    // of re-throwing forever
    assert(Discovery.tick(Seq("prod1"), registry, config,
      db => ddl.getOrElse(db, Nil)) === Seq("prod1"))
    assert(registry.contains("prod1", "users"))
    assert(!registry.contains("prod1", "broken"))
    assert(Discovery.tick(Seq("prod1"), registry, config,
      db => ddl.getOrElse(db, Nil)) === Nil)
  }
}
