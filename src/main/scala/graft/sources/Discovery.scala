package graft.sources

import graft.GraftConfig
import graft.ddl.SchemaRegistry

/** W8 — dynamic database discovery.
  *
  * The reference's runner polls `SHOW DATABASES` and spawns a replicator
  * for every new database matching the config globs (runner.py:131-149,
  * `RunAllRunner.restart_dead_processes`). Spark-first there is one
  * pipeline, not one process per db, so "spawning" reduces to
  * registering the new database's tables and letting the event-db
  * resolution route its traffic; the poll is a driver-side diff of a
  * listing (a `SHOW DATABASES` JDBC query in production, any listing
  * function here) against what the registry already knows.
  */
object Discovery {

  /** Databases present in `listed`, admitted by the config globs, and not
    * yet known to the registry — the ones a runner tick must set up. */
  def newDatabases(listed: Seq[String], registry: SchemaRegistry,
                   config: GraftConfig): Seq[String] =
    listed.distinct
      .filter(config.databaseMatches)
      .filterNot(db => registry.hasDb(db) || db == registry.defaultDb)

  /** One poll tick: register each newly discovered database's tables via
    * the provided DDL fetcher (production: `SHOW CREATE TABLE` over
    * JDBC). Returns the databases that were registered. */
  def tick(listed: Seq[String], registry: SchemaRegistry,
           config: GraftConfig,
           createTableSql: String => Seq[String]): Seq[String] = {
    val fresh = newDatabases(listed, registry, config)
    fresh.foreach { db =>
      createTableSql(db).foreach { sql =>
        // one unparseable CREATE (PK-less scratch table, exotic form)
        // must not crash the tick: hasDb would stay false and every
        // later poll would re-throw on the same statement — a permanent
        // discovery crash-loop that also skips the db's OTHER tables.
        // Same guard as the realtime loop's parseDdl: skip loudly.
        val op =
          try graft.ddl.DdlParser.parse(sql, config.typesMapping)
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] discovery: skipping unparseable CREATE in $db: " +
                s"${e.getMessage} -- $sql")
            graft.ddl.DdlOp.Ignored
          }
        op match {
          case graft.ddl.DdlOp.CreateTable(_, s)
              if !config.tableMatches(s.name) => () // glob-filtered
          case graft.ddl.DdlOp.Ignored => ()
          case _ => registry.applyDdl(db, op)
        }
      }
    }
    fresh
  }
}
