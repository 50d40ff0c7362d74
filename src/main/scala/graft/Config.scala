package graft

import graft.types.MySqlType

/** Engine settings — the subset of the reference's YAML `Settings`
  * (config.py:133-238, 261-328) that affects data semantics:
  * db/table glob filtering, target renames, type overrides.
  */
final case class GraftConfig(
    includeDatabases: Seq[String] = Nil,  // fnmatch globs; empty = all
    excludeDatabases: Seq[String] = Nil,
    includeTables: Seq[String] = Nil,
    excludeTables: Seq[String] = Nil,
    targetDatabases: Map[String, String] = Map.empty, // db → renamed db
    targetTables: Map[String, String] = Map.empty,    // "db.table" → name
    typesMapping: Map[String, MySqlType] = Map.empty, // e.g. char(36) → MUuid
    mysqlTimezone: String = "UTC",
    /** Drop REMOVE events instead of tombstoning — the target accumulates
      * every row ever seen (config.py `ignore_deletes`;
      * tests/test_mysql_ch_replicator.py:572-641). */
    ignoreDeletes: Boolean = false,
    /** Start realtime replication without the initial bulk snapshot
      * (config.py `initial_replication` / the `--initial_only=False` skip
      * path; tests/test_mysql_ch_replicator.py:643-695). */
    skipInitialReplication: Boolean = false) {

  /** fnmatch-style glob → anchored regex (config.py:261-282 uses
    * fnmatch; `*` and `?` only, everything else literal). */
  private def globRegex(g: String): String =
    "(?s)^" + g.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  private def matches(globs: Seq[String], s: String): Boolean =
    globs.exists(g => s.matches(globRegex(g)))

  def databaseMatches(db: String): Boolean =
    (includeDatabases.isEmpty || matches(includeDatabases, db)) &&
      !matches(excludeDatabases, db)

  def tableMatches(table: String): Boolean =
    (includeTables.isEmpty || matches(includeTables, table)) &&
      !matches(excludeTables, table)

  def targetDatabase(db: String): String =
    targetDatabases.getOrElse(db, db)

  def targetTable(db: String, table: String): String =
    targetTables.getOrElse(s"$db.$table", table)
}
