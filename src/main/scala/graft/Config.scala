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
    /** Start realtime replication without the initial bulk snapshot.
      * The reference accepts this BOTH as the settings-file key
      * `skip_initial_replication` (config.py:206) and as the
      * `--skip_initial_replication` CLI flag (main.py:192); the loader
      * honors the file key, [[graft.Main]] callers pass the flag via
      * config (tests/test_mysql_ch_replicator.py:643-695). */
    skipInitialReplication: Boolean = false,
    /** Source connection (config.py `mysql:` section) — consumed by the
      * bootstrap ([[graft.Main]]) to build [[graft.sources.Snapshot.jdbc]]
      * reads; absent in tests/file-based deployments. */
    mysql: Option[MySqlConn] = None,
    /** Event-spool directory (config.py `binlog_replicator.data_dir`) —
      * where the durable change-event queue lives. */
    spoolDir: Option[String] = None,
    /** Snapshot read parallelism (config.py
      * `initial_replication_threads`); 0 = one partition per core. */
    initialReplicationThreads: Int = 0,
    /** Seconds between two compactions of the same table (config.py
      * `optimize_interval`, default 86400); ≤ 0 disables the background
      * compactor entirely. */
    optimizeInterval: Int = 86400,
    /** HTTP monitoring/control endpoint (config.py:160-161 `http_host` /
      * `http_port`; served by [[graft.streaming.MonitorServer]]); empty
      * host or port 0 with no host disables it, port 0 with a host binds
      * an ephemeral port. */
    httpHost: String = "",
    httpPort: Int = 0,
    /** SQL commands to run against the warehouse after a database's
      * initial replication completes, gated by db globs (config.py
      * `post_initial_replication_commands`,
      * db_replicator_initial.py:472-494). */
    postInitialCommands: Seq[PostInitialCommands] = Nil,
    /** Base value the per-table `_version` counter starts from
      * (config.py:170 `version_initial_value`,
      * clickhouse_api.py:202-205): every stamped version sits strictly
      * above it, so a migrated deployment can stamp over an existing
      * table whose versions already reach N. */
    versionInitialValue: Long = 0L,
    /** Snapshot read batch size (config.py:138
      * `initial_replication_batch_size`, default 50 000): the reference's
      * keyset-page size maps to the JDBC streaming-cursor `fetchsize` —
      * rows per wire round-trip, NOT a pagination unit (shard predicates
      * already bound each read). */
    initialReplicationBatchSize: Int = 50000,
    /** Spool file rotation size (config.py:113
      * `binlog_replicator.records_per_file`, default 100 000): a
      * producer appending via [[graft.sources.EventSpool.writeRotating]]
      * starts a new spool file every N records. */
    spoolRecordsPerFile: Int = 100000,
    /** Spool retention in seconds (config.py:114
      * `binlog_replicator.binlog_retention_period`, default 43 200 =
      * 12 h): fully-rotated spool files older than this are swept after
      * micro-batches (binlog_replicator.py:288-298), the newest files
      * always preserved as the restart replay window. 0 disables the
      * sweep entirely (keep everything — replay-from-zero deployments). */
    spoolRetentionPeriod: Int = 43200,
    /** Spool encoding (`binlog_replicator.format`, a graft extension —
      * the reference's spool is a fixed custom binary): `json` lines
      * (debuggable, the fixture format) or `parquet` (columnar +
      * compressed, ~4× smaller — the at-scale choice). The stream reads
      * whatever the producer writes; this key keeps the two in step
      * from one place. */
    spoolFormat: String = "json") {

  // the reference validates both keys at load time (config.py:120-130);
  // retention additionally admits 0 = "never sweep"
  require(spoolRecordsPerFile > 0,
    "binlog_replicator records_per_file should be positive")
  require(spoolRetentionPeriod >= 0,
    "binlog_replicator binlog_retention_period should be non-negative")
  require(spoolFormat == "json" || spoolFormat == "parquet",
    s"binlog_replicator format should be json or parquet, got '$spoolFormat'")

  def postCommandsFor(db: String): Seq[String] =
    postInitialCommands.filter(p =>
      p.databases.isEmpty || p.databases.exists(g => db.matches(globRegex(g))))
      .flatMap(_.commands)

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

/** One `post_initial_replication_commands` entry (config.py:227-229,
  * 330-337): db glob(s) → SQL command list to run after that database's
  * initial replication completes. */
final case class PostInitialCommands(databases: Seq[String],
                                     commands: Seq[String])

/** Source MySQL connection settings (config.py `mysql:`). */
final case class MySqlConn(host: String, port: Int, user: String,
                           password: String) {
  def jdbcUrl(db: String): String = s"jdbc:mysql://$host:$port/$db"
  def properties: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p
  }
}

object GraftConfig {

  /** Load the reference's YAML settings file (config.py:133-238,
    * example_config.yaml) — the data-semantics subset. Consciously
    * ignored keys, each with a structural reason, so a reference user's
    * config file loads unchanged:
    *  - `clickhouse:` connection — the sink here is the Spark warehouse;
    *  - `indexes` / `partition_bys` / `order_bys` (config.py:154-156) —
    *    ClickHouse physical-DDL overrides; the analogues are fixed by
    *    the engine (PK bucketing = the reference's default partition
    *    expression, parquet row-group min/max = skip indexes, FINAL
    *    ordering = the registry's primary keys);
    *  - `auto_restart_interval` / `check_db_updated_interval` and other
    *    process-supervision cadences — restarts belong to the cluster
    *    manager / the HTTP restart hook, discovery to `Discovery.tick`'s
    *    caller.
    */
  def load(path: String): GraftConfig =
    fromYaml(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def fromYaml(text: String): GraftConfig = fromYaml(text, sys.env)

  /** Env-var overrides after the file parse, mirroring the reference's
    * `_apply_env_overrides` (config.py:240-259): `MYSQL_HOST` / `PORT` /
    * `USER` / `PASSWORD` override (or, with `MYSQL_HOST` alone, create)
    * the source connection — the container-deployment pattern where
    * credentials live in the orchestrator, not the settings file.
    * `env` is injectable for tests. */
  def fromYaml(text: String, env: Map[String, String]): GraftConfig = {
    val parsed = parseYaml(text)
    val base = parsed.mysql.orElse(
      if (env.contains("MYSQL_HOST"))
        Some(MySqlConn("localhost", 3306, "root", ""))
      else None)
    parsed.copy(mysql = base.map(c => c.copy(
      host = env.getOrElse("MYSQL_HOST", c.host),
      port = env.get("MYSQL_PORT").map(_.trim.toInt).getOrElse(c.port),
      user = env.getOrElse("MYSQL_USER", c.user),
      password = env.getOrElse("MYSQL_PASSWORD", c.password))))
  }

  private def parseYaml(text: String): GraftConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readTree(text)
    import scala.jdk.CollectionConverters._
    // `databases`/`tables` accept a glob string OR a list (config.py:233-234)
    def globs(key: String): Seq[String] = root.get(key) match {
      case null => Nil
      case n if n.isArray =>
        n.elements().asScala.map(_.asText()).toSeq.filter(_.nonEmpty)
      case n => Seq(n.asText()).filter(_.nonEmpty)
    }
    def strMap(key: String): Map[String, String] = root.get(key) match {
      case null => Map.empty
      case n => n.fields().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }
    GraftConfig(
      includeDatabases = globs("databases"),
      excludeDatabases = globs("exclude_databases"),
      // reference default tables='*' — same as our "no filter"
      includeTables = globs("tables").filterNot(_ == "*"),
      excludeTables = globs("exclude_tables"),
      targetDatabases = strMap("target_databases"),
      targetTables = strMap("target_tables"),
      typesMapping = strMap("types_mapping").map { case (k, v) =>
        k.toLowerCase -> parseTargetType(v)
      },
      mysqlTimezone = Option(root.get("mysql_timezone"))
        .map(_.asText()).getOrElse("UTC"),
      ignoreDeletes = Option(root.get("ignore_deletes"))
        .exists(_.asBoolean(false)),
      skipInitialReplication = Option(root.get("skip_initial_replication"))
        .exists(_.asBoolean(false)),
      mysql = Option(root.get("mysql")).map { m =>
        MySqlConn(
          host = Option(m.get("host")).map(_.asText()).getOrElse("localhost"),
          port = Option(m.get("port")).map(_.asInt()).getOrElse(3306),
          user = Option(m.get("user")).map(_.asText()).getOrElse("root"),
          password = Option(m.get("password")).map(_.asText()).getOrElse(""))
      },
      spoolDir = Option(root.get("binlog_replicator"))
        .flatMap(b => Option(b.get("data_dir"))).map(_.asText()),
      spoolRecordsPerFile = Option(root.get("binlog_replicator"))
        .flatMap(b => Option(b.get("records_per_file")))
        .map(_.asInt()).getOrElse(100000),
      spoolRetentionPeriod = Option(root.get("binlog_replicator"))
        .flatMap(b => Option(b.get("binlog_retention_period")))
        .map(_.asInt()).getOrElse(43200),
      spoolFormat = Option(root.get("binlog_replicator"))
        .flatMap(b => Option(b.get("format")))
        .map(_.asText()).getOrElse("json"),
      initialReplicationThreads =
        Option(root.get("initial_replication_threads"))
          .map(_.asInt()).getOrElse(0),
      optimizeInterval = Option(root.get("optimize_interval"))
        .map(_.asInt()).getOrElse(86400),
      httpHost = Option(root.get("http_host")).map(_.asText()).getOrElse(""),
      httpPort = Option(root.get("http_port")).map(_.asInt()).getOrElse(0),
      versionInitialValue = Option(root.get("version_initial_value"))
        .map(_.asLong()).getOrElse(0L),
      initialReplicationBatchSize =
        Option(root.get("initial_replication_batch_size"))
          .map(_.asInt()).getOrElse(50000),
      postInitialCommands =
        Option(root.get("post_initial_replication_commands")).toSeq
          .flatMap(_.elements().asScala).map { n =>
            def list(key: String): Seq[String] = n.get(key) match {
              case null => Nil
              case d if d.isArray =>
                d.elements().asScala.map(_.asText()).toSeq.filter(_.nonEmpty)
              case d => Seq(d.asText()).filter(_.nonEmpty)
            }
            PostInitialCommands(list("databases"), list("commands"))
          })
  }

  /** types_mapping values are target type names ('UUID') or MySQL type
    * text; both resolve to the engine's type ADT. */
  private def parseTargetType(v: String): MySqlType = v.trim.toLowerCase match {
    case "uuid" => MySqlType.MUuid
    case other => graft.types.TypeParser.parse(other).tpe
  }
}
