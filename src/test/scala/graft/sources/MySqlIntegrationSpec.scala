package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Live-MySQL integration for [[Snapshot.jdbc]] / [[Snapshot.jdbcShard]].
  *
  * The sandbox has no MySQL server (and no MySQL JDBC driver on the
  * classpath), so every test here is env-gated: set `MYSQL_HOST` (plus
  * optional `MYSQL_PORT`/`MYSQL_USER`/`MYSQL_PASSWORD`/`MYSQL_TEST_DB`/
  * `MYSQL_TEST_TABLE` — defaults `3306`/`root`/``/`test`/`snapshot_probe`)
  * to run them against a real server, e.g.:
  *
  * {{{
  * mysql> CREATE TABLE test.snapshot_probe
  *        (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20));
  * mysql> INSERT INTO test.snapshot_probe
  *        SELECT seq, CONCAT('v', seq) FROM seq_1_to_1000;
  * $ MYSQL_HOST=127.0.0.1 MYSQL_PASSWORD=... sbt \
  *     "testOnly graft.sources.MySqlIntegrationSpec"
  * }}}
  *
  * What they pin that the fixture-DataFrame tests cannot: the CRC32
  * shard predicates are valid MySQL SQL (they run inside the remote
  * WHERE), the shard reads come back disjoint-complete from the server
  * (not from Spark re-filtering), and the configured
  * `initial_replication_batch_size` reaches the JDBC cursor fetchsize.
  */
class MySqlIntegrationSpec extends SparkSpec {

  private val host = sys.env.get("MYSQL_HOST")
  private def conn = graft.MySqlConn(
    host.getOrElse("localhost"),
    sys.env.get("MYSQL_PORT").map(_.toInt).getOrElse(3306),
    sys.env.getOrElse("MYSQL_USER", "root"),
    sys.env.getOrElse("MYSQL_PASSWORD", ""))
  private val db = sys.env.getOrElse("MYSQL_TEST_DB", "test")
  private val table = sys.env.getOrElse("MYSQL_TEST_TABLE", "snapshot_probe")

  test("jdbc: sharded snapshot read is disjoint-complete vs a 1-shard read") {
    assume(host.isDefined, "MYSQL_HOST not set — live-MySQL test skipped")
    val props = conn.properties
    val whole = Snapshot.jdbc(spark, conn.jdbcUrl(db), table,
      Seq("id"), numWorkers = 1, props).collect().toSet
    val sharded = Snapshot.jdbc(spark, conn.jdbcUrl(db), table,
      Seq("id"), numWorkers = 4, conn.properties)
    // 4 partitions, one per remote predicate
    assert(sharded.rdd.getNumPartitions === 4)
    assert(sharded.collect().toSet === whole) // complete, no dup, no loss
  }

  test("jdbcShard: resume shards partition the table; subParts stay inside") {
    assume(host.isDefined, "MYSQL_HOST not set — live-MySQL test skipped")
    val shards = 3
    val perShard = (0 until shards).map { k =>
      Snapshot.jdbcShard(spark, conn.jdbcUrl(db), table, Seq("id"),
        shards, k, subParts = 2, conn.properties)
    }
    perShard.foreach(df => assert(df.rdd.getNumPartitions === 2))
    val union = perShard.map(_.collect().toSet).reduce(_ union _)
    val whole = Snapshot.jdbc(spark, conn.jdbcUrl(db), table,
      Seq("id"), 1, conn.properties).collect().toSet
    assert(perShard.map(_.count()).sum === whole.size) // disjoint
    assert(union === whole)                            // complete
  }

  test("initial_replication_batch_size reaches the JDBC cursor fetchsize") {
    assume(host.isDefined, "MYSQL_HOST not set — live-MySQL test skipped")
    val config = graft.GraftConfig.fromYaml(
      "initial_replication_batch_size: 123\n", Map.empty)
    val props = conn.properties
    props.setProperty("fetchsize", config.initialReplicationBatchSize.toString)
    val df = Snapshot.jdbc(spark, conn.jdbcUrl(db), table, Seq("id"), 2, props)
    // Snapshot.jdbc must pass the configured page size through, not
    // clobber it with its 50000 default, and must turn cursor fetch on
    // (Connector/J ignores a positive fetch size without it)
    assert(props.getProperty("fetchsize") === "123")
    assert(props.getProperty("useCursorFetch") === "true")
    // and the options Spark hands the connector carry both (JDBCRelation
    // is package-private — reflection is the only outside-in probe)
    val rel = df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation
    }.get
    val m = rel.getClass.getMethod("jdbcOptions")
    m.setAccessible(true)
    val opts = m.invoke(rel)
    val ap = opts.getClass.getMethod("asProperties")
    ap.setAccessible(true)
    val p = ap.invoke(opts).asInstanceOf[java.util.Properties]
    assert(p.getProperty("fetchsize") === "123")
    assert(p.getProperty("useCursorFetch") === "true")
    assert(df.count() > 0) // and the read actually pages through
  }

  test("realtime: a live Debezium stream replicates and matches a JDBC read") {
    // The realtime deployment route (README "Live binlog deployment"):
    // a Debezium MySQL connector watches the live server and a consumer
    // dumps its topics as JSON lines into DEBEZIUM_DUMP_DIR. This test
    // tails that dump through the production producer, replicates the
    // spool through the pipeline, and compares the result with a direct
    // JDBC read of the source table — the full wire → spool → warehouse
    // round-trip against real binlog traffic. The dump must contain the
    // table's schema-history CREATE TABLE event (run the consumer with
    // the connector's schema-history topic included).
    assume(host.isDefined, "MYSQL_HOST not set — live-MySQL test skipped")
    val dump = sys.env.get("DEBEZIUM_DUMP_DIR")
    assume(dump.isDefined,
      "DEBEZIUM_DUMP_DIR not set — live-Debezium test skipped")
    val spool = tmpDir("dbz-live-spool")
    val config = graft.GraftConfig.fromYaml(
      s"""databases: '$db'
         |tables: '$table'
         |binlog_replicator:
         |  data_dir: '$spool'
         |""".stripMargin, Map.empty)
    val producer = new SpoolProducer(spool, config)
    val tail = new DebeziumTail(dump.get, producer)
    assert(tail.tick() > 0, s"no admissible events in ${dump.get}")

    val wh = tmpDir("dbz-live-wh")
    val running = graft.Main.run(spark, config, db, wh,
      tmpDir("dbz-live-ckpt"))
    val query = running.holder.get
    try query.processAllAvailable() finally query.stop()
    spark.streams.removeListener(running.monitor)

    val replicated = running.pipeline.table(db, table).read
    val source = spark.read.jdbc(conn.jdbcUrl(db), table, conn.properties)
    // same rows, compared on the source's own columns (the replica adds
    // none; types already converted by the pipeline)
    val cols = source.columns.toSeq
    assert(replicated.selectExpr(cols: _*).collect().map(_.toString).sorted
      .toSeq === source.collect().map(_.toString).sorted.toSeq)
  }
}
