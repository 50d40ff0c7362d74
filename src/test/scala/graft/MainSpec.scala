package graft

import graft.sources.EventSpool
import graft.sources.EventSpool.{eventJson, writeFile, OpAdd, OpQuery}

/** Config-driven bootstrap smoke: YAML → registry state → stream; a
  * brand-new deployment creates its tables from replicated DDL and the
  * registry state file survives for the next start.
  */
class MainSpec extends SparkSpec {

  test("run(): spool-only deployment bootstraps from DDL and persists state") {
    val spool = tmpDir("main-spool")
    val wh = tmpDir("main-wh")
    val config = GraftConfig.fromYaml(
      s"""databases: '*'
         |binlog_replicator:
         |  data_dir: '$spool'
         |""".stripMargin)
    writeFile(spool, "000001.json", Seq(
      eventJson(1, "shop", "users", OpQuery, query = Some(
        "CREATE TABLE users (id int NOT NULL, name varchar(50), PRIMARY KEY(id))")),
      eventJson(2, "shop", "users", OpAdd,
        row = Some("""{"id":"1","name":"ann"}"""))))

    val running = Main.run(spark, config, "shop", wh, tmpDir("main-ckpt"))
    val (pipeline, query) = (running.pipeline, running.holder.get)
    assert(running.server.isEmpty) // no http_host → endpoint disabled
    try query.processAllAvailable() finally query.stop()
    spark.streams.removeListener(running.monitor)

    assert(pipeline.table("shop", "users").read.collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((1, "ann")))
    // registry state persisted for the next start
    assert(new java.io.File(s"$wh/_state/shop.json").isFile)
    val reloaded = new graft.ddl.SchemaRegistry("shop",
      Some(s"$wh/_state/shop.json"))
    assert(reloaded.contains("shop", "users"))
  }

  test("http endpoint: /health + /metrics serve lag, /restart_replication swaps the query") {
    val spool = tmpDir("main-spool-http")
    val wh = tmpDir("main-wh-http")
    val config = GraftConfig.fromYaml(
      s"""databases: '*'
         |http_host: '127.0.0.1'
         |http_port: 0
         |binlog_replicator:
         |  data_dir: '$spool'
         |""".stripMargin)
    writeFile(spool, "000001.json", Seq(
      eventJson(1, "shop", "users", OpQuery, query = Some(
        "CREATE TABLE users (id int NOT NULL, name varchar(50), PRIMARY KEY(id))")),
      eventJson(2, "shop", "users", OpAdd,
        row = Some("""{"id":"1","name":"ann"}"""))))

    val running = Main.run(spark, config, "shop", wh, tmpDir("main-ckpt-http"))
    val (pipeline, holder, server) =
      (running.pipeline, running.holder, running.server)
    def get(path: String): (Int, String) = {
      val url = java.net.URI
        .create(s"http://127.0.0.1:${server.get.port}$path").toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val in = if (code < 400) conn.getInputStream else conn.getErrorStream
      val body = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      (code, body)
    }
    try {
      holder.get.processAllAvailable()
      val (hc, hb) = get("/health")
      assert(hc === 200 && hb.contains("\"status\":\"ok\""))
      val (mc, mb) = get("/metrics")
      assert(mc === 200 && mb.contains("lag_seconds") &&
        mb.contains("batch_id"))
      // control route: stops the query, starts a fresh one on the same
      // checkpoint — replication continues from where it left off
      val before = holder.get
      val (rc, rb) = get("/restart_replication")
      assert(rc === 200 && rb.contains("true"))
      running.awaitRestartSettled() // supervisor protocol: settle first
      assert(holder.get ne before)
      writeFile(spool, "000002.json", Seq(
        eventJson(3, "shop", "users", OpAdd,
          row = Some("""{"id":"2","name":"bob"}"""))))
      holder.get.processAllAvailable()
      assert(pipeline.table("shop", "users").read.collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet ===
        Set((1, "ann"), (2, "bob")))
    } finally {
      holder.get.stop()
      server.foreach(_.stop())
      spark.streams.removeListener(running.monitor)
    }
  }
}
