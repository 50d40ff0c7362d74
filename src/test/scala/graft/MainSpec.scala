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

    val (pipeline, query, monitor) =
      Main.run(spark, config, "shop", wh, tmpDir("main-ckpt"))
    try query.processAllAvailable() finally query.stop()
    spark.streams.removeListener(monitor)

    assert(pipeline.table("shop", "users").read.collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((1, "ann")))
    // registry state persisted for the next start
    assert(new java.io.File(s"$wh/_state/shop.json").isFile)
    val reloaded = new graft.ddl.SchemaRegistry("shop",
      Some(s"$wh/_state/shop.json"))
    assert(reloaded.contains("shop", "users"))
  }
}
