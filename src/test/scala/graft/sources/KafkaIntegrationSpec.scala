package graft.sources

import graft.SparkSpec

/** Live-Kafka integration for the transport seam: the REAL
  * `format("kafka")` Structured Streaming source feeding
  * [[EnvelopeIngest.streamSink]], against a real broker.
  *
  * The sandbox has neither a broker nor the Kafka jars (no
  * `spark-sql-kafka` connector, no `kafka-clients` — zero egress, and
  * `/opt/spark/jars` ships without them), so every test here is
  * env-gated exactly like [[MySqlIntegrationSpec]]: set
  * `KAFKA_BOOTSTRAP` to a broker's `host:port` AND put
  * `spark-sql-kafka-0-10_2.13` + `kafka-clients` (plus
  * `spark-token-provider-kafka-0-10` and `commons-pool2`, the
  * connector's own deps) on the classpath, e.g.:
  *
  * {{{
  * $ kafka-server-start.sh config/kraft/server.properties   # KRaft, no ZK
  * $ KAFKA_BOOTSTRAP=127.0.0.1:9092 sbt \
  *     'set Test/unmanagedJars ++= Seq(.../spark-sql-kafka...jar, ...)' \
  *     "testOnly graft.sources.KafkaIntegrationSpec"
  * }}}
  *
  * The spec itself references Kafka ONLY through runtime strings
  * (`format("kafka")`) and reflection (producer/admin), so it compiles
  * and cancels cleanly when the jars are absent.
  *
  * What it pins that the MemoryStream seam specs cannot: the
  * connector's real `value`/`partition`/`offset` column shapes and
  * BINARY `value` encoding reach the seam unchanged, real broker
  * offsets (not synthetic ones) land in the persisted cursor JSON, and
  * the cursor round-trips through the connector's `startingOffsets`
  * offset-JSON dialect on a restart — resuming exactly after the last
  * ingested record with no duplicates and no loss.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val bootstrap = sys.env.get("KAFKA_BOOTSTRAP")

  private def hasClass(n: String): Boolean =
    try { Class.forName(n); true }
    catch { case _: Throwable => false }

  private lazy val kafkaReady =
    bootstrap.isDefined &&
      hasClass("org.apache.kafka.clients.producer.KafkaProducer") &&
      hasClass("org.apache.spark.sql.kafka010.KafkaSourceProvider")

  private def gate(): Unit =
    assume(kafkaReady, "KAFKA_BOOTSTRAP not set or Kafka jars absent — " +
      "live-Kafka test skipped")

  // ---- reflection shims (compile without kafka-clients) ----

  private def clientProps(extra: (String, String)*): java.util.Properties = {
    val p = new java.util.Properties()
    p.put("bootstrap.servers", bootstrap.get)
    extra.foreach { case (k, v) => p.put(k, v) }
    p
  }

  /** Create `topic` with `partitions` partitions via AdminClient and
    * wait for completion. */
  private def createTopic(topic: String, partitions: Int): Unit = {
    val acls = Class.forName("org.apache.kafka.clients.admin.AdminClient")
    val admin = acls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, clientProps())
    try {
      val ntCls = Class.forName("org.apache.kafka.clients.admin.NewTopic")
      val nt = ntCls
        .getConstructor(classOf[String], classOf[Int], classOf[Short])
        .newInstance(topic, Int.box(partitions), Short.box(1))
      val result = admin.getClass
        .getMethod("createTopics", classOf[java.util.Collection[_]])
        .invoke(admin, java.util.Collections.singletonList(nt))
      val fut = result.getClass.getMethod("all").invoke(result)
      fut.getClass.getMethod("get").invoke(fut) // block until created
    } finally admin.getClass.getMethod("close").invoke(admin)
    ()
  }

  /** Produce (partition, value) records in order and flush. */
  private def produce(topic: String,
                      records: Seq[(Int, String)]): Unit = {
    val pcls =
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val rcls =
      Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val ser = "org.apache.kafka.common.serialization.StringSerializer"
    val producer = pcls.getConstructor(classOf[java.util.Properties])
      .newInstance(clientProps(
        "key.serializer" -> ser, "value.serializer" -> ser))
    try {
      val ctor = rcls.getConstructor(classOf[String], classOf[Integer],
        classOf[Object], classOf[Object])
      val send = pcls.getMethod("send", rcls)
      records.foreach { case (p, v) =>
        send.invoke(producer,
          ctor.newInstance(topic, Int.box(p), null, v)
            .asInstanceOf[AnyRef])
      }
      pcls.getMethod("flush").invoke(producer)
    } finally pcls.getMethod("close").invoke(producer)
    ()
  }

  // ---- shared fixtures (same golden corpus as the seam specs) ----

  private def goldenMysqlLines: Seq[String] = {
    val res = getClass.getResourceAsStream(
      "/debezium/golden-mysql-connector.jsonl")
    assert(res != null, "golden-mysql-connector.jsonl resource missing")
    val bytes = try res.readAllBytes() finally res.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  private def seamCfg(spool: String): graft.GraftConfig =
    graft.GraftConfig.fromYaml(
      s"""databases: 'inventory'
         |binlog_replicator:
         |  data_dir: '$spool'
         |""".stripMargin, Map.empty)

  private def spoolLines(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.getName).toSeq
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().toList finally src.close()
      }

  /** One AvailableNow pass of the real Kafka source into the seam. */
  private def drain(topic: String, producer: SpoolProducer,
                    startingOffsets: String, ckpt: String): Unit = {
    val frames = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
    val q = frames.writeStream
      .foreachBatch(EnvelopeIngest.streamSink(producer))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  test("kafka: real source frames land the tailer-identical spool and " +
      "real broker offsets in the cursor") {
    gate()
    val topic = s"graft-seam-${System.nanoTime()}"
    createTopic(topic, partitions = 2)
    val lines = goldenMysqlLines
    val half = lines.size / 2
    // interleave across partitions so (partition, offset) ordering —
    // not arrival order — reconstructs the corpus. Broker offsets are
    // assigned in PRODUCE order per partition, so each partition's
    // records must be sent in corpus order (alternating BETWEEN
    // partitions is what scrambles arrival): p0 = first half in
    // order, p1 = second half in order, sends zipped alternately.
    val p0 = lines.take(half).map((0, _))
    val p1 = lines.drop(half).map((1, _))
    val interleaved = p0.map(Some(_)).zipAll(p1.map(Some(_)), None, None)
      .flatMap { case (a, b) => Seq(a, b).flatten }
    assert(interleaved.map(_._2) != lines, "interleave should reorder sends")
    produce(topic, interleaved)
    // path A: the dump-file tailer over the same corpus
    val dumpA = tmpDir("kafka-it-dump")
    val spoolA = tmpDir("kafka-it-spool-a")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dumpA, "c.jsonl"),
      (lines.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val producerA = new SpoolProducer(spoolA, seamCfg(spoolA))
    assert(new DebeziumTail(dumpA, producerA).tick() > 0)
    // path B: the real connector → seam
    val spoolB = tmpDir("kafka-it-spool-b")
    val producerB = new SpoolProducer(spoolB, seamCfg(spoolB))
    drain(topic, producerB, "earliest", tmpDir("kafka-it-ckpt"))
    assert(spoolLines(spoolB) === spoolLines(spoolA),
      "real-Kafka ingest diverged from the tailer's spool")
    // fresh topic → broker offsets start at 0: cursor is count-per-
    // partition, proving REAL offsets (not row positions) were read
    val wantCursor = s"""{"0":$half,"1":${lines.size - half}}"""
    assert(producerB.sourcePos === Some(wantCursor))
  }

  test("kafka: restart resumes from the persisted cursor through " +
      "startingOffsets — exactly once, no loss") {
    gate()
    val topic = s"graft-resume-${System.nanoTime()}"
    createTopic(topic, partitions = 2)
    val lines = goldenMysqlLines
    val (wave1, wave2) = lines.splitAt(lines.size / 2)
    val spool = tmpDir("kafka-rs-spool")
    val producer = new SpoolProducer(spool, seamCfg(spool))
    produce(topic, wave1.zipWithIndex.map { case (l, i) => (i % 2, l) })
    drain(topic, producer, "earliest", tmpDir("kafka-rs-ckpt1"))
    val afterWave1 = spoolLines(spool)
    // the persisted cursor is the seam's own resume coordinate: render
    // it in the connector's startingOffsets JSON dialect and restart
    // with a FRESH checkpoint — dedup must come from the cursor alone
    val cursor = producer.sourcePos.getOrElse(fail("no cursor persisted"))
    val starting = s"""{"$topic":$cursor}"""
    produce(topic, wave2.zipWithIndex.map { case (l, i) => (i % 2, l) })
    drain(topic, producer, starting, tmpDir("kafka-rs-ckpt2"))
    val after = spoolLines(spool)
    assert(after.size === afterWave1.size + wave2.size,
      "resume duplicated or dropped records")
    assert(after.take(afterWave1.size) === afterWave1)
  }
}
