package graft.sources

import graft.SparkSpec

/** Spool rotation + retention — the `binlog_replicator.records_per_file`
  * / `binlog_retention_period` behaviors (reference config.py:113-114,
  * binlog_replicator.py:270-298) driven from the reference's YAML shape.
  */
class EventSpoolSpec extends SparkSpec {

  private def lines(n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i =>
      EventSpool.eventJson(i.toLong, "d", "t", EventSpool.OpAdd,
        row = Some(s"""{"pk":"$i"}""")))

  test("writeRotating splits at records_per_file and numbers onward") {
    val cfg = graft.GraftConfig.fromYaml(
      """binlog_replicator:
        |  data_dir: 'unused'
        |  records_per_file: 4
        |""".stripMargin, Map.empty)
    val spool = tmpDir("graft-spool-rot")
    val first = EventSpool.writeRotating(spool, lines(10),
      cfg.spoolRecordsPerFile)
    assert(first === Seq("000001.json", "000002.json", "000003.json"))
    // a later append continues the numbering from the existing files
    val second = EventSpool.writeRotating(spool, lines(5, from = 10),
      cfg.spoolRecordsPerFile)
    assert(second === Seq("000004.json", "000005.json"))
    // every record lands exactly once, in seq order per file
    val all = EventSpool.readBatch(spark, spool)
    assert(all.count() === 15)
    assert(all.select("seq").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 15L))
    // rotation bound respected
    import java.nio.file.{Files, Paths}
    first.init.foreach { f =>
      assert(Files.readAllLines(Paths.get(spool, f)).size === 4)
    }
  }

  test("producer rotation works through a file:-scheme Hadoop path") {
    // the producer half honors the same Hadoop-FS contract as the
    // sweeper: an explicit scheme'd URI (the shape an HDFS/S3 spool dir
    // takes) must list existing files for numbering, stage+rename
    // publish, and stay readable by the consumer side
    val local = tmpDir("graft-spool-hfs")
    val spool = s"file://$local"
    val first = EventSpool.writeRotating(spool, lines(6), 4)
    assert(first === Seq("000001.json", "000002.json"))
    // numbering continues from the scheme'd listing — a java.io
    // producer would see nothing here and restart at 000001,
    // overwriting live files
    val second = EventSpool.writeRotating(spool, lines(3, from = 6), 4)
    assert(second === Seq("000003.json"))
    assert(EventSpool.readBatch(spark, spool).count() === 9)
    // no staging temp survives the publish renames
    val leftover = new java.io.File(local).list().filter(_.contains(".tmp"))
    assert(leftover.isEmpty, leftover.mkString(","))
    // and the sweeper agrees about the same scheme'd dir
    assert(EventSpool.sweepRetention(spool, retentionSeconds = 1,
      nowMs = System.currentTimeMillis() + 3600L * 1000L, preserve = 0) === 2)
  }

  test("sweepRetention deletes aged files, preserves the replay window") {
    val spool = tmpDir("graft-spool-ret")
    val names = EventSpool.writeRotating(spool, lines(40), 4) // 10 files
    val now = System.currentTimeMillis()
    // age the first 8 files beyond the retention period
    names.take(8).foreach { f =>
      new java.io.File(spool, f).setLastModified(now - 100000L * 1000L)
    }
    val deleted = EventSpool.sweepRetention(spool, retentionSeconds = 43200,
      nowMs = now)
    // newest (preserve=5 + in-progress 1) = 6 files survive regardless of
    // age; of the 4 sweepable aged files, all 4 go
    assert(deleted === 4)
    val left = new java.io.File(spool).list().filter(_.endsWith(".json"))
      .sorted.toSeq
    assert(left === names.drop(4))
    // nothing young is ever deleted
    assert(EventSpool.sweepRetention(spool, 43200, now) === 0)
  }
}
