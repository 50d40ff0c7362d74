package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Round-robin OPTIMIZE policy (db_optimizer.py:57-113 analogue). */
class CompactorSpec extends SparkSpec {
  import spark.implicits._

  test("least-recently-compacted first, interval guard, live table set") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def mk(): GraftTable = {
      val t = GraftTable(spark, tmpDir("graft-cmp"), Seq("id"), schema)
      t.append(Seq((1L, "a")).toDF("id", "v"), 1)
      t.append(Seq((1L, "b")).toDF("id", "v"), 2)
      t
    }
    val ta = mk(); val tb = mk()
    var known = Seq(("db", "a") -> ta, ("db", "b") -> tb)
    var now = 1000L
    val c = new Compactor(() => known.map(_._1), k => known.toMap.apply(k),
      interval = 100L, clock = () => now)

    assert(c.tick() === Some(("db", "a"))) // insertion order first
    assert(ta.log.count() === 1)           // actually compacted
    assert(c.tick() === Some(("db", "b")))
    assert(c.tick() === None)              // everything fresh
    now += 150
    assert(c.tick() === Some(("db", "a"))) // interval elapsed, oldest first
    // a table created later joins the rotation immediately
    val tc = mk()
    known = known :+ (("db", "c") -> tc)
    assert(c.tick() === Some(("db", "c")))
    assert(c.tick() === Some(("db", "b")))
    assert(c.tick() === None)
  }
}
