package graft.operators

import scala.collection.mutable

/** S11 — the OPTIMIZE scheduler.
  *
  * The reference's db_optimizer walks all replicated tables in a loop,
  * OPTIMIZE-ing the least-recently-processed one each tick, with an
  * interval guard so a small deployment isn't compacted continuously
  * (db_optimizer.py:57-113). Same policy here over [[GraftTable.compact]]:
  * the driver (or a scheduler thread the caller owns) calls `tick()`;
  * each call compacts at most one table — compaction is a full
  * rewrite-and-swap, so spacing them out bounds the background write
  * amplification exactly like the reference's one-OPTIMIZE-at-a-time
  * loop.
  *
  * @param tables   current replicated table keys (live view — new tables
  *                 join the rotation automatically)
  * @param handleOf table key → storage handle
  * @param interval minimum time between two compactions of the SAME
  *                 table (reference `optimize_interval`, default 1 day)
  * @param clock    injectable for tests
  */
final class Compactor(
    tables: () => Seq[(String, String)],
    handleOf: ((String, String)) => GraftTable,
    interval: Long = 24L * 3600 * 1000,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val lastRun = mutable.Map.empty[(String, String), Long]
  private val lastSig = mutable.Map.empty[(String, String), Long]

  /** Compact the least-recently-compacted CHANGED table whose interval
    * elapsed. Returns the table compacted, None when everything is
    * fresh or idle.
    *
    * Churn guard: an idle table's FINAL materialization is exactly what
    * the last compaction wrote — rewriting it again is pure write
    * amplification (at 100 TB, a daily full rewrite of a table nobody
    * touched). One metadata listing decides — the fingerprint of
    * (epoch, generation, file names + lengths), so TRUNCATE-reloads and
    * metadata-only generation changes re-arm compaction even when the
    * bare file COUNT happens to come back equal. A skipped idle table
    * re-arms its interval, so a quiet table costs one listing per
    * interval, not one per tick. */
  def tick(): Option[(String, String)] = {
    val now = clock()
    val due = tables()
      .filter(k => now - lastRun.getOrElse(k, Long.MinValue / 2) >= interval)
      .sortBy(k => lastRun.getOrElse(k, Long.MinValue))
    val changed = due.find { k =>
      val busy = lastSig.get(k).forall(_ != handleOf(k).compactionSignature)
      if (!busy) lastRun(k) = now
      busy
    }
    changed.map { k =>
      // compact() returns the signature read under ITS lock: a staged
      // publish interleaving here must not get folded into the idle
      // baseline unseen
      lastSig(k) = handleOf(k).compact()
      lastRun(k) = now
      k
    }
  }
}
