package graft.ddl

import scala.collection.mutable

/** Catalog of replicated table schemas, keyed by (database, table) and
  * mutated by DDL events in offset order — the Spark-side twin of the
  * reference's per-database `(mysql, clickhouse) TableStructure` state
  * map (db_replicator.py:43, 60, 66-79; table mutation
  * converter.py:851-1189). Two source databases with a same-named table
  * are distinct entries (the reference runs one replicator per db).
  *
  * Responsibilities beyond a plain map:
  *  - **column identity**: every field gets a stable `id` at CREATE /
  *    ADD COLUMN time (monotone per table, never reused after DROP).
  *    CHANGE/RENAME/MODIFY preserve the id — the storage layer maps
  *    pre-rename files to current names through it (GraftTable
  *    generations).
  *  - **persistence (W6)**: with a `stateFile`, the full state is
  *    JSON-checkpointed after every applied DDL and reloaded at
  *    construction, so a restarted stream replays against the correct
  *    evolved schema (reference resume: db_replicator.py:213-281).
  *
  * Driver-side and tiny by design: executors only see the immutable
  * `TableSchema` snapshots taken when a batch is planned.
  */
final class SchemaRegistry(
    val defaultDb: String = "default",
    stateFile: Option[String] = None) {

  private val tables = mutable.LinkedHashMap.empty[(String, String), TableSchema]

  /** Highest event seq whose DDL was applied (and checkpointed). The
    * streaming sink is at-least-once: a crash between checkpoint() and the
    * batch commit replays the batch, and re-applying an ALTER against the
    * already-mutated state would throw (duplicate column / missing column)
    * in a permanent crash loop (ADVICE r2). Callers that know the event's
    * total order pass it via `applyDdl(..., seq)`; replayed DDLs at or
    * below this watermark are skipped. Persisted with the tables. */
  private var lastDdlSeqV: Long = Long.MinValue

  stateFile.foreach { f =>
    val st = RegistryStore.load(f)
    st.tables.foreach { case (k, s) => tables(k) = s }
    lastDdlSeqV = st.lastDdlSeq
  }

  def lastDdlSeq: Long = lastDdlSeqV

  /** Is any table registered under `db`? (Routing: an event db with no
    * registrations resolves to `defaultDb`, CdcPipeline.) */
  // Readers run off the streaming thread too — the monitor server's
  // per-request gauges and the discovery scheduler both poll while a
  // micro-batch may be applying DDL. LinkedHashMap is not safe under
  // concurrent read/mutate, so every access shares one monitor; the map
  // is tiny (table count) and mutations are rare (DDL events), so the
  // lock is uncontended in practice.
  def hasDb(db: String): Boolean =
    tables.synchronized(tables.keysIterator.exists(_._1 == db))

  def get(db: String, name: String): Option[TableSchema] =
    tables.synchronized(tables.get((db, name)))
  def get(name: String): Option[TableSchema] = get(defaultDb, name)
  def apply(db: String, name: String): TableSchema =
    tables.synchronized(tables.getOrElse((db, name),
      throw new NoSuchElementException(s"unknown table '$db.$name'")))
  def apply(name: String): TableSchema = apply(defaultDb, name)
  def contains(db: String, name: String): Boolean =
    tables.synchronized(tables.contains((db, name)))
  def contains(name: String): Boolean = contains(defaultDb, name)
  def tableKeys: Seq[(String, String)] =
    tables.synchronized(tables.keys.toSeq)
  def tableNames: Seq[String] =
    tables.synchronized(tables.keys.map(_._2).toSeq)

  private def checkpoint(): Unit =
    stateFile.foreach(f =>
      RegistryStore.save(f, RegistryStore.State(tables.toSeq, lastDdlSeqV)))

  /** Assign fresh ids to a parser-produced schema (CREATE TABLE). */
  private def withIds(s: TableSchema): TableSchema = {
    val fields = s.fields.zipWithIndex.map { case (f, i) => f.copy(id = i) }
    s.copy(fields = fields, idCounter = fields.length - 1)
  }

  /** Apply one DDL statement in database `eventDb` (ops may carry their
    * own qualified db which wins); returns the affected table names. */
  def applyDdl(eventDb: String, op: DdlOp): Seq[String] =
    tables.synchronized {
      val affected = applyDdl0(eventDb, op)
      if (affected.nonEmpty) checkpoint()
      affected
    }

  /** Seq-guarded variant for at-least-once replay (see [[lastDdlSeq]]):
    * a DDL at or below the watermark was already applied — skip it. The
    * watermark advances even for no-op DDLs so it stays monotone. */
  def applyDdl(eventDb: String, op: DdlOp, seq: Long): Seq[String] =
    tables.synchronized {
      if (seq <= lastDdlSeqV) Nil
      else {
        val affected = applyDdl0(eventDb, op)
        lastDdlSeqV = seq
        checkpoint()
        affected
      }
    }

  def applyDdl(op: DdlOp): Seq[String] = applyDdl(defaultDb, op)

  private def applyDdl0(eventDb: String, op: DdlOp): Seq[String] = op match {
    case DdlOp.CreateTable(d0, schema) =>
      val db = d0.getOrElse(eventDb)
      if (tables.contains((db, schema.name)) && schema.ifNotExists) Nil
      else { tables((db, schema.name)) = withIds(schema); Seq(schema.name) }

    case DdlOp.CreateTableLike(d0, t, srcDb0, src, ifNotExists) =>
      val db = d0.getOrElse(eventDb)
      val srcDb = srcDb0.getOrElse(eventDb)
      if (tables.contains((db, t)) && ifNotExists) Nil
      else {
        val s = apply(srcDb, src)
        tables((db, t)) = s.copy(name = t)
        Seq(t)
      }

    case DdlOp.AlterTable(d0, t, ops) =>
      val db = d0.getOrElse(eventDb)
      var schema = apply(db, t)
      ops.foreach {
        case AlterOp.AddColumn(f, pos, ifNotExists) =>
          // MariaDB conditional: present column → the clause is a noop
          if (!(ifNotExists && schema.fields.exists(_.name == f.name))) {
            val id = schema.idCounter + 1
            schema = schema.addColumn(f.copy(id = id), pos)
              .copy(idCounter = id)
          }
        case AlterOp.DropColumn(c, ifExists) =>
          // MariaDB conditional: absent column → the clause is a noop
          if (!(ifExists && !schema.fields.exists(_.name == c)))
            schema = schema.dropColumn(c)
        case AlterOp.ModifyColumn(f, pos) =>
          val keep = schema.fields(schema.fieldIndex(f.name)).id
          schema = schema.modifyColumn(f.copy(id = keep), pos)
        case AlterOp.ChangeColumn(from, f, pos) =>
          val keep = schema.fields(schema.fieldIndex(from)).id
          schema = schema.changeColumn(from, f.copy(id = keep))
          pos.foreach { p =>
            val moved = schema.fields(schema.fieldIndex(f.name))
            schema = schema.copy(fields =
              schema.fields.patch(schema.fieldIndex(f.name), Nil, 1))
              .addColumn(moved, p)
          }
        case AlterOp.RenameColumn(from, to) => schema = schema.renameColumn(from, to)
        case AlterOp.Noop => ()
      }
      tables((db, t)) = schema
      Seq(t)

    case DdlOp.DropTable(ts, ifExists) =>
      ts.flatMap { case (d0, t) =>
        val db = d0.getOrElse(eventDb)
        if (!tables.contains((db, t)) && !ifExists)
          throw new NoSuchElementException(s"DROP TABLE: unknown '$db.$t'")
        tables.remove((db, t)).map(_ => t)
      }

    case DdlOp.RenameTable(renames) =>
      renames.flatMap { case ((fromDb0, from), (toDb0, to)) =>
        val fromDb = fromDb0.getOrElse(eventDb)
        val toDb = toDb0.getOrElse(fromDb)
        tables.remove((fromDb, from)) match {
          case Some(s) => tables((toDb, to)) = s.copy(name = to); Seq(from, to)
          case None => throw new NoSuchElementException(s"RENAME: unknown '$fromDb.$from'")
        }
      }

    case DdlOp.TruncateTable(_, t) => Seq(t) // data op; schema unchanged

    case DdlOp.Ignored => Nil
  }

  def applySql(sql: String): Seq[String] = applyDdl(DdlParser.parse(sql))
  def applySql(db: String, sql: String): Seq[String] =
    applyDdl(db, DdlParser.parse(sql))
}
