package graft.ddl

import scala.collection.mutable

/** In-memory catalog of replicated table schemas, mutated by DDL events in
  * offset order — the Spark-side twin of the reference's per-database
  * `(mysql, clickhouse) TableStructure` state map
  * (db_replicator.py:43, 60, 66-79; table mutation converter.py:851-1189).
  *
  * Deliberately driver-side and tiny: schema state is per-table metadata,
  * not data. Executors only ever see the immutable `TableSchema`/
  * `StructType` snapshots taken when a batch is planned.
  */
final class SchemaRegistry {
  private val tables = mutable.LinkedHashMap.empty[String, TableSchema]

  def get(name: String): Option[TableSchema] = tables.get(name)
  def apply(name: String): TableSchema =
    tables.getOrElse(name, throw new NoSuchElementException(s"unknown table '$name'"))
  def contains(name: String): Boolean = tables.contains(name)
  def tableNames: Seq[String] = tables.keys.toSeq

  /** Apply one DDL statement; returns the affected table names. */
  def applyDdl(op: DdlOp): Seq[String] = op match {
    case DdlOp.CreateTable(_, schema) =>
      if (tables.contains(schema.name) && schema.ifNotExists) Nil
      else { tables(schema.name) = schema; Seq(schema.name) }
    case DdlOp.CreateTableLike(_, t, _, src, ifNotExists) =>
      if (tables.contains(t) && ifNotExists) Nil
      else {
        val s = apply(src)
        tables(t) = s.copy(name = t)
        Seq(t)
      }
    case DdlOp.AlterTable(_, t, ops) =>
      var schema = apply(t)
      ops.foreach {
        case AlterOp.AddColumn(f, pos) => schema = schema.addColumn(f, pos)
        case AlterOp.DropColumn(c) => schema = schema.dropColumn(c)
        case AlterOp.ModifyColumn(f, pos) => schema = schema.modifyColumn(f, pos)
        case AlterOp.ChangeColumn(from, f, pos) =>
          schema = schema.changeColumn(from, f)
          pos.foreach { p =>
            val moved = schema.fields(schema.fieldIndex(f.name))
            schema = schema.copy(fields =
              schema.fields.patch(schema.fieldIndex(f.name), Nil, 1))
              .addColumn(moved, p)
          }
        case AlterOp.RenameColumn(from, to) => schema = schema.renameColumn(from, to)
        case AlterOp.Noop => ()
      }
      tables(t) = schema
      Seq(t)
    case DdlOp.DropTable(_, t, ifExists) =>
      if (!tables.contains(t) && !ifExists)
        throw new NoSuchElementException(s"DROP TABLE: unknown '$t'")
      tables.remove(t).map(_ => t).toSeq
    case DdlOp.RenameTable(renames) =>
      renames.flatMap { case (from, to) =>
        tables.remove(from) match {
          case Some(s) => tables(to) = s.copy(name = to); Seq(from, to)
          case None => throw new NoSuchElementException(s"RENAME: unknown '$from'")
        }
      }
    case DdlOp.TruncateTable(_, t) => Seq(t) // data op; schema unchanged
    case DdlOp.Ignored => Nil
  }

  def applySql(sql: String): Seq[String] = applyDdl(DdlParser.parse(sql))
}
