package graft.ddl

import graft.types.{MySqlType, TypeParser}
import org.apache.spark.sql.types._

/** One column: the Spark-side twin of the reference's `TableField`
  * (table_structure.py:5-10) — except the type is a parsed ADT, not the
  * raw MySQL string (the string is kept for round-tripping).
  *
  * `id` is a stable per-table column identity assigned by the
  * SchemaRegistry (-1 until registered, monotone, never reused). It is
  * what lets the storage layer read files written before a CHANGE/RENAME
  * COLUMN under the column's current name — names change, ids don't.
  */
final case class FieldSchema(
    name: String,
    tpe: MySqlType,
    sourceType: String,
    nullable: Boolean = true,
    defaultExpr: Option[String] = None,
    id: Int = -1) {

  def toStructField: StructField =
    StructField(name, MySqlType.toSpark(tpe), nullable,
      MySqlType.metadata(tpe, sourceType))
}

/** Table schema + PK info: the reference's `TableStructure`
  * (table_structure.py:12-26). Field order is load-bearing — CDC row
  * payloads are positional, and ALTER ... FIRST/AFTER must keep our order
  * in lock-step with MySQL's (SURVEY.md §7 risks).
  */
/** `idCounter` = highest column id ever assigned in this table (maintained
  * by the SchemaRegistry; ids are never reused after DROP so storage
  * generations can't alias a re-added column onto dropped data). */
final case class TableSchema(
    name: String,
    fields: Vector[FieldSchema],
    primaryKeys: Seq[String],
    charset: Option[String] = None,
    ifNotExists: Boolean = false,
    idCounter: Int = -1) {

  def toStructType: StructType = StructType(fields.map(_.toStructField))

  def fieldIndex(col: String): Int = {
    val i = fields.indexWhere(_.name == col)
    require(i >= 0, s"no column '$col' in table '$name'")
    i
  }

  def primaryKeyIds: Seq[Int] = primaryKeys.map(fieldIndex)

  // --- ALTER application (reference table_structure.py:28-59,
  //     converter.py:851-1189) ---

  def addColumn(f: FieldSchema, pos: ColumnPosition): TableSchema = {
    require(!fields.exists(_.name == f.name), s"duplicate column ${f.name}")
    val idx = pos match {
      case ColumnPosition.Last => fields.length
      case ColumnPosition.First => 0
      case ColumnPosition.After(c) => fieldIndex(c) + 1
    }
    copy(fields = (fields.take(idx) :+ f) ++ fields.drop(idx))
  }

  def dropColumn(col: String): TableSchema = {
    val i = fieldIndex(col)
    require(!primaryKeys.contains(col), s"cannot drop PK column $col")
    copy(fields = fields.patch(i, Nil, 1))
  }

  def modifyColumn(f: FieldSchema, pos: Option[ColumnPosition]): TableSchema = {
    val i = fieldIndex(f.name)
    val without = copy(fields = fields.patch(i, Nil, 1))
    pos match {
      case Some(p) => without.addColumn(f, p)
      case None => copy(fields = fields.updated(i, f))
    }
  }

  def renameColumn(from: String, to: String): TableSchema = {
    val i = fieldIndex(from)
    copy(
      fields = fields.updated(i, fields(i).copy(name = to)),
      primaryKeys = primaryKeys.map(pk => if (pk == from) to else pk))
  }

  /** CHANGE old new type...: rename + retype in one op. */
  def changeColumn(from: String, f: FieldSchema): TableSchema = {
    val i = fieldIndex(from)
    copy(
      fields = fields.updated(i, f),
      primaryKeys = primaryKeys.map(pk => if (pk == from) f.name else pk))
  }
}

object TableSchema {
  /** PK inference (converter.py:1515-1571): explicit PRIMARY KEY clause >
    * per-column `primary key` > a column literally named `id` > error.
    */
  def inferPrimaryKeys(fields: Seq[FieldSchema], explicit: Seq[String],
                       perColumn: Seq[String], table: String): Seq[String] = {
    if (explicit.nonEmpty) explicit
    else if (perColumn.nonEmpty) perColumn
    else if (fields.exists(_.name == "id")) Seq("id")
    else throw new IllegalArgumentException(
      s"table '$table': no primary key (explicit clause, column attribute, or 'id' column required)")
  }
}

sealed trait ColumnPosition
object ColumnPosition {
  case object First extends ColumnPosition
  final case class After(col: String) extends ColumnPosition
  case object Last extends ColumnPosition
}

/** Parsed DDL statements (SURVEY.md §2.10). */
sealed trait DdlOp
object DdlOp {
  final case class CreateTable(db: Option[String], schema: TableSchema) extends DdlOp
  final case class CreateTableLike(db: Option[String], table: String,
                                   srcDb: Option[String], srcTable: String,
                                   ifNotExists: Boolean) extends DdlOp
  final case class AlterTable(db: Option[String], table: String,
                              ops: Seq[AlterOp]) extends DdlOp
  /** DROP TABLE [IF EXISTS] [db.]a[, [db.]b ...] — every listed table
    * drops (a common binlog statement form; keeping only the head would
    * leave the rest registered and serving stale data forever). */
  final case class DropTable(tables: Seq[(Option[String], String)],
                             ifExists: Boolean) extends DdlOp
  /** RENAME TABLE [db.]a TO [db.]b[, ...] — qualifiers kept so a rename
    * arriving from a binlog session whose default db differs still
    * resolves (ADVICE r2); unqualified sides resolve against the event db. */
  final case class RenameTable(
      renames: Seq[((Option[String], String), (Option[String], String))]) extends DdlOp
  final case class TruncateTable(db: Option[String], table: String) extends DdlOp
  /** Statements the replicator ignores (CREATE INDEX, BEGIN, analyze...). */
  case object Ignored extends DdlOp
}

sealed trait AlterOp
object AlterOp {
  /** `ifNotExists`/`ifExists`: MariaDB's conditional ALTER dialect
    * (`ADD COLUMN IF NOT EXISTS`, `DROP COLUMN IF EXISTS`) — the apply
    * side skips the op instead of failing when the condition holds. */
  final case class AddColumn(field: FieldSchema, pos: ColumnPosition,
                             ifNotExists: Boolean = false) extends AlterOp
  final case class DropColumn(name: String,
                              ifExists: Boolean = false) extends AlterOp
  final case class ModifyColumn(field: FieldSchema, pos: Option[ColumnPosition]) extends AlterOp
  final case class ChangeColumn(from: String, field: FieldSchema,
                                pos: Option[ColumnPosition]) extends AlterOp
  final case class RenameColumn(from: String, to: String) extends AlterOp
  /** ADD/DROP INDEX/KEY/CONSTRAINT etc — parsed and discarded
    * (converter.py:739-787 no-op list). */
  case object Noop extends AlterOp
}
