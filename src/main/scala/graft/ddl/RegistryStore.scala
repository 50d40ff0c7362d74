package graft.ddl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.types.MySqlType
import graft.types.MySqlType._

import scala.jdk.CollectionConverters._

/** JSON checkpointing of SchemaRegistry state (W6).
  *
  * The reference pickles its dual per-table `TableStructure` map and
  * reloads it on restart (db_replicator.py:43, 60, 66-79) — without it, a
  * resumed stream replays binlog events against the wrong schema. Here
  * the state is a single small JSON file, rewritten atomically
  * (tmp + move) after every applied DDL; schema state is per-table
  * metadata, so the file is KBs even for thousands of tables.
  */
object RegistryStore {

  /** Full checkpointed state: table schemas + the DDL replay watermark
    * (the reference persists schema state together with the binlog
    * position, db_replicator.py:43-60 — without the watermark a replayed
    * ALTER re-applies against mutated state, ADVICE r2). */
  final case class State(
      tables: Seq[((String, String), TableSchema)],
      lastDdlSeq: Long = Long.MinValue)

  private val mapper = new ObjectMapper()

  // Hadoop FS, not java.nio: the state file lives under the warehouse
  // dir, which in production is an hdfs://, s3a://... URI — local-path
  // APIs would silently write driver-local files and a restart on a
  // different node would lose the schemas AND the replay watermark.
  private def hfs(p: Path) = p.getFileSystem(new Configuration())

  def save(file: String, state: State): Unit = {
    val root = mapper.createObjectNode()
    if (state.lastDdlSeq != Long.MinValue)
      root.put("lastDdlSeq", state.lastDdlSeq)
    val arr = root.putArray("tables")
    state.tables.foreach { case ((db, _), schema) => arr.add(tableNode(db, schema)) }
    val path = new Path(file)
    val fs = hfs(path)
    Option(path.getParent).foreach(fs.mkdirs)
    val tmp = new Path(path.getParent, "." + path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // atomic swap (posix + HDFS rename-with-overwrite)
    FileContext.getFileContext(fs.makeQualified(path).toUri, new Configuration())
      .rename(fs.makeQualified(tmp), fs.makeQualified(path),
        Options.Rename.OVERWRITE)
  }

  def load(file: String): State = {
    val p = new Path(file)
    val fs = hfs(p)
    if (!fs.exists(p)) return State(Nil)
    val in = fs.open(p)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    val root = mapper.readTree(bytes)
    val entries = root.get("tables").elements().asScala.map { t =>
      val db = t.get("db").asText()
      val schema = tableFromNode(t)
      ((db, schema.name), schema)
    }.toSeq
    val seq = Option(root.get("lastDdlSeq")).map(_.asLong())
      .getOrElse(Long.MinValue)
    State(entries, seq)
  }

  // ------------------------------------------------------------ to JSON

  private def tableNode(db: String, s: TableSchema): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("db", db)
    n.put("name", s.name)
    s.charset.foreach(n.put("charset", _))
    n.put("idCounter", s.idCounter)
    val pks = n.putArray("primaryKeys")
    s.primaryKeys.foreach(pks.add)
    val fs = n.putArray("fields")
    s.fields.foreach { f =>
      val fn = mapper.createObjectNode()
      fn.put("id", f.id)
      fn.put("name", f.name)
      fn.put("sourceType", f.sourceType)
      fn.put("nullable", f.nullable)
      f.defaultExpr.foreach(fn.put("default", _))
      fn.set[ObjectNode]("type", typeNode(f.tpe))
      fs.add(fn)
    }
    n
  }

  private def typeNode(t: MySqlType): ObjectNode = {
    val n = mapper.createObjectNode()
    def tag(s: String): ObjectNode = { n.put("t", s); n }
    t match {
      case MInt(b, u) => tag("int").put("bytes", b).put("unsigned", u)
      case MBool => tag("bool")
      case MDecimal(p, s) => tag("decimal").put("p", p).put("s", s)
      case MDecimalBare => tag("decimalBare")
      case MFloat => tag("float")
      case MDouble => tag("double")
      case MDate => tag("date")
      case MDateTime(f) => tag("datetime").put("fsp", f)
      case MTimestamp(f) => tag("timestamp").put("fsp", f)
      case MTime => tag("time")
      case MYear => tag("year")
      case MString(cs) => val x = tag("string"); cs.foreach(x.put("charset", _)); x
      case MBinary(len) => val x = tag("binary"); len.foreach(x.put("length", _)); x
      case MBit(b) => tag("bit").put("bits", b)
      case MJson => tag("json")
      case MEnum(vs) => val x = tag("enum"); val a = x.putArray("values"); vs.foreach(a.add); x
      case MSet(vs) => val x = tag("set"); val a = x.putArray("values"); vs.foreach(a.add); x
      case MPoint => tag("point")
      case MPolygon => tag("polygon")
      case MMultiPolygon => tag("multipolygon")
      case MUuid => tag("uuid")
    }
  }

  // ---------------------------------------------------------- from JSON

  private def tableFromNode(t: JsonNode): TableSchema = {
    val fields = t.get("fields").elements().asScala.map { f =>
      FieldSchema(
        name = f.get("name").asText(),
        tpe = typeFromNode(f.get("type")),
        sourceType = f.get("sourceType").asText(),
        nullable = f.get("nullable").asBoolean(),
        defaultExpr = Option(f.get("default")).map(_.asText()),
        id = f.get("id").asInt())
    }.toVector
    TableSchema(
      name = t.get("name").asText(),
      fields = fields,
      primaryKeys = t.get("primaryKeys").elements().asScala.map(_.asText()).toSeq,
      charset = Option(t.get("charset")).map(_.asText()),
      idCounter = t.get("idCounter").asInt())
  }

  private def typeFromNode(n: JsonNode): MySqlType = {
    def values: Seq[String] =
      n.get("values").elements().asScala.map(_.asText()).toSeq
    n.get("t").asText() match {
      case "int" => MInt(n.get("bytes").asInt(), n.get("unsigned").asBoolean())
      case "bool" => MBool
      case "decimal" => MDecimal(n.get("p").asInt(), n.get("s").asInt())
      case "decimalBare" => MDecimalBare
      case "float" => MFloat
      case "double" => MDouble
      case "date" => MDate
      case "datetime" => MDateTime(n.get("fsp").asInt())
      case "timestamp" => MTimestamp(n.get("fsp").asInt())
      case "time" => MTime
      case "year" => MYear
      case "string" => MString(Option(n.get("charset")).map(_.asText()))
      case "binary" => MBinary(Option(n.get("length")).map(_.asInt()))
      case "bit" => MBit(n.get("bits").asInt())
      case "json" => MJson
      case "enum" => MEnum(values)
      case "set" => MSet(values)
      case "point" => MPoint
      case "polygon" => MPolygon
      case "multipolygon" => MMultiPolygon
      case "uuid" => MUuid
      case other => throw new IllegalArgumentException(s"unknown type tag '$other'")
    }
  }
}
