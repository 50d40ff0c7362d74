package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Debezium change-event JSON → [[SourceEvent]].
  *
  * This is the sanctioned live-binlog route in a zero-new-deps build:
  * the reference registers itself as a MySQL replica and decodes
  * COM_BINLOG_DUMP in-process (pymysqlreplication binlogstream.py:
  * 157-470); here a stock Debezium MySQL connector does the wire work
  * and this adapter maps its PUBLIC JSON envelope (debezium.io docs,
  * "Debezium connector for MySQL > Data change events") onto the spool
  * format, applying the same normalization binlog_replicator.py:427-548
  * applies to pymysqlreplication events:
  *
  *  - `op: c` (insert), `u` (update), `r` (snapshot read) → ADD with
  *    the AFTER image — the reference folds UpdateRowsEvent to its
  *    after_values the same way (binlog_replicator.py:505-509);
  *  - `op: d` → REMOVE with the before image (the pipeline projects
  *    the PKs out of it, like converter.py:575-583);
  *  - schema-change events (`ddl` field, from the schema-history
  *    stream) → QUERY with the statement text;
  *  - Kafka tombstones / truncate (`op: t`) / heartbeat-shaped records
  *    → dropped, like the reference's `type not in (...)` skip.
  *
  * Envelopes parse with or without the `payload`/`schema` wrapper
  * (`value.converter.schemas.enable` either way), so both raw connector
  * output and console-consumer dumps feed the same code.
  *
  * Value encoding rides through verbatim: the pipeline's wire schema
  * parses every field as a string and [[graft.operators
  * .RecordConversion]] casts by the table's MySQL type, so Debezium's
  * JSON scalars (numbers, booleans, strings) land unchanged. Deploy the
  * connector with `time.precision.mode=connect` so temporal columns
  * arrive as castable epoch values. DECIMAL columns work in BOTH
  * decimal modes: `decimal.handling.mode=string` rides through as
  * text, and `precise` — the connector DEFAULT — arrives as base64
  * big-endian two's-complement unscaled bytes under the Kafka Connect
  * `Decimal` logical type; when the envelope carries its schema block
  * (`value.converter.schemas.enable=true`, required for precise mode
  * to be self-describing), those fields are normalized to plain
  * decimal strings here, so downstream sees one wire shape either way.
  */
object DebeziumJson {

  private val mapper = new ObjectMapper()

  /** Parsed line: a spool-able event (None for tombstones/heartbeats/
    * unsupported ops) plus the transport cursor if the envelope carried
    * one (`source.file:source.pos`, the reference's transaction_id
    * shape, binlog_replicator.py:449-451) and the source GTID when the
    * connector emits one (MariaDB domain-server-sequence or MySQL
    * uuid:txid — the resume coordinate the reference seeks by,
    * binlog_replicator.py:188-219). */
  final case class Record(event: Option[SourceEvent], pos: Option[String],
                          gtid: Option[String] = None)

  def parse(line: String): Record = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return Record(None, None)
    val root =
      try mapper.readTree(trimmed)
      catch { case _: com.fasterxml.jackson.core.JacksonException =>
        return Record(None, None) }
    if (root == null || !root.isObject) return Record(None, None)
    // schemas.enable=true wraps the envelope in {"schema":…,"payload":…}
    val p = Option(root.get("payload")).filter(_.isObject).getOrElse(root)
    val source = Option(p.get("source")).filter(_.isObject)
    val pos = for {
      s <- source
      f <- str(s, "file")
      o <- Option(s.get("pos")).map(_.asLong())
    } yield s"$f:$o"
    val gtid = source.flatMap(str(_, "gtid"))

    // `ddl` must be text and the event must carry a database to route
    // by (databaseName at the envelope level, falling back to source.db
    // for older connector versions) — a numeric/contextless shape is a
    // malformed record to skip, not a statement to apply
    val ev = Option(p.get("ddl")).filter(_.isTextual).map(_.asText()) match {
      case Some(ddl) =>
        str(p, "databaseName")
          .orElse(source.flatMap(str(_, "db")))
          .map(db => SourceEvent(db, table = "", op = EventSpool.OpQuery,
            query = Some(ddl)))
      case None =>
        for {
          op <- str(p, "op")
          s <- source
          db <- str(s, "db")
          tbl <- str(s, "table")
          e <- op match {
            case "c" | "u" | "r" =>
              row(p, root, "after", db, tbl).map(r =>
                SourceEvent(db, tbl, EventSpool.OpAdd, row = Some(r)))
            case "d" =>
              row(p, root, "before", db, tbl).map(r =>
                SourceEvent(db, tbl, EventSpool.OpRemove, row = Some(r)))
            case _ => None // "t" truncate, "m" message, heartbeats
          }
        } yield e
    }
    Record(ev, pos, gtid)
  }

  private def str(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)

  /** Memo for the per-(db.table, image) decimal-scale map. A topic's
    * envelopes all carry the same schema block, so re-deriving the
    * scales on every `row()` call pays an O(schema) walk with per-field
    * Option/builder allocation on the ingest hot path. The cached entry
    * keeps the image-struct subschema node it was derived from and every
    * hit is verified by deep equality against the incoming subschema —
    * an allocation-free recursive compare over the (small) field list —
    * so a mid-stream schema change (ALTER through the DDL barrier)
    * recomputes instead of serving stale scales. Bounded by table count;
    * cleared wholesale past a generous cap as a leak guard. */
  private val scalesMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (JsonNode, Map[String, Int])]()

  /** The `image` ("before"/"after") struct's subschema node, or null
    * when the envelope has no schema block — a top-level scan only. */
  private def imageSchema(root: JsonNode, image: String): JsonNode = {
    val sn = root.get("schema")
    if (sn == null || !sn.isObject) return null
    val fields = sn.get("fields")
    if (fields == null || !fields.isArray) return null
    var found: JsonNode = null
    fields.forEach { f =>
      if (found == null && str(f, "field").contains(image)) found = f
    }
    found
  }

  private def memoScales(root: JsonNode, image: String,
                         db: String, table: String): Map[String, Int] = {
    val sub = imageSchema(root, image)
    if (sub == null) Map.empty
    else {
      val key = (db, table, image)
      val hit = scalesMemo.get(key)
      if (hit != null && hit._1 == sub) hit._2
      else {
        val m = decimalScales(root, image)
        if (scalesMemo.size > 4096) scalesMemo.clear()
        scalesMemo.put(key, (sub, m))
        m
      }
    }
  }

  /** Per-field decimal scales for the `before`/`after` struct named
    * `image`, read from the envelope's schema block: fields whose
    * logical type is Kafka Connect `Decimal` (what
    * `decimal.handling.mode=precise` emits), scale from the type's
    * parameters. Empty without a schema block — string/double decimal
    * modes need no rewrite. */
  private def decimalScales(root: JsonNode,
                            image: String): Map[String, Int] = {
    val out = Map.newBuilder[String, Int]
    for {
      sn <- Option(root.get("schema")).filter(_.isObject)
      fields <- Option(sn.get("fields")).filter(_.isArray)
    } {
      fields.forEach { f =>
        if (str(f, "field").contains(image)) {
          Option(f.get("fields")).filter(_.isArray).foreach(_.forEach { c =>
            if (Option(c.get("name")).exists(_.asText() ==
                "org.apache.kafka.connect.data.Decimal"))
              str(c, "field").foreach { name =>
                val scale = Option(c.get("parameters"))
                  .flatMap(pp => Option(pp.get("scale")))
                  .flatMap(v => v.asText().toIntOption)
                  .getOrElse(0)
                out += name -> scale
              }
          })
        }
      }
    }
    out.result()
  }

  private def row(p: JsonNode, root: JsonNode, field: String,
                  db: String, table: String): Option[String] =
    Option(p.get(field)).filter(_.isObject).map { n =>
      val scales = memoScales(root, field, db, table)
      if (scales.isEmpty) n.toString
      else {
        // precise-mode decimals: base64(big-endian two's-complement
        // unscaled bytes) → plain decimal string at the declared scale
        val obj = n.deepCopy[JsonNode]()
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        scales.foreach { case (name, scale) =>
          val v = obj.get(name)
          if (v != null && v.isTextual) {
            try {
              val bytes = java.util.Base64.getDecoder.decode(v.asText())
              if (bytes.nonEmpty)
                obj.put(name, new java.math.BigDecimal(
                  new java.math.BigInteger(bytes), scale).toPlainString)
            } catch { // not base64 after all: leave the value verbatim
              case _: IllegalArgumentException => ()
            }
          }
        }
        obj.toString
      }
    }
}
