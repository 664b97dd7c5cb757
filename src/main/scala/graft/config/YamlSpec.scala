package graft.config

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.streaming.ConsumerConfig
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** YAML configuration front-end: the `sequin.yaml` infrastructure-as-code
  * surface (reference: `/root/reference/docs/reference/sequin-yaml.mdx`,
  * `lib/sequin/transforms/transforms.ex` from_external/to_external).
  *
  * The build is zero-dependency, so this ships a minimal YAML-subset
  * parser covering the config dialect the reference documents: nested
  * maps by indentation, block lists (`- item`, including maps as items),
  * quoted and plain scalars, comments, booleans/numbers/null. Anchors,
  * multi-document streams, flow collections and block scalars are NOT
  * part of the dialect and raise.
  *
  * Parsing funnels into [[PipelineSpec.parseNode]], so YAML and JSON
  * specs pass IDENTICAL validation (changeset parity). Reference-specific
  * spellings are normalized first:
  *   - `sinks:` documents: each list entry is one consumer
  *   - `source.include_tables`/`exclude_tables` (names like
  *     `public.users`) resolve to table oids through a caller-supplied
  *     name→oid map — the analogue of from_external resolving names
  *     against the connected database; unresolvable names raise
  *   - destination `type: "webhook"` is the JSON spec's `http_push`
  *   - `tables: [{name, group_column_names}]` → per-table group overrides
  *
  * [[render]] is the `to_external` direction; `parseSinks(render(cfg))`
  * round-trips exactly (spec-tested).
  */
object YamlSpec {

  // ------------------------------------------------------------ YAML tree

  private sealed trait Y
  private final case class YMap(entries: Vector[(String, Y)]) extends Y
  private final case class YList(items: Vector[Y]) extends Y
  private final case class YScalar(text: String, quoted: Boolean) extends Y

  // ---------------------------------------------------------------- parse

  /** Parse a single-consumer YAML spec: either the sink fields at top
    * level, or a `sinks:` document with exactly one entry.
    */
  def parse(yaml: String, tableOids: Map[String, Long] = Map.empty): ConsumerConfig = {
    val all = parseSinks(yaml, tableOids)
    if (all.size != 1)
      throw new IllegalArgumentException(
        s"expected exactly one consumer spec, found ${all.size}")
    all.head
  }

  /** A declared HTTP endpoint destination (sequin-yaml.mdx:668-705):
    * `name` + (`url` XOR `local: true` with optional `path`), plus plain
    * headers. Encrypted headers are accepted and carried like plain ones
    * (no secret store in scope — the split is the reference's at-rest
    * encryption concern, not a wire-shape one).
    */
  final case class HttpEndpointSpec(name: String, url: Option[String],
      local: Boolean, path: Option[String], headers: Seq[(String, String)],
      // keys declared under `encrypted_headers` — their values are
      // vault-sealed at rest by the management plane (sequin-yaml.mdx
      // encrypted_headers; reference stores them via Cloak vault columns)
      encryptedHeaderKeys: Set[String] = Set.empty)

  /** Parse the document's `http_endpoints:` list. Absent section → Nil. */
  def parseHttpEndpoints(yaml: String): Seq[HttpEndpointSpec] = {
    val root = parseDocument(yaml) match {
      case m: YMap => m
      case _ => throw new IllegalArgumentException("top level must be a map")
    }
    root.entries.collectFirst { case ("http_endpoints", v) => v } match {
      case None => Nil
      case Some(YList(items)) => items.map {
        case m: YMap => parseEndpoint(m)
        case _ =>
          throw new IllegalArgumentException("each http_endpoint must be a map")
      }
      case Some(_) =>
        throw new IllegalArgumentException("`http_endpoints` must be a list")
    }
  }

  private def parseEndpoint(m: YMap): HttpEndpointSpec = {
    def scalarOf(key: String): Option[String] =
      m.entries.collectFirst { case (`key`, YScalar(t, _)) => t }
    val name = scalarOf("name").getOrElse(
      throw new IllegalArgumentException("http_endpoint requires a name"))
    val url = scalarOf("url")
    val local = scalarOf("local").exists(_.toBoolean) ||
      scalarOf("webhook.site").exists(_.toBoolean)
    if (url.isEmpty && !local)
      throw new IllegalArgumentException(
        s"http_endpoint $name requires url or local: true")
    if (url.nonEmpty && local)
      throw new IllegalArgumentException(
        s"http_endpoint $name: url and local are mutually exclusive")
    def headerList(section: String): Seq[(String, String)] =
      (m.entries.collectFirst {
        case (`section`, YList(items)) => items
      }.getOrElse(Vector.empty)).collect { case h: YMap =>
        (h.entries.collectFirst { case ("key", YScalar(t, _)) => t }.getOrElse(
          throw new IllegalArgumentException("header requires key")),
          h.entries.collectFirst { case ("value", YScalar(t, _)) => t }.getOrElse(
            throw new IllegalArgumentException("header requires value")))
      }
    val plainHeaders = headerList("headers")
    val encHeaders = headerList("encrypted_headers")
    HttpEndpointSpec(name, url, local, scalarOf("path"),
      plainHeaders ++ encHeaders, encHeaders.map(_._1).toSet)
  }

  /** A declared change-retention pipeline (sequin-yaml.mdx:706-729; the
    * reference's wal_pipeline): scope one source table's changes, filter,
    * and retain them in a destination event table — the config plane for
    * `graft.sinks.EventTableSink`. The `*_database` fields are deployment
    * references (carried, not resolved — same treatment as the sink
    * document's `database`).
    */
  final case class ChangeRetentionSpec(name: String,
      sourceDatabase: String, sourceSchema: String, sourceTable: String,
      destinationDatabase: String, destinationSchema: String,
      destinationTable: String,
      actions: Seq[String], filters: Seq[graft.ops.ColumnFilter]) {

    /** The declared pipeline's read side: scope to the source table,
      * action filter, column filters — exactly what flows into the
      * destination event table (`EventTableSink.upsert` keyed by the
      * destination schema/table).
      */
    def scope(cdc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.col
      graft.ops.Filters.columnFilters(
        graft.ops.Filters.actionFilter(
          cdc.filter(col("table_schema") === sourceSchema &&
            col("table_name") === sourceTable), actions), filters)
    }
  }

  /** Parse the document's `change_retentions:` list. Absent → Nil. */
  def parseChangeRetentions(yaml: String): Seq[ChangeRetentionSpec] = {
    val root = parseDocument(yaml) match {
      case m: YMap => m
      case _ => throw new IllegalArgumentException("top level must be a map")
    }
    root.entries.collectFirst { case ("change_retentions", v) => v } match {
      case None => Nil
      case Some(YList(items)) => items.map {
        case m: YMap => parseRetention(m)
        case _ => throw new IllegalArgumentException(
          "each change_retention must be a map")
      }
      case Some(_) =>
        throw new IllegalArgumentException("`change_retentions` must be a list")
    }
  }

  private def parseRetention(m: YMap): ChangeRetentionSpec = {
    def scalarOf(key: String): Option[String] =
      m.entries.collectFirst { case (`key`, YScalar(t, _)) => t }
    def required(key: String): String = scalarOf(key).getOrElse(
      throw new IllegalArgumentException(s"change_retention requires $key"))
    val name = required("name")
    val actions = m.entries.collectFirst { case ("actions", YList(items)) =>
      items.collect { case YScalar(t, _) => t }
    }.getOrElse(Vector("insert", "update", "delete"))
    val bad = actions.filterNot(Set("insert", "update", "delete"))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"change_retention $name: invalid actions: ${bad.mkString(", ")}")
    val filters = m.entries.collectFirst { case ("filters", YList(items)) =>
      items.collect { case f: YMap =>
        def fOf(key: String): Option[String] =
          f.entries.collectFirst { case (`key`, YScalar(t, _)) => t }
        val op = fOf("operator").getOrElse(throw new IllegalArgumentException(
          s"change_retention $name: filter requires operator")) match {
          case "=" => "==" // the retention doc spells equality "="
          case other => other
        }
        graft.ops.ColumnFilter(
          field = fOf("column_name").getOrElse(
            throw new IllegalArgumentException(
              s"change_retention $name: filter requires column_name")),
          op = op,
          values = fOf("comparison_value").toSeq,
          valueType = fOf("field_type").getOrElse("string"),
          jsonbPath = fOf("field_path"))
      }
    }.getOrElse(Vector.empty)
    ChangeRetentionSpec(name,
      required("source_database"), required("source_table_schema"),
      required("source_table_name"),
      required("destination_database"), required("destination_table_schema"),
      required("destination_table_name"), actions, filters)
  }

  /** `${VAR:-default}` environment substitution (sequin-yaml.mdx "
    * Environment variable substitution"): applied to the raw text before
    * parsing; a referenced variable with no value and no default is an
    * error rather than a silent empty string.
    */
  def substituteEnv(yaml: String,
      env: String => Option[String] = sys.env.get): String = {
    val re = raw"\$$\{([A-Za-z_][A-Za-z0-9_]*)(:-([^}]*))?\}".r
    re.replaceAllIn(yaml, m =>
      scala.util.matching.Regex.quoteReplacement(
        env(m.group(1))
          .orElse(Option(m.group(2)).map(_ => m.group(3)))
          .getOrElse(throw new IllegalArgumentException(
            s"undefined environment variable: ${m.group(1)}"))))
  }

  /** Parse a `sinks:` document (or a bare single-sink map) into one
    * validated [[ConsumerConfig]] per entry.
    */
  def parseSinks(yaml: String, tableOids: Map[String, Long] = Map.empty): Seq[ConsumerConfig] = {
    val root = parseDocument(yaml) match {
      case m: YMap => m
      case _ => throw new IllegalArgumentException("top level must be a map")
    }
    val sinkNodes = root.entries.collectFirst { case ("sinks", v) => v } match {
      case Some(YList(items)) => items.map {
        case m: YMap => m
        case _ => throw new IllegalArgumentException("each sink must be a map")
      }
      case Some(_) => throw new IllegalArgumentException("`sinks` must be a list")
      // a document holding only OTHER resource sections declares no
      // sinks; anything else without a `sinks:` key is a bare
      // single-sink document
      case None if root.entries.exists(e =>
        e._1 == "http_endpoints" || e._1 == "change_retentions") => Vector.empty
      case None => Vector(root)
    }
    sinkNodes.map(m => PipelineSpec.parseNode(normalize(m, tableOids)))
  }

  /** YAML sink map → the JSON-spec node shape [[PipelineSpec.parseNode]]
    * validates (name resolution + spelling normalization happen here).
    */
  private def normalize(sink: YMap, tableOids: Map[String, Long]): JsonNode = {
    val node = toJackson(sink).asInstanceOf[ObjectNode]
    Option(node.get("source")).foreach { src =>
      val s = src.asInstanceOf[ObjectNode]
      def resolve(field: String, target: String): Unit =
        Option(s.get(field)).foreach { arr =>
          val oids = s.putArray(target)
          arr.elements().asScala.foreach { t =>
            val name = t.asText()
            oids.add(tableOids.getOrElse(name,
              throw new IllegalArgumentException(
                s"unknown table in $field: '$name' (no oid mapping)")))
          }
          s.remove(field)
        }
      resolve("include_tables", "include_table_oids")
      resolve("exclude_tables", "exclude_table_oids")
    }
    Option(node.get("destination")).foreach { d =>
      val o = d.asInstanceOf[ObjectNode]
      if (Option(o.get("type")).exists(_.asText() == "webhook"))
        o.put("type", "http_push")
    }
    node
  }

  private def toJackson(y: Y): JsonNode = y match {
    case YMap(entries) =>
      val o = PipelineSpec.mapper.createObjectNode()
      entries.foreach { case (k, v) => o.set[JsonNode](k, toJackson(v)) }
      o
    case YList(items) =>
      val a = PipelineSpec.mapper.createArrayNode()
      items.foreach(i => a.add(toJackson(i)))
      a
    case YScalar(s, quoted) =>
      val o = PipelineSpec.mapper.getNodeFactory
      if (quoted) o.textNode(s)
      else s match {
        case "{}"               => PipelineSpec.mapper.createObjectNode()
        case "[]"               => PipelineSpec.mapper.createArrayNode()
        case "" | "~" | "null"  => o.nullNode()
        case "true"             => o.booleanNode(true)
        case "false"            => o.booleanNode(false)
        case t if t.matches("-?\\d+") && scala.util.Try(t.toLong).isSuccess =>
          o.numberNode(t.toLong)
        case t if t.matches("-?\\d+\\.\\d+") => o.numberNode(t.toDouble)
        case t                  => o.textNode(t)
      }
  }

  // ------------------------------------------------------ YAML-subset lexer

  /** Parse YAML text to the tree. Indentation must use spaces. */
  private def parseDocument(yaml: String): Y = {
    val lines = ArrayBuffer.empty[(Int, String)] // (indent, content)
    yaml.split("\n", -1).foreach { raw =>
      val noComment = stripComment(raw)
      val content = noComment.trim
      if (content.nonEmpty && content != "---") {
        if (noComment.takeWhile(c => c == ' ' || c == '\t').contains('\t'))
          throw new IllegalArgumentException("tabs are not valid YAML indentation")
        Seq("&", "*", "{", "[", "|", ">").find(content.startsWith).foreach(t =>
          throw new IllegalArgumentException(
            s"unsupported YAML feature at '$content' ('$t' syntax)"))
        lines += ((noComment.indexWhere(_ != ' '), content))
      }
    }
    if (lines.isEmpty) YMap(Vector.empty)
    else {
      val (node, next) = parseBlock(lines, 0, lines(0)._1)
      if (next != lines.length)
        throw new IllegalArgumentException(
          s"bad indentation near: '${lines(next)._2}'")
      node
    }
  }

  /** Strip a trailing `# comment` that is not inside quotes. */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case '#' if !inS && !inD && (i == 0 || line.charAt(i - 1) == ' ') =>
          return line.substring(0, i)
        case _ => ()
      }
      i += 1
    }
    line
  }

  /** Parse the block starting at `i`, whose items sit at exactly `indent`.
    * Returns the node and the index of the first line past the block.
    */
  private def parseBlock(lines: ArrayBuffer[(Int, String)], i: Int,
      indent: Int): (Y, Int) = {
    if (lines(i)._2.startsWith("- ") || lines(i)._2 == "-") parseList(lines, i, indent)
    else parseMap(lines, i, indent)
  }

  private def parseList(lines: ArrayBuffer[(Int, String)], start: Int,
      indent: Int): (Y, Int) = {
    val items = Vector.newBuilder[Y]
    var i = start
    while (i < lines.length && lines(i)._1 == indent &&
        (lines(i)._2.startsWith("- ") || lines(i)._2 == "-")) {
      val content = lines(i)._2.drop(2).trim
      val asScalar = parseScalar(content)
      if (content.isEmpty) {
        // `-` alone: the item is the deeper-indented block that follows
        if (i + 1 >= lines.length || lines(i + 1)._1 <= indent)
          throw new IllegalArgumentException("empty list item")
        val (item, next) = parseBlock(lines, i + 1, lines(i + 1)._1)
        items += item; i = next
      } else if (asScalar.quoted ||
          !(content.contains(": ") || content.endsWith(":"))) {
        items += asScalar; i += 1 // plain scalar item, e.g. `- insert`
      } else {
        // rewrite `- k: v` as `k: v` at indent+2 and parse the item in
        // place — following lines at indent+2 belong to the same item map
        lines(i) = (indent + 2, content)
        val (item, next) = parseBlock(lines, i, indent + 2)
        items += item; i = next
      }
    }
    (YList(items.result()), i)
  }

  private def parseMap(lines: ArrayBuffer[(Int, String)], start: Int,
      indent: Int): (Y, Int) = {
    val entries = Vector.newBuilder[(String, Y)]
    var i = start
    while (i < lines.length && lines(i)._1 == indent &&
        !lines(i)._2.startsWith("- ") && lines(i)._2 != "-") {
      val (key, rest) = splitKey(lines(i)._2)
      if (rest.nonEmpty) {
        entries += key -> parseScalar(rest)
        i += 1
      } else if (i + 1 < lines.length && (lines(i + 1)._1 > indent ||
          (lines(i + 1)._1 == indent && (lines(i + 1)._2.startsWith("- ") ||
            lines(i + 1)._2 == "-")))) {
        // nested block; YAML allows list items at the SAME indent as the key
        val (v, next) = parseBlock(lines, i + 1, lines(i + 1)._1)
        entries += key -> v
        i = next
      } else {
        entries += key -> YScalar("", quoted = false) // empty value → null
        i += 1
      }
    }
    (YMap(entries.result()), i)
  }

  /** Split `key: value` at the first unquoted `: ` (or trailing `:`). */
  private def splitKey(content: String): (String, String) = {
    val idx =
      if (content.endsWith(":") && !content.dropRight(1).contains(": "))
        content.length - 1
      else content.indexOf(": ")
    if (idx < 0)
      throw new IllegalArgumentException(s"expected 'key: value', got '$content'")
    val rawKey = content.substring(0, idx).trim
    val key = parseScalar(rawKey) match { case YScalar(t, _) => t; case _ => rawKey }
    (key, content.substring(math.min(idx + 1, content.length)).trim)
  }

  private def parseScalar(text: String): YScalar = {
    val t = text.trim
    if (t != "{}" && t != "[]" &&
        (t.startsWith("|") || t.startsWith(">") || t.startsWith("{") ||
          t.startsWith("[") || t.startsWith("&") || t.startsWith("*")))
      throw new IllegalArgumentException(
        s"unsupported YAML feature in value: '$t'")
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      YScalar(t.substring(1, t.length - 1)
        .replace("\\\"", "\"").replace("\\\\", "\\"), quoted = true)
    else if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      YScalar(t.substring(1, t.length - 1).replace("''", "'"), quoted = true)
    else YScalar(t, quoted = false)
  }

  // --------------------------------------------------------------- render

  /** Config → `sinks:` YAML document (to_external, transforms.ex:163-199).
    * `parseSinks(render(cfg)) == Seq(cfg)` round-trips exactly.
    */
  def render(cfg: ConsumerConfig): String = renderAll(Seq(cfg))

  def renderAll(cfgs: Seq[ConsumerConfig]): String = {
    val sb = new StringBuilder("sinks:\n")
    cfgs.foreach { cfg =>
      val node = PipelineSpec.renderNode(cfg)
      // to_external spelling: webhook, not http_push
      Option(node.get("destination")).foreach { d =>
        val o = d.asInstanceOf[ObjectNode]
        if (Option(o.get("type")).exists(_.asText() == "http_push"))
          o.put("type", "webhook")
      }
      renderNode(node, sb, indent = 2, listItem = true)
    }
    sb.toString
  }

  private def renderNode(node: JsonNode, sb: StringBuilder, indent: Int,
      listItem: Boolean = false): Unit = {
    val pad = " " * indent
    node match {
      case o: ObjectNode =>
        var first = true
        o.fields().asScala.foreach { e =>
          val lead = if (first && listItem) " " * (indent - 2) + "- " else pad
          first = false
          e.getValue match {
            case v if v.isObject || v.isArray =>
              if (v.isEmpty) sb.append(s"$lead${e.getKey}: ${if (v.isArray) "[]" else "{}"}\n")
              else {
                sb.append(s"$lead${e.getKey}:\n")
                renderNode(v, sb, indent + 2)
              }
            case v => sb.append(s"$lead${e.getKey}: ${scalar(v)}\n")
          }
        }
      case a: ArrayNode =>
        a.elements().asScala.foreach {
          case v if v.isObject => renderNode(v, sb, indent + 2, listItem = true)
          case v               => sb.append(s"$pad- ${scalar(v)}\n")
        }
      case v => sb.append(s"$pad${scalar(v)}\n")
    }
  }

  /** Scalar rendering: strings always quoted (so plain-scalar typing can
    * never reinterpret them on re-parse), everything else bare.
    */
  private def scalar(v: JsonNode): String =
    if (v.isTextual)
      "\"" + v.asText().replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else v.asText()
}
