package graft.catalog

import java.util.{Map => JMap}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{EdgeInfo, GraphArMeta, GraphInfo, VertexInfo}
import graft.sources.graphar.{GraphArEdgeTable, GraphArMutations, GraphArVertexTable}

/** Read-only Spark `TableCatalog` over one GraphAr graph — the analogue of
  * the reference's `ATTACH '<graph.yaml>' AS g (TYPE duckdb_graphar)`
  * storage extension (SURVEY.md §2.1 S3; graphar_storage.cpp:19-41).
  *
  * Wire-up:
  * {{{
  *   spark.conf: spark.sql.catalog.g = graft.catalog.GraphArCatalog
  *               spark.sql.catalog.g.path = /data/Git.yaml
  *   SQL:        SHOW TABLES IN g;
  *               SELECT count(*) FROM g.`Person.vertex`;
  * }}}
  *
  * Time travel over a VERSIONED layout (the streaming/mutation sinks'
  * `base/vN` + LATEST protocol): instead of `path`, point the catalog at
  * the base and optionally pin a version —
  * {{{
  *   spark.sql.catalog.g0 = graft.catalog.GraphArCatalog
  *   spark.sql.catalog.g0.snapshotBase = /data/versioned
  *   spark.sql.catalog.g0.snapshot = 0        // omit -> LATEST
  *   SQL: SELECT count(*) FROM g0.`Part_link_Part.edge`;
  * }}}
  * A catalog instance resolves its snapshot ONCE at first use (Spark
  * instantiates catalogs lazily and caches them per session) — pin two
  * catalog names to compare versions side by side in one query.
  *
  * ==Federation==
  * `spark.sql.catalog.g.paths = /a/G1.yaml,/b/G2.yaml` attaches SEVERAL
  * graphs under one catalog, each surfaced as a NAMESPACE named by its
  * graph name:
  * {{{
  *   SHOW NAMESPACES IN g;                       -- G1, G2
  *   SHOW TABLES IN g.G1;
  *   SELECT ... FROM g.G1.`Person.vertex` JOIN g.G2.`Person.vertex` ...
  * }}}
  * Single-graph mode (`path`/`snapshotBase`) keeps the flat
  * default-namespace layout above.
  *
  * Table naming matches the reference exactly: `<Type>.vertex` and
  * `<Src>_<type>_<Dst>.edge` (GetNameFromInfo, src/utils/func.cpp:55-63).
  * All DDL/DML throws, mirroring the reference's read-only catalog
  * (graphar_catalog.cpp:38-85).
  */
class GraphArCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  /** namespace (Nil for single-graph mode) → graph. Insertion-ordered. */
  private var graphs: Seq[(Seq[String], GraphInfo)] = _
  /** Set in `snapshotBase` mode: enables INSERT INTO as staged deltas. */
  private var versionedBase: Option[String] = None
  private var catOptions: CaseInsensitiveStringMap = _

  /** Upsert key for SQL UPDATE/DELETE/MERGE on a versioned vertex
    * table: `.vertexKey.<Type>` beats the catalog-wide `.vertexKey`
    * beats the type's first declared property (the conventional id
    * column of a GraphAr vertex table).
    */
  private def vertexKeyOf(v: VertexInfo): String =
    Option(catOptions.get(s"vertexKey.${v.vertexType}"))
      .orElse(Option(catOptions.get("vertexKey")))
      .getOrElse(v.propertyGroups.head.properties.head.name)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    catOptions = options
    val spark = org.apache.spark.sql.SparkSession.active
    // SESSION Hadoop conf: the graph may live on s3a/hdfs with
    // credentials configured via spark.hadoop.* — a default
    // Configuration would silently drop them
    val conf = spark.sessionState.newHadoopConf()
    val single = Option(options.get("path"))
      .orElse(Option(options.get("snapshotBase")).map { base =>
        versionedBase = Some(base)
        Option(options.get("snapshot")) match {
          case Some(v) => graft.streaming.GraphArSink.snapshotYaml(spark, base, v.toLong)
          case None => Option(graft.streaming.GraphArSink.latestYaml(spark, base))
            .getOrElse(throw new IllegalArgumentException(
              s"catalog $name: no committed snapshot under $base"))
        }
      })
    graphs = single match {
      case Some(path) => Seq(Seq.empty[String] -> GraphArMeta.loadGraph(path, conf))
      case None =>
        val paths = Option(options.get("paths")).getOrElse(
          throw new IllegalArgumentException(
            s"catalog $name: one of 'spark.sql.catalog.$name.path' (graph " +
              "yaml), '.snapshotBase' (versioned layout), or '.paths' " +
              "(comma-separated yamls, federated) is required"))
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val loaded = paths.map(p => GraphArMeta.loadGraph(p, conf))
        val names = loaded.map(_.name)
        require(names.distinct == names,
          s"catalog $name: duplicate graph names across paths: $names")
        loaded.map(g => Seq(g.name) -> g)
    }
  }

  override def name(): String = catalogName

  private def graphAt(namespace: Array[String]): GraphInfo =
    graphs.collectFirst { case (ns, g) if ns == namespace.toSeq => g }
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(catalogName) ++ namespace.toSeq))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val graph = graphAt(namespace)
    val vs = graph.vertices.map(v => Identifier.of(namespace, s"${v.vertexType}.vertex"))
    val es = graph.edges.map(e => Identifier.of(namespace, s"${e.name}.edge"))
    (vs ++ es).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val graph = graphAt(ident.namespace())
    val n = ident.name()
    graph.vertices.find(v => s"${v.vertexType}.vertex" == n)
      .map[Table] { v =>
        versionedBase.fold[Table](new GraphArVertexTable(v))(
          new GraphArVersionedVertexTable(v, _, vertexKeyOf(v),
            perTypeLog = graph.vertices.size > 1))
      }
      .orElse(graph.edges.find(e => s"${e.name}.edge" == n)
        .map[Table] { e =>
          versionedBase.fold[Table](new GraphArEdgeTable(e))(
            new GraphArVersionedEdgeTable(e, _, perTypeLog = graph.edges.size > 1))
        })
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ n))
  }

  // ----------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] =
    graphs.collect { case (ns, _) if ns.nonEmpty => ns.toArray }.toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { graphAt(namespace); Array.empty } // namespaces don't nest

  override def namespaceExists(namespace: Array[String]): Boolean =
    graphs.exists(_._1 == namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    graphAt(namespace)
    java.util.Collections.emptyMap()
  }

  private def readOnly(): Nothing =
    throw new UnsupportedOperationException(
      s"GraphAr catalog '$catalogName' is read-only (matching the reference extension)")

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = readOnly()
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = readOnly()
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = readOnly()
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = readOnly()

  /** `ALTER TABLE … SET/UNSET TBLPROPERTIES` on a VERSIONED catalog:
    * the retention keys (`retention.keep`, `retention.maxAgeSec`) map
    * onto the snapshot base's `_RETENTION` properties file
    * ([[graft.streaming.GraphArSink.setRetention]]) — the SQL surface
    * of per-table retention. Retention governs the snapshot base as a
    * whole (every table of a graph version shares one dir), so setting
    * it through ANY of the catalog's tables configures the base; read
    * it back with `SHOW TBLPROPERTIES`. Any other property, or a
    * non-versioned catalog, refuses like the rest of the DDL surface.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val base = versionedBase.getOrElse(readOnly())
    loadTable(ident) // NoSuchTableException before any state change
    val spark = org.apache.spark.sql.SparkSession.active
    val cur = graft.streaming.GraphArSink.retentionOf(spark, base)
    var keep = cur.keep
    var age = cur.maxAgeSec
    changes.foreach {
      case s: TableChange.SetProperty => s.property match {
        case "retention.keep" => keep = Some(s.value.toInt)
        case "retention.maxAgeSec" => age = Some(s.value.toLong)
        case p => throw new UnsupportedOperationException(
          s"catalog '$catalogName': only retention.keep / " +
            s"retention.maxAgeSec are settable, got '$p'")
      }
      case r: TableChange.RemoveProperty => r.property match {
        case "retention.keep" => keep = None
        case "retention.maxAgeSec" => age = None
        case p => throw new UnsupportedOperationException(
          s"catalog '$catalogName': only retention.keep / " +
            s"retention.maxAgeSec are unsettable, got '$p'")
      }
      case c => throw new UnsupportedOperationException(
        s"catalog '$catalogName': unsupported table change $c")
    }
    graft.streaming.GraphArSink.setRetention(spark, base, keep, age)
    loadTable(ident)
  }
  override def dropTable(ident: Identifier): Boolean = readOnly()
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly()
}

/** The snapshot base's stored retention policy as table properties —
  * shared by the versioned edge and vertex tables' `properties()` so
  * `SHOW TBLPROPERTIES` reads back what `ALTER TABLE … SET
  * TBLPROPERTIES` wrote. */
private[catalog] object RetentionProps {
  def of(base: String): JMap[String, String] = {
    val r = graft.streaming.GraphArSink.retentionOf(
      org.apache.spark.sql.SparkSession.active, base)
    val m = new java.util.HashMap[String, String]()
    r.keep.foreach(k => m.put("retention.keep", k.toString))
    r.maxAgeSec.foreach(a => m.put("retention.maxAgeSec", a.toString))
    m
  }
}

/** Edge table of a VERSIONED (`snapshotBase`) catalog: reads serve the
  * catalog's pinned snapshot; `INSERT INTO` appends as an O(delta)
  * STAGED DELTA on the live log ([[GraphArMutations.stageDelta]]) — the
  * SQL twin of `addEdges` staging. The pinned snapshot is immutable, so
  * an insert never changes what this catalog reads; `graph_current_edges
  * ('<base>')` (or the next compaction's snapshot) folds it. Single-type
  * graphs use the flat `base/delta/` log, multi-type graphs the
  * per-type `base/delta/<name>/` log — the same convention as the Scala
  * mutation verbs. Only append is supported: INSERT OVERWRITE / TRUNCATE
  * refuse (a snapshot rewrite is `commitSnapshot`, not DML).
  *
  * Schema note: ACCEPT_ANY_SCHEMA is deliberately NOT advertised (unlike
  * the path-based writer) so Spark validates and aligns INSERT columns
  * against the table schema — `(_graphArSrcIndex, _graphArDstIndex,
  * props…)` — before the stage; the synthetic index columns are renamed
  * to the log's (src, dst).
  */
class GraphArVersionedEdgeTable(info: EdgeInfo, base: String,
                                perTypeLog: Boolean)
  extends GraphArEdgeTable(info) with SupportsDelete {
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  /** `SHOW TBLPROPERTIES` surfaces the base's stored retention policy. */
  override def properties(): JMap[String, String] =
    RetentionProps.of(base)

  /** SQL `DELETE FROM g.\`X.edge\` WHERE …` staged as an O(delta)
    * remove on the live log — the DML twin of `removeEdges` staging,
    * symmetric with INSERT INTO below. The delta log removes by edge
    * KEY (src, dst), so only predicates over the two synthetic index
    * columns are accepted: for those, "rows matching the predicate" and
    * "rows whose key matches" are the same set, and the key anti-join
    * deletes exactly the DELETE's row semantics. A predicate touching a
    * property column could over-delete sibling rows sharing the key —
    * `canDeleteWhere` refuses it up front (Spark reports the table
    * can't handle the delete) instead of deleting the wrong rows.
    */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(GraphArKeyFilters.toColumn(_).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val cond = filters.toSeq.map { f =>
      GraphArKeyFilters.toColumn(f).getOrElse(throw new UnsupportedOperationException(
        s"${info.name}.edge: DELETE predicate $f is not key-only " +
          s"(${GraphArMeta.SrcIndexCol}/${GraphArMeta.DstIndexCol})"))
    }.reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val live =
      if (perTypeLog) GraphArMutations.currentEdgesOf(spark, base, info.name)
      else GraphArMutations.currentEdges(spark, base)
    val keys = live
      .withColumnRenamed("src", GraphArMeta.SrcIndexCol)
      .withColumnRenamed("dst", GraphArMeta.DstIndexCol)
      .filter(cond)
      .select(
        org.apache.spark.sql.functions.col(GraphArMeta.SrcIndexCol).as("src"),
        org.apache.spark.sql.functions.col(GraphArMeta.DstIndexCol).as("dst"))
      .distinct()
    if (!keys.isEmpty) {
      if (perTypeLog)
        GraphArMutations.stageDeltaOf(spark, base, info.name,
          removeKeys = Some(keys))
      else GraphArMutations.stageDelta(spark, base, removeKeys = Some(keys))
    }
  }
  override def newWriteBuilder(w: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder =
        throw new UnsupportedOperationException(
          s"${info.name}.edge: INSERT OVERWRITE / TRUNCATE is not supported " +
            "on a versioned graph — only INSERT INTO (append, staged as a " +
            "delta); replace a snapshot with GraphArMutations.commitSnapshot")
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite) truncate()
              val adds = data
                .withColumnRenamed(GraphArMeta.SrcIndexCol, "src")
                .withColumnRenamed(GraphArMeta.DstIndexCol, "dst")
              val spark = data.sparkSession
              if (perTypeLog)
                GraphArMutations.stageDeltaOf(spark, base, info.name,
                  adds = Some(adds))
              else
                GraphArMutations.stageDelta(spark, base, adds = Some(adds))
            }
          }
      }
    }
}

/** V1-Filter → Column translation restricted to the two synthetic edge
  * key columns (see [[GraphArVersionedEdgeTable.canDeleteWhere]] for why
  * property predicates are refused). */
private[catalog] object GraphArKeyFilters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources._

  private val keyCols =
    Set(GraphArMeta.SrcIndexCol, GraphArMeta.DstIndexCol)

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) if keyCols(a) => Some(col(a) === lit(v))
    case GreaterThan(a, v) if keyCols(a) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) if keyCols(a) => Some(col(a) >= lit(v))
    case LessThan(a, v) if keyCols(a) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) if keyCols(a) => Some(col(a) <= lit(v))
    case In(a, vs) if keyCols(a) =>
      Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) if keyCols(a) => Some(col(a).isNull)
    case IsNotNull(a) if keyCols(a) => Some(col(a).isNotNull)
    case And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** Vertex table of a versioned catalog: vertex deltas are keyed UPSERTS
  * (`stageVertexDelta` needs the order column as the upsert key), which
  * bare INSERT syntax cannot carry — refuse with a pointer instead of
  * failing deep in the path-based writer with a misleading "option
  * 'path' is required". SQL `UPDATE` / `DELETE` / `MERGE INTO` DO work:
  * they carry the key through the row-level rewrite
  * ([[VertexDeltaOperation]]) and stage as O(delta) upsert/remove
  * entries on the vertex log. The key column is
  * `spark.sql.catalog.<name>.vertexKey.<Type>` (or the catalog-wide
  * `.vertexKey`), defaulting to the type's first property.
  */
class GraphArVersionedVertexTable(info: VertexInfo, base: String,
                                  keyCol: String, perTypeLog: Boolean)
  extends GraphArVertexTable(info)
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  // NO ACCEPT_ANY_SCHEMA (unlike the path-based writer): with it, Spark
  // skips UPDATE/MERGE assignment alignment, the command never becomes
  // `aligned`, and the row-level rewrite silently refuses the table
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE)

  /** `SHOW TBLPROPERTIES` surfaces the base's stored retention policy. */
  override def properties(): JMap[String, String] =
    RetentionProps.of(base)

  // Schema = the PROPERTY columns only, with the key non-null (the
  // upsert identity; Spark requires a non-nullable row ID before it
  // accepts a delta-based UPDATE/MERGE). The synthetic
  // _graphArVertexIndex moves to a METADATA column: it is derived from
  // row order, not stored identity, so DML must not demand an
  // assignment for it (MERGE INSERT aligns every schema column) — yet
  // index joins against edge tables stay one explicit SELECT away.
  override def schema(): StructType = StructType(
    info.schema.fields.filterNot(_.name == GraphArMeta.VertexIndexCol)
      .map(f => if (f.name == keyCol) f.copy(nullable = false) else f))

  override def metadataColumns(): Array[
      org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = GraphArMeta.VertexIndexCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "synthetic vertex index (row ordinal of the pinned snapshot)"
    })

  override def newWriteBuilder(w: LogicalWriteInfo): WriteBuilder =
    throw new UnsupportedOperationException(
      s"${info.vertexType}.vertex: SQL INSERT is not supported for vertex " +
        "types (a vertex delta is a keyed upsert — use SQL UPDATE/MERGE, " +
        "or GraphArMutations.stageVertexDelta / upsertVertices with the " +
        "key column); edge tables of this catalog do accept INSERT INTO")

  override def newRowLevelOperationBuilder(
      rl: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(info.schema.fieldNames.contains(keyCol),
      s"${info.vertexType}.vertex: vertexKey '$keyCol' is not a column " +
        s"(${info.schema.fieldNames.mkString(", ")})")
    () => new VertexDeltaOperation(info, base, keyCol, perTypeLog,
      rl.command())
  }
}
