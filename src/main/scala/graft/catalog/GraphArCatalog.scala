package graft.catalog

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{GraphArMeta, GraphInfo}
import graft.sources.graphar.{GraphArEdgeTable, GraphArVertexTable}

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
  * Table naming matches the reference exactly: `<Type>.vertex` and
  * `<Src>_<type>_<Dst>.edge` (GetNameFromInfo, src/utils/func.cpp:55-63).
  * All DDL/DML throws, mirroring the reference's read-only catalog
  * (graphar_catalog.cpp:38-85).
  */
class GraphArCatalog extends TableCatalog {

  private var catalogName: String = _
  private var graph: GraphInfo = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val path = Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name: option 'spark.sql.catalog.$name.path' (graph yaml) is required"))
    // SESSION Hadoop conf: the graph may live on s3a/hdfs with
    // credentials configured via spark.hadoop.* — a default
    // Configuration would silently drop them
    graph = GraphArMeta.loadGraph(path,
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  }

  override def name(): String = catalogName

  /** Only the default (empty) namespace exists — the TableCatalog
    * contract wants unknown namespaces to ERROR, not silently resolve.
    */
  private def requireDefaultNs(namespace: Array[String]): Unit =
    if (namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(catalogName) ++ namespace.toSeq)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireDefaultNs(namespace)
    val vs = graph.vertices.map(v => Identifier.of(namespace, s"${v.vertexType}.vertex"))
    val es = graph.edges.map(e => Identifier.of(namespace, s"${e.name}.edge"))
    (vs ++ es).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    requireDefaultNs(ident.namespace())
    val n = ident.name()
    graph.vertices.find(v => s"${v.vertexType}.vertex" == n)
      .map(new GraphArVertexTable(_))
      .orElse(graph.edges.find(e => s"${e.name}.edge" == n)
        .map(new GraphArEdgeTable(_)))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ n))
  }

  private def readOnly(): Nothing =
    throw new UnsupportedOperationException(
      s"GraphAr catalog '$catalogName' is read-only (matching the reference extension)")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = readOnly()
  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly()
  override def dropTable(ident: Identifier): Boolean = readOnly()
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly()
}
