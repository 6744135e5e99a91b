package graft.sources.graphar

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{GraphArMeta, GraphInfo}

/** DSv2 write path: `df.write.format("graphar")` (the reference is
  * strictly read-only — writes throw, graphar_catalog.cpp:61-76 — so
  * this whole surface is beyond-reference).
  *
  * {{{
  *   df.write.format("graphar").option("path", "/g/MyGraph.yaml")
  *     .option("type", "Person").mode("append").save()        // vertices
  *   edges.write.format("graphar").option("path", "/g/MyGraph.yaml")
  *     .option("src", "Person").option("type", "knows")
  *     .option("dst", "Person").mode("append").save()         // edges
  * }}}
  *
  * Implemented as a `V1Write` bridge onto [[GraphArWriter]] — the
  * distributed writer already owns the hard parts (part-aligned
  * `repartitionAndSortWithinPartitions`, rolling chunk files, CSR
  * offset tables, task-attempt staging commit). A native `BatchWrite`
  * would have to re-express that exact shuffle through
  * `RequiresDistributionAndOrdering`, which cannot state "hash rows to
  * ⌊id / chunkSize⌋ partitions" — the bridge keeps the placement logic
  * in one place.
  *
  * Semantics: a write targets ONE vertex or edge type inside the graph;
  * the graph yaml is created or updated to list it. `append` adds a NEW
  * type (appending rows to an existing chunked type would renumber
  * indices, so it is rejected); `overwrite` replaces the type.
  *
  * Options: `chunk_size`, `file_type` (parquet|csv|orc); edges also
  * `src_chunk_size`/`dst_chunk_size`, `layouts` ("src,dst"), and
  * `src_vertex_count`/`dst_vertex_count` — the counts default to the
  * graph's own vertex metadata when the endpoint types already exist.
  *
  * Row order defines the vertex index (sort first if the index must
  * follow a key); a `_graphArVertexIndex` column, if present, is used
  * as the explicit order and dropped. Edge frames may name endpoints
  * either (src, dst) or (_graphArSrcIndex, _graphArDstIndex).
  */
object GraphArWriteSupport {

  def doWrite(data: DataFrame, options: CaseInsensitiveStringMap,
              overwrite: Boolean): Unit = {
    val yamlPath = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' (graph yaml) is required"))
    val conf = data.sparkSession.sessionState.newHadoopConf()
    val p = new Path(yamlPath)
    val fs = p.getFileSystem(conf)
    val base = Option(p.getParent).map(_.toString).getOrElse(".")
    val graphName = p.getName.stripSuffix(".yaml")
    val existing: Option[GraphInfo] =
      if (fs.exists(p)) Some(GraphArMeta.loadGraph(yamlPath, conf)) else None
    val t = Option(options.get("type")).getOrElse(
      throw new IllegalArgumentException("option 'type' is required"))
    val ft = Option(options.get("file_type")).getOrElse("parquet")
    def lopt(key: String, dflt: Long): Long =
      Option(options.get(key)).map(_.toLong).getOrElse(dflt)

    // fail fast at the driver: every written column must be one of
    // GraphAr's 7 primitives (garType throws on anything else) —
    // otherwise the first failure would surface mid-job in an executor
    data.schema.fields.foreach { f =>
      try graft.meta.GraphArMeta.garType(f.dataType)
      catch {
        case _: IllegalArgumentException => throw new IllegalArgumentException(
          s"column '${f.name}': ${f.dataType.simpleString} is not a GraphAr type " +
            "(bool/int32/int64/float/double/string/date)")
      }
    }

    if (!options.containsKey("src") && !options.containsKey("dst")) {
      // ------------------------------------------------------- vertices
      val typeExists = existing.exists(_.vertices.exists(_.vertexType == t))
      if (typeExists && !overwrite)
        throw new IllegalStateException(
          s"vertex type '$t' already exists in $graphName — appending rows " +
            "would renumber the chunked index; use mode(\"overwrite\") to replace it")
      val df = if (data.columns.contains(GraphArMeta.VertexIndexCol))
        data.orderBy(GraphArMeta.VertexIndexCol).drop(GraphArMeta.VertexIndexCol)
      else data
      val spec = GraphArWriter.VertexSpec(t, lopt("chunk_size", 1L << 20), ft)
      if (typeExists) {
        // overwrite of an existing type: run the WHOLE write job into a
        // staging base first — the input plan may READ the type being
        // replaced (self-overwrite), and a failed job must not destroy
        // the old data — then swap dirs (also drops the old write's
        // surplus chunk files, so no orphans survive a smaller rewrite)
        stagedReplace(fs, base, s".stage_v_$t",
          Seq(s"vertex/$t", s"$t.vertex.yaml")) { stage =>
          GraphArWriter.writeVertices(df, stage, spec)
        }
      } else {
        GraphArWriter.writeVertices(df, base, spec)
      }
      updateGraphYaml(yamlPath, base, graphName, addVertex = Some(t), addEdge = None, conf)
    } else {
      // ---------------------------------------------------------- edges
      val src = Option(options.get("src")).getOrElse(
        throw new IllegalArgumentException("edge write needs both 'src' and 'dst'"))
      val dst = Option(options.get("dst")).getOrElse(
        throw new IllegalArgumentException("edge write needs both 'src' and 'dst'"))
      val typeExists = existing.exists(e0 =>
        e0.edges.exists(e => e.srcType == src && e.edgeType == t && e.dstType == dst))
      if (typeExists && !overwrite)
        throw new IllegalStateException(
          s"edge type '${src}_${t}_$dst' already exists in $graphName — " +
            "use mode(\"overwrite\") to replace it")
      def vcount(vt: String, key: String): Long =
        Option(options.get(key)).map(_.toLong)
          .orElse(existing.flatMap(_.vertices.find(_.vertexType == vt))
            .map(_.vertexCount(conf)))
          .getOrElse(throw new IllegalArgumentException(
            s"need option '$key' (or an existing '$vt' vertex type in the graph " +
              "to take the count from)"))
      val spec = GraphArWriter.EdgeSpec(src, t, dst,
        srcVertexCount = vcount(src, "src_vertex_count"),
        dstVertexCount = vcount(dst, "dst_vertex_count"),
        chunkSize = lopt("chunk_size", 1L << 22),
        srcChunkSize = lopt("src_chunk_size", 1L << 20),
        dstChunkSize = lopt("dst_chunk_size", 1L << 20),
        fileType = ft,
        layouts = Option(options.get("layouts"))
          .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq("src", "dst")))
      // Accept either naming convention (src/dst or the connector's
      // _graphArSrcIndex/_graphArDstIndex), but never both at once —
      // an unconditional rename would produce duplicate column names
      // and writeEdges' schema.fieldIndex would silently pick one.
      def toPlain(d: DataFrame, idx: String, plain: String): DataFrame =
        (d.columns.contains(idx), d.columns.contains(plain)) match {
          case (true, true) => throw new IllegalArgumentException(
            s"edge frame has both '$idx' and '$plain' columns — drop one " +
              "before writing (ambiguous endpoint column)")
          case (true, false) => d.withColumnRenamed(idx, plain)
          case _ => d
        }
      val df = toPlain(toPlain(data, GraphArMeta.SrcIndexCol, "src"),
        GraphArMeta.DstIndexCol, "dst")
      if (typeExists) {
        stagedReplace(fs, base, s".stage_e_${spec.name}",
          Seq(s"edge/${spec.name}", s"${spec.name}.edge.yaml")) { stage =>
          GraphArWriter.writeEdges(df, stage, spec)
        }
      } else {
        GraphArWriter.writeEdges(df, base, spec)
      }
      updateGraphYaml(yamlPath, base, graphName,
        addVertex = None, addEdge = Some(spec.name), conf)
    }
  }

  /** Run `job` against a staging base dir, then move the produced
    * `artifacts` (paths relative to base) into their final locations.
    * The old data stays intact until the job has fully succeeded — a
    * failure leaves only a stage dir to clean up, and a plan that reads
    * the data being replaced reads the OLD files throughout the job.
    * The remaining non-atomic window is the per-artifact delete+rename
    * metadata ops, not the data write.
    */
  private def stagedReplace(fs: org.apache.hadoop.fs.FileSystem, base: String,
                            stageName: String, artifacts: Seq[String])
                           (job: String => Unit): Unit = {
    val stage = s"$base/$stageName"
    val stagePath = new Path(stage)
    if (fs.exists(stagePath)) fs.delete(stagePath, true) // dead prior attempt
    job(stage)
    artifacts.foreach { rel =>
      val fin = new Path(s"$base/$rel")
      val staged = new Path(s"$stage/$rel")
      if (fs.exists(fin)) fs.delete(fin, true)
      if (Option(fin.getParent).exists(p => !fs.exists(p))) fs.mkdirs(fin.getParent)
      if (!fs.rename(staged, fin))
        throw new java.io.IOException(s"overwrite swap failed: $staged -> $fin")
    }
    fs.delete(stagePath, true)
  }

  /** Rewrite `<base>/<graph>.yaml` with the union of the graph's CURRENT
    * types and the one just written (idempotent on overwrite). The yaml
    * is re-loaded here, not taken from the pre-job snapshot — a
    * concurrent write of another type that committed while this job ran
    * must not be erased (the race narrows to the metadata rewrite).
    */
  private def updateGraphYaml(yamlPath: String, base: String,
                              graphName: String, addVertex: Option[String],
                              addEdge: Option[String],
                              conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new Path(yamlPath)
    val fresh =
      if (p.getFileSystem(conf).exists(p)) Some(GraphArMeta.loadGraph(yamlPath, conf))
      else None
    val vts = fresh.map(_.vertices.map(_.vertexType)).getOrElse(Seq.empty)
    val ens = fresh.map(_.edges.map(e => s"${e.srcType}_${e.edgeType}_${e.dstType}"))
      .getOrElse(Seq.empty)
    GraphArWriter.writeGraphYaml(base, graphName,
      (vts ++ addVertex).distinct, (ens ++ addEdge).distinct, conf)
  }
}

class GraphArWriteBuilder(info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, ov: Boolean): Unit =
        GraphArWriteSupport.doWrite(data, info.options(), overwrite || ov)
    }
  }
}
