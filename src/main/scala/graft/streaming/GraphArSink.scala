package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming GraphAr sink: versioned graph snapshots.
  *
  * GraphAr's chunked layout is immutable — rows cannot be appended to a
  * written type without renumbering its index — so the streaming shape
  * is SNAPSHOTS: each micro-batch writes a complete graph under
  * `<base>/v<batchId>/` and then atomically repoints `<base>/LATEST`
  * (a one-line file holding the current snapshot dir). Readers resolve
  * [[latestYaml]] and always see a fully-committed graph; a crash
  * mid-write leaves LATEST on the previous snapshot. Old versions stay
  * until [[prune]] — they are cheap directory renames away from a
  * time-travel story.
  *
  * Feed it an aggregated stream in COMPLETE output mode (e.g. the
  * running edge list of a relationship aggregation) so each batch holds
  * the whole graph, not a delta.
  */
object GraphArSink {

  /** Attach the sink to a streaming edge DataFrame with columns
    * (src, dst, properties...). Vertex counts must cover every id the
    * stream can produce.
    */
  def edges(stream: DataFrame, base: String, graphName: String,
            srcType: String, edgeType: String, dstType: String,
            vertexCount: Long, chunkSize: Long = 1L << 18,
            vertexChunkSize: Long = 1L << 12): DataStreamWriter[Row] =
    stream.writeStream.outputMode("complete").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val dir = s"$base/v$batchId"
        val spark = batch.sparkSession
        val conf = spark.sessionState.newHadoopConf()
        graft.sources.graphar.GraphArWriter.writeEdges(batch, dir,
          graft.sources.graphar.GraphArWriter.EdgeSpec(
            srcType, edgeType, dstType,
            srcVertexCount = vertexCount, dstVertexCount = vertexCount,
            chunkSize = chunkSize,
            srcChunkSize = vertexChunkSize, dstChunkSize = vertexChunkSize))
        val yaml = graft.sources.graphar.GraphArWriter.writeGraphYaml(
          dir, graphName, Seq.empty, Seq(s"${srcType}_${edgeType}_$dstType"), conf)
        commitLatest(spark, base, yaml, conf)
    }

  /** Vertex-table snapshots: each micro-batch writes the complete
    * vertex set (sorted by `orderCol` so `_graphArVertexIndex` is
    * deterministic — complete-mode aggregate output order is not) as a
    * vertex-only graph, then repoints LATEST. Same commit protocol and
    * time-travel surface as [[edges]].
    */
  def vertices(stream: DataFrame, base: String, graphName: String,
               vertexType: String, orderCol: String,
               chunkSize: Long = 1L << 18): DataStreamWriter[Row] =
    stream.writeStream.outputMode("complete").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val dir = s"$base/v$batchId"
        val spark = batch.sparkSession
        val conf = spark.sessionState.newHadoopConf()
        graft.sources.graphar.GraphArWriter.writeVertices(
          batch.orderBy(orderCol), dir,
          graft.sources.graphar.GraphArWriter.VertexSpec(vertexType, chunkSize))
        val yaml = graft.sources.graphar.GraphArWriter.writeGraphYaml(
          dir, graphName, Seq(vertexType), Seq.empty, conf)
        commitLatest(spark, base, yaml, conf)
    }

  /** Delta-log streaming ingest — the APPEND-mode shape: each
    * micro-batch is staged as an O(batch) delta over the last full
    * snapshot ([[graft.sources.graphar.GraphArMutations.stageDelta]]),
    * and every `compactEvery` batches the log is folded into one new
    * snapshot. Unlike [[edges]] (COMPLETE mode, full rewrite per batch)
    * the per-batch cost is proportional to the batch, not the graph —
    * the streaming twin of the log-structured mutation verbs. Readers
    * use `GraphArMutations.currentEdges` (or `registerCurrentView`) for
    * read-your-writes, or the plain snapshot for scan-path reads.
    *
    * Requires an initial snapshot (`GraphArMutations.initEdges`) so the
    * edge spec/metadata exist before the stream starts.
    */
  def edgeDeltas(stream: DataFrame, base: String,
                 compactEvery: Int = 10): DataStreamWriter[Row] = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // seq = batchId: foreachBatch is at-least-once, and a re-delivered
        // batch must not stage twice (the keyed stage is a no-op on replay)
        if (!batch.isEmpty)
          graft.sources.graphar.GraphArMutations.stageDelta(
            spark, base, adds = Some(batch), seq = Some(batchId))
        if ((batchId + 1) % compactEvery == 0)
          graft.sources.graphar.GraphArMutations.compactDeltas(spark, base)
        ()
    }
  }

  /** The vertex-table twin of [[edgeDeltas]]: each APPEND-mode
    * micro-batch is staged as an O(batch) upsert delta keyed by
    * `orderCol` (same-key rows replace, novel keys append), folded into
    * one snapshot rewrite every `compactEvery` batches — per-batch cost
    * proportional to the batch, not the table, vs [[vertices]]'
    * COMPLETE-mode full rewrite. Readers use
    * `GraphArMutations.currentVertices` for read-your-writes.
    *
    * Requires an initial snapshot (`GraphArMutations.initVertices`) so
    * the vertex spec/metadata exist before the stream starts.
    */
  def vertexDeltas(stream: DataFrame, base: String, orderCol: String,
                   compactEvery: Int = 10): DataStreamWriter[Row] = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col, max, struct}
        val spark = batch.sparkSession
        // several updates to one key can land in a single trigger
        // interval; an append stream carries no event order, so reduce
        // per key by the max property tuple — deterministic across
        // replays, and stageVertexDelta requires unique keys
        val others = batch.columns.filterNot(_ == orderCol).toSeq
        val reduced = batch.groupBy(col(orderCol))
          .agg(max(struct(others.map(col): _*)).as("_s"))
          .select(col(orderCol) +: others.map(n => col(s"_s.$n").as(n)): _*)
        if (!batch.isEmpty)
          graft.sources.graphar.GraphArMutations.stageVertexDelta(
            spark, base, orderCol, upserts = Some(reduced), seq = Some(batchId))
        if ((batchId + 1) % compactEvery == 0)
          graft.sources.graphar.GraphArMutations.compactVertexDeltas(spark, base)
        ()
    }
  }

  /** Atomic pointer swap: write LATEST.tmp, then overwrite-rename onto
    * LATEST in one filesystem op (`FileContext` rename with OVERWRITE —
    * atomic on HDFS-like stores). A crash at any point leaves LATEST on
    * the previous snapshot; there is no delete-then-rename window where
    * no pointer exists.
    */
  private[graft] def commitLatest(spark: org.apache.spark.sql.SparkSession,
                                  base: String, yaml: String,
                                  conf: org.apache.hadoop.conf.Configuration): Unit = {
    val latest = new Path(s"$base/LATEST")
    val tmp = new Path(s"$base/.LATEST.tmp")
    val fs = latest.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(yaml.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(latest.toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(latest),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    autoPrune(spark, base)
  }

  /** A snapshot-retention policy: `keep` = count window (the N most
    * recent committed versions survive), `maxAgeSec` = age floor
    * (a version outside the keep window additionally survives until
    * it is at least this old). Both optional; both-empty = retain
    * everything. */
  case class Retention(keep: Option[Int], maxAgeSec: Option[Long]) {
    def isSet: Boolean = keep.isDefined || maxAgeSec.isDefined
  }

  /** Set (or clear, with both fields None) the PER-TABLE retention
    * policy, stored with the table as a `_RETENTION` key=value file
    * under the snapshot base — the Iceberg/Delta table-property shape:
    * the policy travels with the data and binds EVERY writer of this
    * table, not just sessions that happen to carry the right conf.
    * Written with the LATEST commit protocol (tmp + one overwriting
    * rename), so a concurrent commit's [[autoPrune]] never reads a
    * partial policy. Takes effect at the next snapshot commit (or an
    * explicit [[prune]]); it does not itself delete anything.
    */
  def setRetention(spark: org.apache.spark.sql.SparkSession, base: String,
                   keep: Option[Int] = None,
                   maxAgeSec: Option[Long] = None): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(s"$base/_RETENTION")
    val fs = p.getFileSystem(conf)
    if (keep.isEmpty && maxAgeSec.isEmpty) { fs.delete(p, false); return }
    require(keep.forall(_ >= 1),
      s"retention keep must be >= 1 (LATEST itself is never pruned), got $keep")
    val body = (keep.map(k => s"keep=$k") ++
      maxAgeSec.map(a => s"maxAgeSec=$a")).mkString("", "\n", "\n")
    val tmp = new Path(s"$base/._RETENTION.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The table's stored retention policy (both-None when unset). */
  def retentionOf(spark: org.apache.spark.sql.SparkSession,
                  base: String): Retention = {
    val p = new Path(s"$base/_RETENTION")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Retention(None, None)
    val in = fs.open(p)
    val kv = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .flatMap { l =>
        l.split('=') match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap finally in.close()
    Retention(kv.get("keep").map(_.toInt), kv.get("maxAgeSec").map(_.toLong))
  }

  /** Retention policy hook, run after every LATEST repoint. Policy
    * resolution: the table's own `_RETENTION` properties file (see
    * [[setRetention]]) when present — the policy that travels with the
    * table wins — else the session-wide conf pair
    * `spark.graft.retainSnapshots` (count) /
    * `spark.graft.retainSnapshotsMaxAgeSec` (age). Either way old
    * snapshot dirs are pruned under the same safety rules as [[prune]]
    * (never LATEST, never a referenced version; age applies ON TOP of
    * the count — a version must be both outside the keep window AND
    * older than the age floor to be deleted). Nothing set (the
    * default) = retain everything, the pre-round-6 behavior.
    */
  private def autoPrune(spark: org.apache.spark.sql.SparkSession,
                        base: String): Unit = {
    val table = retentionOf(spark, base)
    val policy =
      if (table.isSet) table
      else Retention(
        spark.conf.getOption("spark.graft.retainSnapshots").map(_.toInt),
        spark.conf.getOption("spark.graft.retainSnapshotsMaxAgeSec")
          .map(_.toLong))
    if (policy.isSet)
      prune(spark, base, policy.keep.getOrElse(2), policy.maxAgeSec)
  }

  /** Resolve the current snapshot's graph yaml (null if none committed). */
  def latestYaml(spark: org.apache.spark.sql.SparkSession, base: String): String = {
    val latest = new Path(s"$base/LATEST")
    val fs = latest.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(latest)) return null
    val in = fs.open(latest)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Committed snapshot versions under `base`, ascending. A version is
    * committed iff its graph yaml exists — the yaml is written LAST in
    * the batch (after every chunk file), so a crash mid-write leaves a
    * partial `v<id>` dir that this listing skips.
    */
  def versions(spark: org.apache.spark.sql.SparkSession,
               base: String): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(conf)
    if (!fs.exists(basePath)) return Seq.empty
    val expected = expectedYamlName(spark, base)
    fs.listStatus(basePath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => scala.util.Try(s.getPath.getName.drop(1).toLong).toOption
        // Try: a concurrent prune() can delete the dir between the base
        // listing and this per-dir probe — treat it as not committed
        .filter(_ => scala.util.Try(graphYamlIn(fs, s.getPath, expected))
          .toOption.exists(_.isDefined)))
      .sorted
  }

  /** Time travel: resolve the graph yaml of snapshot `version`. Fails
    * with the committed-version list if that snapshot doesn't exist (or
    * was pruned / never finished committing).
    */
  def snapshotYaml(spark: org.apache.spark.sql.SparkSession, base: String,
                   version: Long): String = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(s"$base/v$version")
    val fs = dir.getFileSystem(conf)
    val yaml =
      if (fs.exists(dir))
        scala.util.Try(graphYamlIn(fs, dir, expectedYamlName(spark, base)))
          .toOption.flatten
      else None
    // message must not start with "no " — the DSv2 provider's metaOrNew
    // reserves that prefix for legal write-target resolution
    yaml.getOrElse(throw new IllegalArgumentException(
      s"snapshot v$version under $base is missing or uncommitted; " +
        s"committed versions: [${versions(spark, base).mkString(", ")}]"))
      .toString
  }

  /** The graph yaml's filename, learned from the LATEST pointer when one
    * exists (every snapshot of a sink shares the graph name, so this is
    * exact even for graph names that LOOK like per-type yamls, e.g.
    * "social.edge" → "social.edge.yaml"). None → fall back to the
    * suffix heuristic in [[graphYamlIn]].
    */
  private def expectedYamlName(spark: org.apache.spark.sql.SparkSession,
                               base: String): Option[String] =
    Option(latestYaml(spark, base)).map(y => new Path(y).getName)

  /** The graph yaml inside one snapshot dir: the `expected` filename if
    * known, else the top-level `*.yaml` that is not a per-type
    * `*.vertex.yaml` / `*.edge.yaml`.
    */
  private def graphYamlIn(fs: org.apache.hadoop.fs.FileSystem,
                          dir: Path, expected: Option[String]): Option[Path] =
    expected match {
      case Some(name) =>
        val p = new Path(dir, name)
        if (fs.exists(p)) Some(p) else None
      case None =>
        fs.listStatus(dir).toSeq.map(_.getPath)
          .find { p =>
            val n = p.getName
            n.endsWith(".yaml") && !n.endsWith(".vertex.yaml") &&
              !n.endsWith(".edge.yaml")
          }
    }

  /** Delete all snapshot dirs except the `keep` most recent — never the
    * one LATEST points at, and never a dir whose data files a kept
    * version still REFERENCES (multi-type mutation commits rewrite one
    * table and point the others' yaml prefixes at the older version's
    * files — see GraphArMutations.commitEdgesOf). With `maxAgeSec`, a
    * version additionally survives until it is at least that old
    * (mtime-based) — the age floor COMPOSES with the count window, it
    * never overrides it.
    */
  def prune(spark: org.apache.spark.sql.SparkSession, base: String,
            keep: Int = 2, maxAgeSec: Option[Long] = None): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(conf)
    if (!fs.exists(basePath)) return
    val current = Option(latestYaml(spark, base))
      .map(y => new Path(y).getParent.getName).toSet
    val expected = expectedYamlName(spark, base)
    // only COMMITTED versions (yaml present — it is written last) count
    // toward `keep` or are deletion candidates: a crashed partial dir
    // must neither displace a committed version from the keep window nor
    // be deleted out from under a possibly in-flight commit
    val versions = fs.listStatus(basePath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => scala.util.Try(s.getPath.getName.drop(1).toLong).toOption
        .map(_ -> s.getPath))
      .filter { case (_, p) =>
        scala.util.Try(graphYamlIn(fs, p, expected)).toOption.flatten.isDefined }
      .sortBy(-_._1)
    // data dirs every surviving version resolves its tables to — one
    // level is enough, references always point at the RESOLVED dir
    val referenced: Set[String] = versions.take(keep).map(_._2)
      .flatMap { vp =>
        graphYamlIn(fs, vp, expected).toSeq.flatMap { y =>
          scala.util.Try {
            val g = graft.meta.GraphArMeta.loadGraph(y.toString, conf)
            g.vertices.map(_.dir) ++ g.edges.map(_.dir)
          }.getOrElse(Seq.empty)
        }
      }
      .map(d => fs.makeQualified(new Path(d.stripSuffix("/"))).toString)
      .toSet
    val cutoffMs = maxAgeSec.map(a => System.currentTimeMillis() - a * 1000L)
    versions.drop(keep).foreach { case (_, p) =>
      val q = fs.makeQualified(p).toString + "/"
      val isReferenced = referenced.exists(_.startsWith(q))
      val oldEnough = cutoffMs.forall(c =>
        scala.util.Try(fs.getFileStatus(p).getModificationTime).toOption
          .forall(_ <= c))
      if (!current.contains(p.getName) && !isReferenced && oldEnough)
        fs.delete(p, true)
    }
  }
}
