package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Streaming ingest into the stored serving indexes: `foreachBatch`
  * sinks that append each micro-batch as one delta generation — new
  * documents become searchable (and new vectors ANN-probeable) one
  * micro-batch after they land, without rebuilding anything (the
  * continuous-indexing shape a production search stack runs over its
  * ingest stream).
  *
  * EXACTLY-ONCE under Structured Streaming's batch replay, without a
  * transaction log: the epoch id is recorded as a `_epoch_<id>` tag
  * INSIDE the generation dir BEFORE its tables are written, and the
  * generation only becomes visible when its LAST table's parquet
  * `_SUCCESS` lands (postings for the text index, vectors for IVF —
  * `IndexCommit.deltaDirs(commitSub)` filters on it). So:
  *
  *  - crash mid-append → the dir is tagged but INVISIBLE; the replayed
  *    epoch finds its tag and rewrites the SAME dir (mode overwrite),
  *    committing once;
  *  - crash after commit → the replayed epoch finds its tag on a
  *    visible dir and skips;
  *  - no crash → one generation per epoch.
  *
  * Generation ids never collide across retries because the retry
  * reuses its own tagged dir and fresh epochs take `nextDeltaId`
  * (which counts invisible dirs too and floors at the commit
  * watermark).
  *
  * Maintenance window: compact + vacuum a stream-ingested index only
  * while its query is STOPPED (between restarts). A vacuum reclaims
  * folded generations together with their epoch tags, so a replay
  * that reached back past a fold could no longer be detected — the
  * same single-writer contract every maintenance verb in this repo
  * carries, stated here because a stream makes the writer implicit.
  */
object IndexIngest {

  private def epochTag(id: Long) = s"_epoch_$id"

  /** Resolve the generation dir for an epoch: the dir already tagged
    * with it (None if that dir is COMMITTED — `commitSub/_SUCCESS`
    * present), else a freshly tagged `delta_<nextId>`. */
  private def epochDir(batch: DataFrame, idx: String, epochId: Long,
                       commitSub: String): Option[Path] = {
    val spark = batch.sparkSession
    val fs = graft.util.IndexCommit.fs(spark, idx)
    val root = new Path(idx)
    val tagged = if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta_"))
        .find(s => fs.exists(new Path(s.getPath, epochTag(epochId))))
        .map(_.getPath)
    tagged match {
      case Some(d) =>
        if (fs.exists(new Path(d, s"$commitSub/_SUCCESS"))) None // committed
        else Some(d) // crashed attempt: retry in place
      case None =>
        val d = new Path(
          s"$idx/delta_${graft.util.IndexCommit.nextDeltaId(spark, idx)}")
        fs.mkdirs(d)
        fs.create(new Path(d, epochTag(epochId)), true).close()
        Some(d)
    }
  }

  /** Text-index sink: `.writeStream.foreachBatch(
    * IndexIngest.appendBatch(indexPath) _)` over a document stream
    * with (doc_id, text) columns. */
  def appendBatch(idx: String)(batch: DataFrame, epochId: Long): Unit =
    epochDir(batch, idx, epochId, "postings").foreach { dir =>
      graft.operators.Retrieval.writePostingsDelta(
        batch.select(batch("doc_id"), batch("text")), dir.toString)
      // opt-in generation cap (spark.graft.maxIndexDeltas): fold when
      // the live count reaches it, bounding per-probe scan multiplicity
      // under continuous ingest. Replay-safe: folded dirs and their
      // epoch tags stay until an explicit vacuum (the maintenance-
      // window op above).
      graft.operators.Retrieval.maybeCompact(batch.sparkSession, idx)
    }

  /** IVF sink: the ANN twin over a vector stream with (vec_id,
    * embedding) columns — each batch assigned against the index's
    * FROZEN centroids (the append contract; retraining is a rebuild). */
  def appendIvfBatch(idx: String)(batch: DataFrame, epochId: Long): Unit =
    epochDir(batch, idx, epochId, "vectors").foreach { dir =>
      graft.operators.Similarity.writeIvfDelta(
        batch.sparkSession, idx, batch, dir.toString)
      graft.operators.Similarity.maybeCompact(batch.sparkSession, idx,
        "vectors", graft.operators.Similarity.compactIvfIndex)
    }

  /** IVF-PQ sink: same contract over the compressed-codes layout —
    * each batch is assigned against the FROZEN centroids and coded
    * against the FROZEN codebook; only m-byte codes land per vector. */
  def appendIvfPqBatch(idx: String, m: Int = 8, dims: Int = 64)(
      batch: DataFrame, epochId: Long): Unit =
    epochDir(batch, idx, epochId, "codes").foreach { dir =>
      graft.operators.Similarity.writeIvfPqDelta(
        batch.sparkSession, idx, batch, dir.toString, m, dims)
      graft.operators.Similarity.maybeCompact(batch.sparkSession, idx,
        "codes", graft.operators.Similarity.compactIvfPqIndex)
    }

  /** CDC sink: keep the search index in SYNC with a MUTATING document
    * table. Each micro-batch carries change-feed rows — (doc_id, text,
    * `_change_type` ∈ insert/delete), the `GraphArMutations` CDF
    * convention where an update arrives as delete-of-old +
    * insert-of-new — applied as one tombstone generation (the delete
    * rows) followed by one epoch-tagged append generation (the insert
    * rows). New docs carry no delete row; delete-only batches write no
    * append.
    *
    * Replay safety comes from the SEQUENCE semantics, not just the
    * tag: a fully committed epoch is skipped via its tag; a crash
    * before the append dir existed re-runs delete + append — the
    * duplicate tombstone fences nothing new and subtracts nothing
    * (its negative stats are computed from the then-live doclens,
    * where the victims are already fenced); a crash mid-append
    * completes ONLY the append, in place — re-deleting there would
    * out-sequence the tagged dir and fence the upserts' new text.
    */
  def applyCdcBatch(idx: String)(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = graft.util.IndexCommit.fs(spark, idx)
    val root = new Path(idx)
    val tagged = if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta_"))
        .find(s => fs.exists(new Path(s.getPath, epochTag(epochId))))
        .map(_.getPath)
    // the batch feeds up to four actions (two emptiness checks + the
    // tombstone and append writes): cache it once instead of
    // re-reading the epoch's source files per action
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val inserts = b.filter(b("_change_type") === "insert")
        .select(b("doc_id"), b("text"))
      tagged match {
        case Some(d) =>
          if (fs.exists(new Path(d, "postings/_SUCCESS"))) return // committed
          // the delete half committed strictly before this dir was
          // created — finish only the append half, in its own dir
          graft.operators.Retrieval.writePostingsDelta(inserts, d.toString)
        case None =>
          val dels = b.filter(b("_change_type") === "delete")
            .select(b("doc_id"))
          if (!dels.isEmpty)
            graft.operators.Retrieval.deletePostingsDocs(spark, idx, dels)
          if (!inserts.isEmpty) {
            val d = new Path(
              s"$idx/delta_${graft.util.IndexCommit.nextDeltaId(spark, idx)}")
            fs.mkdirs(d)
            fs.create(new Path(d, epochTag(epochId)), true).close()
            graft.operators.Retrieval.writePostingsDelta(inserts, d.toString)
          }
      }
    } finally b.unpersist(blocking = false)
    // after the epoch fully applied: same opt-in generation cap as
    // appendBatch (tombstones count toward it — a delete-heavy feed
    // grows the fence just like an append-heavy one grows the scans)
    graft.operators.Retrieval.maybeCompact(spark, idx)
  }
}
