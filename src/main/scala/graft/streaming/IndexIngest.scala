package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Streaming ingest into the stored postings index: a `foreachBatch`
  * sink that appends each micro-batch of documents as one delta
  * generation — new documents become searchable one micro-batch after
  * they land, without rebuilding anything (the continuous-indexing
  * shape a production search stack runs over its ingest stream).
  *
  * EXACTLY-ONCE under Structured Streaming's batch replay, without a
  * transaction log: the epoch id is recorded as a `_epoch_<id>` tag
  * INSIDE the generation dir BEFORE its tables are written, and the
  * generation only becomes visible when its LAST table's parquet
  * `_SUCCESS` lands ([[graft.operators.Retrieval.writePostingsDelta]]
  * writes postings last; `IndexCommit.deltaDirs` filters on it). So:
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
  * (which counts invisible dirs too).
  */
object IndexIngest {

  private def epochTag(id: Long) = s"_epoch_$id"

  /** The `foreachBatch` function: `.writeStream.foreachBatch(
    * IndexIngest.appendBatch(indexPath) _)`. */
  def appendBatch(idx: String)(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = graft.util.IndexCommit.fs(spark, idx)
    val root = new Path(idx)
    // any delta dir already tagged with this epoch? (visible → done;
    // invisible → a crashed attempt to retry in place)
    val tagged = if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta_"))
        .find(s => fs.exists(new Path(s.getPath, epochTag(epochId))))
        .map(_.getPath)
    val dir = tagged match {
      case Some(d) =>
        if (fs.exists(new Path(d, "postings/_SUCCESS"))) return // committed
        d
      case None =>
        val d = new Path(
          s"$idx/delta_${graft.util.IndexCommit.nextDeltaId(spark, idx)}")
        fs.mkdirs(d)
        fs.create(new Path(d, epochTag(epochId)), true).close()
        d
    }
    graft.operators.Retrieval.writePostingsDelta(
      batch.select(batch("doc_id"), batch("text")), dir.toString)
  }
}
