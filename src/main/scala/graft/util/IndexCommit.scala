package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomic generation-pointer commit protocol for the stored serving
  * indexes (text postings, IVF/LSH vectors) — the same contract the
  * GraphAr versioned sink uses (`GraphArMutations.scala`: write the
  * full new state beside the old, then repoint `LATEST` atomically).
  *
  * Layout: the index root holds the LIVE base generation named by a
  * one-line `LATEST` file (`base_<n> <minDelta>`), plus any
  * `delta_<k>` append generations. Readers resolve LATEST once, then
  * union the named base with every delta `k >= minDelta`. A legacy
  * index (no LATEST file) keeps its base dirs at the root with
  * minDelta 0 — resolution falls back transparently.
  *
  * Compaction SAFETY: the compactor writes the folded base as a NEW
  * `base_<n+1>` dir and flips the pointer; nothing the previous
  * pointer referenced is deleted, so a reader that resolved the old
  * pointer — even one already mid-scan — completes against intact
  * files and, by the union-serving contract, sees identical rows.
  * Superseded generations are reclaimed by an explicit vacuum once
  * in-flight readers have drained (the Iceberg/Delta retention
  * split: commit is atomic, space reclaim is deferred). A crash
  * before the pointer flip leaves the index on the old base with a
  * dead `base_<n+1>` dir that the next vacuum removes; the pointer
  * flip itself is a same-directory rename — atomic on HDFS and
  * POSIX.
  */
object IndexCommit {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Test-only interleave/crash injection hook. Maintenance verbs call
    * [[at]] at each named point of the write→promote→flip→vacuum chain
    * (and the delta APPEND writers at `append:pre-commit` /
    * `append:post-commit`, bracketing their visibility-table write);
    * a spec installs a callback that either THROWS (simulating a crash
    * exactly there) or runs a concurrent verb (vacuum, a reader probe)
    * exactly there — so every interleaving the hammer specs could only
    * hit by scheduler luck is driven deterministically. Production
    * cost: one volatile read per point. */
  @volatile private[graft] var killPoint: (String, String) => Unit =
    (_, _) => ()

  private[graft] def at(point: String, root: String): Unit =
    killPoint(point, root)

  /** Resolve the live base: (baseDir, minDelta). Legacy layout (no
    * LATEST) → the root itself with every delta applicable.
    *
    * Retries through transient checksum mismatches: on a
    * ChecksumFileSystem (local fs — HDFS/object stores verify
    * server-side, no sidecar) the pointer flip renames the data file
    * and its `.crc` sidecar in TWO steps, so a reader racing a commit
    * can momentarily see new bytes against the old checksum. The
    * window closes as soon as both renames land; persistent failure
    * (real corruption) still throws. Found by the grace-0
    * vacuum-vs-compaction hammer spec, not hypothesized.
    *
    * A MISSING pointer is equally suspect when the root holds
    * `base_<n>` / `.staging_base_<n>` dirs: that state is either the
    * transient no-pointer window of a non-atomic flip (a remote fs
    * whose overwrite-rename is delete-then-rename) or a crash between
    * a first build's promote and its flip. Taking the legacy fallback
    * immediately was the root cause of the grace-0 hammer failure —
    * vacuum's resolve saw (root, 0), got no live base id, and the old
    * `getOrElse(true)` classification condemned every base the
    * in-flight flip was about to serve. Now: retry through the
    * window; only a root with NO versioned dirs (a genuinely
    * unversioned legacy index) returns `(root, 0)` at once. If the
    * pointer never appears (abandoned first-build crash), fall back
    * to legacy after the retries — [[vacuum]] independently fail-safes
    * on an unknown live id, so the fallback can never turn
    * destructive. */
  def resolve(spark: SparkSession, root: String): (String, Int) = {
    val f = fs(spark, root)
    val p = new Path(s"$root/LATEST")
    // lazy val: ONE listStatus for the whole retry loop, not one per
    // iteration — an abandoned pre-first-flip crash state used to cost
    // every serving-path resolve 50 listStatus calls on top of the
    // 500 ms retry budget. Versioned-dir detection requires an
    // all-digit id suffix: a plain `startsWith("base_")` also matched
    // unrelated names like `base_data`, dragging a genuinely legacy
    // root into the retry loop. The dir listing is read once; a
    // concurrent first-flip landing mid-retry is still seen because
    // the pointer's OWN existence is re-checked every iteration.
    lazy val hasVersionedDirs: Boolean = {
      def versioned(n: String, prefix: String): Boolean =
        n.length > prefix.length && n.startsWith(prefix) &&
          n.stripPrefix(prefix).forall(_.isDigit)
      val rp = new Path(root)
      f.exists(rp) && f.listStatus(rp).exists { s =>
        val n = s.getPath.getName
        s.isDirectory &&
          (versioned(n, "base_") || versioned(n, ".staging_base_"))
      }
    }
    var attempt = 0
    while (true) {
      if (!f.exists(p)) {
        if (!hasVersionedDirs) return (root, 0)
        attempt += 1
        if (attempt >= 50) return (root, 0) // abandoned pre-first-flip
        Thread.sleep(10)
      } else try {
        val in = f.open(p)
        val line = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().next().trim finally in.close()
        val Array(base, minDelta) = line.split(' ')
        return (s"$root/$base", minDelta.toInt)
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.FileNotFoundException) =>
          attempt += 1
          if (attempt >= 50) throw e
          Thread.sleep(10)
      }
    }
    sys.error("unreachable")
  }

  /** Atomically repoint LATEST: write a temp file, then ONE atomic
    * overwriting rename. A delete-then-rename pair would leave a
    * window with NO pointer — a reader in that window resolves the
    * legacy layout (wrong rows once the root has been vacuumed), and
    * a vacuum in that window used to lose the live base id entirely.
    *
    * On a `file:` root, `FileContext.rename(OVERWRITE)` does NOT
    * deliver atomicity — Hadoop's local AbstractFileSystem implements
    * overwrite as delete(dst) + rename(src) — so the flip goes through
    * `java.nio.Files.move(ATOMIC_MOVE | REPLACE_EXISTING)` instead (a
    * true atomic overwrite on POSIX). The ChecksumFileSystem `.crc`
    * sidecar ordering matters for CRASH safety, not just races: the
    * old sidecar is DELETED first, then the data file moves, then the
    * new sidecar moves into place. A missing `.crc` makes
    * ChecksumFileSystem skip verification, so a crash at ANY point in
    * the chain leaves a readable pointer (old bytes unverified, or new
    * bytes unverified). Moving the new crc before the data — the
    * previous order — left a crash window holding new-crc-against-
    * old-bytes: a PERMANENT ChecksumException every reader retried 50×
    * and then threw, until the next successful commit. A live reader
    * racing the chain can still catch a transient mismatch (crc read
    * before the delete, bytes after the move), which [[resolve]]
    * retries through. Non-local schemes keep the FileContext rename
    * (atomic on HDFS; object stores overwrite atomically at PUT
    * granularity, with no client-side crc sidecar). */
  def commit(spark: SparkSession, root: String, base: String,
             minDelta: Int): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/.LATEST_tmp")
    val out = f.create(tmp, true)
    try out.write(s"$base $minDelta\n".getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$root/LATEST")
    at("commit:pre-flip", root)
    val dstUri = f.makeQualified(dst).toUri
    if (dstUri.getScheme == "file") {
      import java.nio.file.{Files, Paths, StandardCopyOption => O}
      val d = Paths.get(f.makeQualified(new Path(root)).toUri.getPath)
      val tmpCrc = d.resolve(".".concat(tmp.getName).concat(".crc"))
      val dstCrc = d.resolve(".".concat(dst.getName).concat(".crc"))
      Files.deleteIfExists(dstCrc)
      Files.move(d.resolve(tmp.getName), d.resolve(dst.getName),
        O.ATOMIC_MOVE, O.REPLACE_EXISTING)
      // the crash window between the two moves: pointer flipped, new
      // crc not yet in place — readable (verification skipped), pinned
      // deterministically by MaintenanceKillPointSpec
      at("commit:mid-flip", root)
      if (Files.exists(tmpCrc))
        Files.move(tmpCrc, dstCrc, O.REPLACE_EXISTING)
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dstUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    at("commit:post-flip", root)
  }

  /** Staging name for a base generation mid-write. Writers build the
    * folded base HERE and [[promoteStaged]] it to `base_<n>` only
    * right before the pointer flip — the staging prefix is outside
    * every name class vacuum's dead-scan matches, so a grace-0 vacuum
    * running concurrently with a slow compaction can NEVER classify
    * the half-built fold as a superseded base and delete it out from
    * under the upcoming flip. */
  def stagingOf(gen: String): String = s".staging_$gen"

  /** Prepare a clean staging dir for `gen` (reclaiming same-id crash
    * debris — a crashed compactor's staging dir is reused, never
    * promoted blind) and return its path. */
  def stageBase(spark: SparkSession, root: String, gen: String): String = {
    val f = fs(spark, root)
    val st = new Path(s"$root/${stagingOf(gen)}")
    if (f.exists(st)) f.delete(st, true)
    st.toString
  }

  /** Atomically rename the staged dir to its final generation name —
    * call immediately before [[commit]]. Between this rename and the
    * flip the dir's id is ≥ the live pointer's, which [[vacuum]]'s
    * monotonic-id rule treats as not-dead — the full write→promote→
    * flip chain has no window where any pass can reclaim it. */
  def promoteStaged(spark: SparkSession, root: String, gen: String): Unit = {
    at("promote:pre", root)
    val f = fs(spark, root)
    val src = new Path(s"$root/${stagingOf(gen)}")
    val dst = new Path(s"$root/$gen")
    require(f.exists(src), s"nothing staged at $src")
    require(!f.exists(dst),
      s"$dst already exists — a concurrent writer promoted this id; " +
        "compaction is single-writer (rerun to fold onto a fresh id)")
    require(f.rename(src, dst), s"rename $src -> $dst failed")
    at("promote:post", root)
  }

  /** Next base generation id: one past the highest existing base_<n>. */
  def nextBaseId(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) 0
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("base_"))
      .flatMap(_.getPath.getName.stripPrefix("base_").toIntOption)
      .foldLeft(-1)(math.max) + 1
  }

  /** Sorted delta generation dirs under the root with id >= minDelta.
    * `commitSub` (when set) is the table whose parquet `_SUCCESS` file
    * — written LAST by the append — makes a generation VISIBLE: a
    * half-written delta (crashed append, in-flight retry) serves
    * nothing and is retried in place. Ids of invisible dirs are still
    * never reused ([[nextDeltaId]] counts every dir). */
  def deltaDirs(spark: SparkSession, root: String,
                minDelta: Int = 0,
                commitSub: Option[String] = None): Seq[String] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta_"))
      .flatMap(s => s.getPath.getName.stripPrefix("delta_").toIntOption
        .map(id => (id, s.getPath)))
      .filter(_._1 >= minDelta)
      .filter(t => commitSub.forall(sub =>
        f.exists(new Path(t._2, s"$sub/_SUCCESS"))))
      .sortBy(_._1)
      .map(_._2.toString)
  }

  /** Next generation id: one past the highest existing delta_<k> OR
    * tomb_<k>, and never below the live pointer's minDelta watermark —
    * ids must not be reused, but the dirs alone can't prove that once
    * a VACUUM has reclaimed the folded generations (an id below the
    * watermark would make the new generation invisible to every
    * reader; this exact bug made a post-vacuum delete a silent no-op
    * before the floor existed). Append and tombstone generations share
    * ONE sequence: their relative order is what decides whether a
    * delete fences a row (a doc re-appended AFTER its deletion must
    * serve). */
  def nextDeltaId(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val p = new Path(root)
    val fromDirs = if (!f.exists(p)) 0
      else f.listStatus(p).toSeq
        .filter(s => s.isDirectory &&
          (s.getPath.getName.startsWith("delta_") ||
            s.getPath.getName.startsWith("tomb_")))
        .flatMap(_.getPath.getName.split('_').last.toIntOption)
        .foldLeft(-1)(math.max) + 1
    math.max(fromDirs, resolve(spark, root)._2)
  }

  /** Sorted COMMITTED tombstone generation dirs with id >= minDelta.
    * A tombstone dir is visible only once its `_COMMIT` marker exists
    * (written last), so a crashed half-written delete never fences
    * anything. */
  def tombDirs(spark: SparkSession, root: String,
               minDelta: Int = 0): Seq[String] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tomb_"))
      .flatMap(s => s.getPath.getName.stripPrefix("tomb_").toIntOption
        .map(id => (id, s.getPath)))
      .filter(_._1 >= minDelta)
      .filter(t => f.exists(new Path(t._2, "_COMMIT")))
      .sortBy(_._1)
      .map(_._2.toString)
  }

  /** Set the PER-INDEX maintenance policy, stored with the index as a
    * `_POLICY` key=value file at its root — the stored-index twin of
    * the snapshot base's `_RETENTION` property: the generation cap AND
    * the vacuum grace window travel with the index and bind EVERY
    * writer (batch verbs and streaming ingest sinks alike), not just
    * sessions carrying `spark.graft.maxIndexDeltas`. Written with the
    * LATEST commit protocol (tmp + one overwriting rename), so an
    * appender's cap check never reads a partial file.
    *
    * MERGE-only: a key not given keeps its stored value. Removal is a
    * separate, explicit verb — [[clearPolicy]] — because a both-None
    * call used to delete the whole file, silently dropping a stored
    * grace window (the exact failure the merge semantics exist to
    * prevent); it now refuses. */
  def setPolicy(spark: SparkSession, root: String,
                maxDeltas: Option[Int],
                vacuumGraceMs: Option[Long] = None): Unit = {
    val f = fs(spark, root)
    val p = new Path(s"$root/_POLICY")
    require(maxDeltas.nonEmpty || vacuumGraceMs.nonEmpty,
      "setPolicy with no keys is ambiguous — it MERGES, so there is " +
        "nothing to do; to remove stored policy use clearPolicy " +
        "(whole file or one key)")
    require(maxDeltas.forall(_ >= 1),
      s"maxDeltas must be >= 1, got $maxDeltas")
    require(vacuumGraceMs.forall(_ >= 0),
      s"vacuumGraceMs must be >= 0, got $vacuumGraceMs")
    // MERGE with the stored policy: a key not given keeps its stored
    // value — updating the compaction cap must not silently drop the
    // vacuum grace window (a scheduled vacuum would stop honoring
    // in-flight readers). Clear the whole policy with both None.
    val merged = readPolicy(spark, root) ++
      maxDeltas.map(v => "maxDeltas" -> v.toString) ++
      vacuumGraceMs.map(v => "vacuumGraceMs" -> v.toString)
    writePolicyFile(spark, root, merged)
  }

  /** Remove stored policy EXPLICITLY: the whole `_POLICY` file (key =
    * None) or one named key, keeping the rest — removing the
    * compaction cap must not take the vacuum grace window with it. */
  def clearPolicy(spark: SparkSession, root: String,
                  key: Option[String] = None): Unit = {
    val f = fs(spark, root)
    val p = new Path(s"$root/_POLICY")
    key match {
      case None => f.delete(p, false)
      case Some(k) =>
        require(k == "maxDeltas" || k == "vacuumGraceMs",
          s"unknown policy key '$k' (maxDeltas | vacuumGraceMs)")
        val kept = readPolicy(spark, root) - k
        if (kept.isEmpty) f.delete(p, false)
        else writePolicyFile(spark, root, kept)
    }
  }

  /** tmp + one overwriting rename (the LATEST protocol): a concurrent
    * policy read never sees a partial file. */
  private def writePolicyFile(spark: SparkSession, root: String,
                              entries: Map[String, String]): Unit = {
    val f = fs(spark, root)
    val p = new Path(s"$root/_POLICY")
    val body = entries.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v\n" }.mkString
    val tmp = new Path(s"$root/._POLICY.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.makeQualified(p).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), f.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The `_POLICY` file's key=value map ({} when absent). */
  private def readPolicy(spark: SparkSession,
                         root: String): Map[String, String] = {
    val f = fs(spark, root)
    val p = new Path(s"$root/_POLICY")
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .flatMap { l =>
        l.split('=') match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap finally in.close()
  }

  /** The index's stored generation cap (None when unset). */
  def policyMaxDeltas(spark: SparkSession, root: String): Option[Int] =
    readPolicy(spark, root).get("maxDeltas").map(_.toInt)

  /** The index's stored vacuum grace window, ms (None when unset):
    * how long a superseded generation must stay on disk after a
    * vacuum first MARKS it dead before a later vacuum may reclaim it
    * — the in-flight-reader protection that makes vacuum safe to run
    * on a schedule instead of only in a drained maintenance window. */
  def policyVacuumGraceMs(spark: SparkSession,
                          root: String): Option[Long] =
    readPolicy(spark, root).get("vacuumGraceMs").map(_.toLong)

  /** Resolve the effective generation cap for an index: the stored
    * `_POLICY` wins, the session conf `spark.graft.maxIndexDeltas` is
    * the fallback, neither = 0 (manual compaction only). */
  def effectiveMaxDeltas(spark: SparkSession, root: String): Int =
    policyMaxDeltas(spark, root)
      .orElse(spark.conf.getOption("spark.graft.maxIndexDeltas").map(_.toInt))
      .getOrElse(0)

  /** Reclaim every generation the live pointer no longer references:
    * superseded base_<n> dirs, folded deltas (< minDelta), and — when
    * a pointer exists — the legacy root-level base dirs in
    * `legacyDirs`.
    *
    * With NO `vacuumGraceMs` policy, reclaim is immediate — run only
    * after in-flight readers of the old pointer have drained (the
    * drained-maintenance-window contract). With a grace window set,
    * vacuum is MARK-AND-SWEEP: the first pass that sees a dead
    * generation stamps it (`_DEAD_SINCE`, epoch ms — the stamp is
    * inside a dir no live reader plans, so it never perturbs a scan),
    * and only a pass running ≥ grace after the stamp deletes it. A
    * reader that resolved the old pointer has the whole window to
    * finish, so an age-based schedule (cron, post-compaction hook)
    * can call vacuum blindly and never race a reader — the reclaim
    * half of the `_POLICY` contract. */
  def vacuum(spark: SparkSession, root: String,
             legacyDirs: Seq[String]): Unit = {
    at("vacuum:pre", root)
    val f = fs(spark, root)
    val latest = new Path(s"$root/LATEST")
    if (!f.exists(latest)) return // legacy layout: nothing superseded
    // the historical race window: the exists() above and the resolve()
    // below read the pointer at DIFFERENT instants — a flip landing
    // between them is exactly what the kill-point spec injects here
    at("vacuum:post-check", root)
    val grace = policyVacuumGraceMs(spark, root).getOrElse(0L)
    val now = System.currentTimeMillis
    val (baseDir, minDelta) = resolve(spark, root)
    val baseName = baseDir.split('/').last
    // dead bases are decided by MONOTONIC id, not name inequality: a
    // base_<n> with n ≥ the live pointer's id is a compactor's fold
    // mid-commit (promoted from staging, flip pending) or failed-flip
    // debris the next successful fold will supersede — deleting it
    // would race the flip into serving a missing dir. Ids only ever
    // advance, so "< live id" is exactly "superseded".
    // toIntOption, not toInt: an overflowing all-digit suffix
    // (base_99999999999 debris) must classify as unparseable, not
    // abort the whole pass with NumberFormatException.
    def idOf(n: String, prefix: String): Option[Int] =
      if (n.startsWith(prefix) && n.stripPrefix(prefix).forall(_.isDigit)
          && n.length > prefix.length)
        n.stripPrefix(prefix).toIntOption
      else None
    val liveBaseId = idOf(baseName, "base_")
    // FAIL-SAFE: a vacuum that cannot prove which base is live must
    // not delete any. liveBaseId is None when resolve fell back to
    // the legacy layout (pointer missing through its whole retry
    // window — an abandoned first-build crash) or when LATEST names
    // something unparseable. The old `getOrElse(true)` here condemned
    // EVERY base in that state — the grace-0 hammer spec caught it
    // deleting the base a concurrent flip was about to serve. Skip
    // the pass; a later vacuum with a readable pointer reclaims.
    if (liveBaseId.isEmpty) return
    f.listStatus(new Path(root)).toSeq.foreach { s =>
      val n = s.getPath.getName
      val dead =
        (n.startsWith("base_") && n != baseName &&
          // unparseable base ids are kept: deleting what we cannot
          // order against the live pointer is never the safe branch
          idOf(n, "base_").exists(_ < liveBaseId.get)) ||
        (n.startsWith("delta_") &&
          idOf(n, "delta_").exists(_ < minDelta)) ||
        (n.startsWith("tomb_") &&
          idOf(n, "tomb_").exists(_ < minDelta)) ||
        // staging debris whose id the pointer has passed can never be
        // promoted (promoteStaged refuses an existing target and
        // compactors reuse-or-clean their own id) — reclaim it
        (liveBaseId.nonEmpty && idOf(n, ".staging_base_").exists(
          _ < liveBaseId.get)) ||
        legacyDirs.contains(n)
      if (dead) {
        if (grace <= 0) f.delete(s.getPath, true)
        else {
          val marker = new Path(s.getPath, "_DEAD_SINCE")
          // stamp via tmp + one overwriting rename (the LATEST/_POLICY
          // protocol): a crash mid-write must not leave a truncated
          // stamp that breaks every later vacuum pass
          def stamp(): Unit = {
            val tmp = new Path(s.getPath, "._DEAD_SINCE.tmp")
            val out = f.create(tmp, true)
            try out.write(s"$now\n".getBytes("UTF-8")) finally out.close()
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(
              f.makeQualified(marker).toUri,
              spark.sparkContext.hadoopConfiguration)
            fc.rename(f.makeQualified(tmp), f.makeQualified(marker),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          }
          if (!f.exists(marker)) stamp()
          else {
            val since = {
              val in = f.open(marker)
              try scala.util.Try(scala.io.Source
                .fromInputStream(in, "UTF-8").getLines().next().trim.toLong)
                .toOption
              finally in.close()
            }
            since match {
              case Some(ts) if now - ts >= grace => f.delete(s.getPath, true)
              case Some(_) => () // still inside the window
              // unreadable stamp (pre-protocol crash artifact):
              // re-stamp — restarting the clock is the safe direction
              case None => stamp()
            }
          }
        }
      }
    }
  }
}
