package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity}
import graft.util.IndexCommit

/** Deterministic kill/interleave points for EVERY stored-index
  * maintenance writer (text postings, LSH, IVF-PQ — all compactors
  * route through the same IndexCommit verbs). The hammer specs in
  * [[CompactionVacuumRaceSpec]] rely on scheduler luck to hit an
  * interleaving; here each one is DRIVEN through
  * `IndexCommit.killPoint`:
  *
  *   - crash points: the writer dies exactly at post-stage-write
  *     (`promote:pre`), post-promote (`promote:post`), or with the
  *     pointer tmp staged but unflipped (`commit:pre-flip`) — serving
  *     must be untouched, a grace-0 vacuum of the debris must be
  *     safe, and a rerun must complete the fold;
  *   - interleave points: a grace-0 vacuum runs synchronously AT each
  *     point of the write→promote→flip chain — the fold must survive
  *     and the flip must land on an existing dir;
  *   - the no-pointer window itself (the round-10 hammer failure): a
  *     vacuum that passed its LATEST-exists check sees the pointer
  *     vanish before resolve — transient (restored mid-retry) and
  *     permanent (fail-safe keep-and-skip) variants both injected.
  *
  * Plus a watcher loop pinning the local flip's atomicity: LATEST is
  * never absent across commits (java.nio ATOMIC_MOVE, not the
  * delete-then-rename `FileContext.rename(OVERWRITE)` performs on
  * LocalFs).
  */
class MaintenanceKillPointSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Kill(point: String) extends Exception(point)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def names(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Scope a kill-point hook to one index root (append points report
    * the GENERATION dir, a child of the root — matched by prefix);
    * always uninstalled. */
  private def withHook(dir: String)(f: String => Unit)(body: => Unit): Unit = {
    IndexCommit.killPoint = (point, root) =>
      if (root == dir || root.startsWith(dir + "/")) f(point)
    try body finally IndexCommit.killPoint = (_, _) => ()
  }

  /** One maintenance writer under test: base build + two disjoint
    * delta appends into a fresh dir, plus compact/vacuum/serve.
    * `build` (base + first append) is the compaction-test fixture. */
  private case class Writer(
      name: String,
      buildBase: String => Unit,
      append: String => Unit,
      append2: String => Unit,
      compact: String => Unit,
      vacuum: String => Unit,
      serve: String => Set[String]) {
    def build(dir: String): Unit = { buildBase(dir); append(dir) }
  }

  private lazy val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
  private lazy val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  private lazy val writers = Seq(
    Writer(
      name = "postings",
      buildBase = dir =>
        Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 3 === 0), dir),
      append = dir =>
        Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 1), dir),
      append2 = dir =>
        Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 2), dir),
      compact = Retrieval.compactPostingsIndex(spark, _),
      vacuum = Retrieval.vacuumPostingsIndex(spark, _),
      serve = dir =>
        rows(Retrieval.conjunctiveSearchStored(spark, dir, Retrieval.QueryTerms))),
    Writer(
      name = "lsh",
      buildBase = dir =>
        Similarity.writeLshIndex(emb.filter(col("vec_id") % 3 === 0), dir),
      append = dir =>
        Similarity.appendLshDelta(spark, dir, emb.filter(col("vec_id") % 3 === 1)),
      append2 = dir =>
        Similarity.appendLshDelta(spark, dir, emb.filter(col("vec_id") % 3 === 2)),
      compact = Similarity.compactLshIndex(spark, _),
      vacuum = Similarity.vacuumVectorIndex(spark, _),
      serve = dir =>
        rows(Similarity.lshTopKStored(spark, dir, emb.filter(col("vec_id") < 6), 3))),
    Writer(
      name = "ivfpq",
      buildBase = dir =>
        Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 3 === 0), dir),
      append = dir =>
        Similarity.appendIvfPqDelta(spark, dir, emb.filter(col("vec_id") % 3 === 1)),
      append2 = dir =>
        Similarity.appendIvfPqDelta(spark, dir, emb.filter(col("vec_id") % 3 === 2)),
      compact = Similarity.compactIvfPqIndex(spark, _),
      vacuum = Similarity.vacuumVectorIndex(spark, _),
      serve = dir =>
        rows(Similarity.ivfPqTopKStored(spark, dir, emb.filter(col("vec_id") < 6), 3))))

  private def freshDir(tag: String): String =
    s"/tmp/graft_kill_${tag}_" + java.util.UUID.randomUUID().toString.take(8)

  for (w <- writers) {
    test(s"${w.name}: a compactor crash at each point leaves serving intact, vacuumable, and rerunnable") {
      for (point <- Seq("promote:pre", "promote:post", "commit:pre-flip",
                        "commit:mid-flip")) {
        val dir = freshDir(w.name)
        try {
          w.build(dir)
          val want = w.serve(dir)
          assert(want.nonEmpty, s"vacuous fixture for ${w.name}")
          withHook(dir)(p => if (p == point) throw Kill(point)) {
            assertThrows[Kill](w.compact(dir))
          }
          assert(w.serve(dir) === want, s"crash at $point perturbed serving")
          w.vacuum(dir) // grace-0 vacuum of the crash debris
          assert(w.serve(dir) === want,
            s"vacuum after a crash at $point perturbed serving")
          w.compact(dir) // rerun completes the fold
          w.vacuum(dir)
          val (base, _) = IndexCommit.resolve(spark, dir)
          assert(new java.io.File(base).exists(),
            s"rerun after crash at $point flipped to a missing dir")
          assert(w.serve(dir) === want,
            s"rerun after crash at $point changed serving")
        } finally rm(dir)
      }
    }

    test(s"${w.name}: a grace-0 vacuum injected AT each chain point never breaks the fold") {
      for (point <- Seq("promote:pre", "promote:post", "commit:pre-flip",
                        "commit:mid-flip", "commit:post-flip")) {
        val dir = freshDir(w.name)
        try {
          w.build(dir)
          val want = w.serve(dir)
          withHook(dir)(p => if (p == point) w.vacuum(dir)) {
            w.compact(dir)
          }
          val (base, _) = IndexCommit.resolve(spark, dir)
          assert(new java.io.File(base).exists(),
            s"vacuum at $point reclaimed the dir the flip serves")
          assert(w.serve(dir) === want, s"vacuum at $point changed serving")
          w.vacuum(dir)
          assert(w.serve(dir) === want)
        } finally rm(dir)
      }
    }
  }

  for (w <- writers) {
    test(s"${w.name}: an append crash at each point serves exactly the committed generations and retries clean") {
      // expected servings from an uncrashed twin (data-derived rows —
      // no path-dependent values in any serve projection)
      val ref = freshDir(s"${w.name}_ref")
      val (wantBase, wantFull) = try {
        w.buildBase(ref)
        val b = w.serve(ref)
        w.append(ref)
        (b, w.serve(ref))
      } finally rm(ref)
      assert(wantBase.nonEmpty && wantFull != wantBase,
        s"vacuous append fixture for ${w.name}")
      for (point <- Seq("append:pre-commit", "append:post-commit")) {
        val dir = freshDir(w.name)
        try {
          w.buildBase(dir)
          withHook(dir)(p => if (p == point) throw Kill(point)) {
            assertThrows[Kill](w.append(dir))
          }
          // pre-commit: the generation is INVISIBLE (visibility table
          // unwritten) — serving unchanged; post-commit: the append
          // fully landed before the crash — serving includes it
          val afterCrash =
            if (point == "append:pre-commit") wantBase else wantFull
          assert(w.serve(dir) === afterCrash,
            s"append crash at $point perturbed serving")
          // maintenance over the debris is safe
          w.compact(dir)
          w.vacuum(dir)
          assert(w.serve(dir) === afterCrash,
            s"compact+vacuum after append crash at $point changed serving")
          // a pre-commit crash retries as a fresh append (batch-verb
          // semantics; the streaming sink replays IN PLACE — pinned in
          // the epoch-replay test below); a post-commit crash needs none
          if (point == "append:pre-commit") w.append(dir)
          assert(w.serve(dir) === wantFull,
            s"recovery after append crash at $point lost or duplicated rows")
        } finally rm(dir)
      }
    }

    test(s"${w.name}: a grace-0 vacuum injected AT each append point never perturbs serving") {
      val ref = freshDir(s"${w.name}_ref2")
      val wantAll = try {
        w.buildBase(ref); w.append(ref); w.append2(ref); w.serve(ref)
      } finally rm(ref)
      for (point <- Seq("append:pre-commit", "append:post-commit")) {
        val dir = freshDir(w.name)
        try {
          w.buildBase(dir)
          w.append(dir)
          w.compact(dir) // LATEST exists: vacuum has something to scan
          withHook(dir)(p => if (p == point) w.vacuum(dir)) {
            w.append2(dir)
          }
          assert(w.serve(dir) === wantAll,
            s"vacuum at $point ate the in-flight append")
          w.vacuum(dir)
          assert(w.serve(dir) === wantAll)
        } finally rm(dir)
      }
    }
  }

  test("streaming appendBatch: pre-commit crash replays IN PLACE, post-commit crash skips — exactly once either way") {
    import graft.streaming.IndexIngest
    val dir = freshDir("ingest")
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      val baseOnly = rows(
        Retrieval.conjunctiveSearchStored(spark, dir, Retrieval.QueryTerms))
      val batch = docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("text"))
      def deltaDirs: Set[String] = names(dir).filter(_.startsWith("delta_"))

      // epoch 7 crashes mid-append, before the visibility table
      withHook(dir)(p => if (p == "append:pre-commit") throw Kill(p)) {
        assertThrows[Kill](IndexIngest.appendBatch(dir)(batch, 7L))
      }
      val crashed = deltaDirs
      assert(crashed.size === 1, s"expected one tagged debris dir, got $crashed")
      assert(rows(Retrieval.conjunctiveSearchStored(
        spark, dir, Retrieval.QueryTerms)) === baseOnly,
        "invisible crashed generation served rows")

      // the replayed epoch finds its tag and commits the SAME dir
      IndexIngest.appendBatch(dir)(batch, 7L)
      assert(deltaDirs === crashed, "replay did not retry in place")
      val full = rows(
        Retrieval.conjunctiveSearchStored(spark, dir, Retrieval.QueryTerms))
      assert(full != baseOnly, "replayed epoch served nothing")

      // a crash AFTER commit: the next replay finds the tag on a
      // visible dir and skips — no duplicate generation, no row change
      withHook(dir)(p => if (p == "append:post-commit") throw Kill(p)) {
        IndexIngest.appendBatch(dir)(batch, 7L) // skips before writing
      }
      assert(deltaDirs === crashed)
      assert(rows(Retrieval.conjunctiveSearchStored(
        spark, dir, Retrieval.QueryTerms)) === full)
    } finally rm(dir)
  }

  test("no-pointer window, permanent: vacuum keeps every base when the live id is unknowable") {
    val dir = freshDir("window")
    try {
      val w = writers.head
      w.build(dir)
      w.compact(dir) // LATEST -> base_0
      w.vacuum(dir)  // reclaim the legacy root layout
      val basesBefore = names(dir).filter(_.startsWith("base_"))
      assert(basesBefore.nonEmpty)
      val latest = new java.io.File(s"$dir/LATEST")
      val hidden = new java.io.File(s"$dir/.LATEST_hidden")
      // vacuum passes its exists() check, THEN the pointer vanishes —
      // the exact interleaving that deleted base_1 in round 10's
      // hammer run, now driven mechanically
      withHook(dir)(p => if (p == "vacuum:post-check") {
        assert(latest.renameTo(hidden))
      }) {
        w.vacuum(dir) // resolve retries, exhausts, fail-safe skips
      }
      assert(names(dir).filter(_.startsWith("base_")) === basesBefore,
        "vacuum condemned bases while the live id was unknowable")
      assert(hidden.renameTo(latest))
      assert(w.serve(dir).nonEmpty)
    } finally rm(dir)
  }

  test("no-pointer window, transient: resolve retries through a mid-flip gap instead of taking the legacy fallback") {
    val dir = freshDir("retry")
    try {
      val w = writers.head
      w.build(dir)
      w.compact(dir)
      val (liveBase, _) = IndexCommit.resolve(spark, dir)
      val latest = new java.io.File(s"$dir/LATEST")
      val hidden = new java.io.File(s"$dir/.LATEST_hidden")
      assert(latest.renameTo(hidden))
      val restorer = new Thread(() => {
        Thread.sleep(150)
        hidden.renameTo(latest)
      })
      restorer.start()
      val (resolved, _) = IndexCommit.resolve(spark, dir)
      restorer.join()
      assert(resolved === liveBase,
        s"resolve fell back to the legacy layout inside the flip window: $resolved")
    } finally rm(dir)
  }

  test("the local pointer flip is atomic: LATEST is never absent across repeated commits") {
    val dir = freshDir("atomic")
    try {
      new java.io.File(dir).mkdirs()
      IndexCommit.commit(spark, dir, "base_0", 0)
      @volatile var stop = false
      @volatile var misses = 0
      val f = new java.io.File(s"$dir/LATEST")
      val watcher = new Thread(() => {
        while (!stop) if (!f.exists()) misses += 1
      })
      watcher.start()
      for (i <- 1 to 300) IndexCommit.commit(spark, dir, s"base_$i", i)
      stop = true
      watcher.join()
      assert(misses === 0,
        s"LATEST observed absent $misses times across 300 flips")
      assert(IndexCommit.resolve(spark, dir) === (s"$dir/base_300", 300))
    } finally rm(dir)
  }
}
