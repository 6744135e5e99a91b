package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Index maintenance triangle: append generations serve identically to
  * a full rebuild (gate-checked by t_search_delta / t_phrase_delta),
  * compaction commits ATOMICALLY (pointer flip; a reader planned
  * before the fold collects identical rows after it, no
  * missing-directory window), and vacuum — the deferred reclaim —
  * leaves only the live generation.
  */
class RetrievalCompactionSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  // a bigram present in sf0.001 (the gate trigram 'slow hash batch' has
  // zero sf0.001 occurrences — an empty-vs-empty phrase check would be
  // vacuous, which is exactly how the r8 delta-blind probe slipped by)
  private val Bigram = Seq("slow", "hash")

  test("compaction is atomic: pointer flip, identical rows, pre-fold reader survives, vacuum reclaims") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_text_compact_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 3 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 1), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 2), dir)
      val terms = Retrieval.QueryTerms
      val searchBefore = rows(
        Retrieval.conjunctiveSearchStored(spark, dir, terms))
      val bm25Before = rows(Retrieval.bm25TopKStored(spark, dir, terms))
      val phraseBefore = rows(Retrieval.phraseCountStored(spark, dir, Bigram))
      assert(searchBefore.nonEmpty && bm25Before.nonEmpty)
      // non-vacuous: the bigram occurs, and in docs of a DELTA
      // generation (doc_id % 3 != 0), so base-only serving would differ
      assert(phraseBefore.nonEmpty, "gate bigram absent from fixture")
      val deltaOnly = rows(Retrieval.phraseCountStored(spark, dir, Bigram)
        .join(docs.filter(col("doc_id") % 3 =!= 0), "doc_id")
        .select(col("doc_id")))
      assert(deltaOnly.nonEmpty,
        "bigram hits no delta-generation doc — the delta-union check is vacuous")

      // reader planned BEFORE the fold…
      val preFoldReader = Retrieval.phraseCountStored(spark, dir, Bigram)

      Retrieval.compactPostingsIndex(spark, dir)

      // commit is pointer-only: old generations still on disk (crash
      // safety + concurrent readers), LATEST names the folded base
      val afterCommit = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(afterCommit.contains("LATEST"))
      assert(afterCommit.exists(_.startsWith("base_")))
      assert(afterCommit.exists(_.startsWith("delta_")),
        "commit must not delete — reclaim is vacuum's job")
      // …collected AFTER it: identical rows, no failure window
      assert(rows(preFoldReader) === phraseBefore)
      // fresh readers resolve the folded base, same rows
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === searchBefore)
      assert(rows(Retrieval.bm25TopKStored(spark, dir, terms)) === bm25Before)
      assert(rows(Retrieval.phraseCountStored(spark, dir, Bigram))
        === phraseBefore)

      Retrieval.vacuumPostingsIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("delta_")),
        s"folded deltas survived vacuum: $left")
      assert(!left.contains("postings"),
        s"legacy root base survived vacuum: $left")
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === searchBefore)
      assert(rows(Retrieval.phraseCountStored(spark, dir, Bigram))
        === phraseBefore)
      // compacting an already-compact index is a no-op
      Retrieval.compactPostingsIndex(spark, dir)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === searchBefore)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  test("post-compaction appends serve and re-compact correctly (delta ids never reused)") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_text_recompact_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      val full = rows(Retrieval.conjunctiveSearchStored(spark,
        Retrieval.indexDir(spark, "/root/testdata/sf0.001"),
        Retrieval.QueryTerms))
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 3 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 1), dir)
      Retrieval.compactPostingsIndex(spark, dir)
      // append AFTER a compaction: its id must be past the folded ones,
      // so the new delta is live under the flipped pointer
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 2), dir)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === full)
      Retrieval.compactPostingsIndex(spark, dir)
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === full)
      // generation ids after a VACUUM (folded dirs gone) must clear the
      // minDelta watermark: a reused low id would make the mutation
      // INVISIBLE — a post-vacuum delete was a silent no-op until
      // nextDeltaId gained the watermark floor (caught by the 20M
      // delete-lifecycle rung, not the gates: they never vacuumed first)
      Retrieval.deletePostingsDocs(spark, dir,
        docs.filter(col("doc_id") % 3 === 2).select(col("doc_id")))
      val afterDel = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms))
      assert(afterDel !== full, "post-vacuum delete fenced nothing")
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 2), dir)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === full,
        "post-vacuum re-append did not serve")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  test("tombstoned deletes fence base+delta rows, upserts serve the new version, compaction folds them away") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_text_tomb_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      // lifecycle: evens at build, odds appended, %5 deleted (victims in
      // BOTH generations), %10 re-appended with a marker token (upsert)
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 2 =!= 0), dir)
      Retrieval.deletePostingsDocs(spark, dir,
        docs.filter(col("doc_id") % 5 === 0).select(col("doc_id")))
      val revised = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" zzrevz")).as("text"))
      Retrieval.appendPostingsDelta(revised, dir)
      // reference: one fresh build over the corpus the lifecycle leaves
      val survivors = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("text")).unionByName(revised)
      Retrieval.writePostingsIndex(survivors, ref)

      val terms = Retrieval.QueryTerms
      def probes(d: String) = Seq(
        rows(Retrieval.conjunctiveSearchStored(spark, d, terms)),
        rows(Retrieval.bm25TopKStored(spark, d, terms)), // negative stats
        rows(Retrieval.phraseCountStored(spark, d, Bigram)),
        // dictionary-expanded prefix probe through the same fence
        rows(Retrieval.prefixSearchStored(spark, d, "s")))
      val want = probes(ref)
      assert(want.forall(_.nonEmpty), "vacuous fixture: a probe is empty")
      assert(probes(dir) === want,
        "tombstone-fenced serving diverged from a fresh build over survivors")
      // the upsert is observable: the marker bigram matches re-appended
      // docs only in their NEW version (old rows must be fenced, or
      // (term, doc) would double and hits would drift)
      val markerHits = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Seq("zzrevz")))
      assert(markerHits ===
        rows(Retrieval.conjunctiveSearchStored(spark, ref, Seq("zzrevz"))))
      assert(markerHits.nonEmpty, "upsert marker absent — vacuous")
      // deleting a doc that is not live is a no-op (stats row is 0/0)
      Retrieval.deletePostingsDocs(spark, dir,
        spark.range(1).select((col("id") + 1000000000L).as("doc_id")))
      assert(probes(dir) === want)
      // an over-broad wildcard FAILS rather than silently capping recall
      assertThrows[IllegalArgumentException](
        Retrieval.prefixSearchStored(spark, dir, "s", maxExpansions = 1))

      // pre-fold reader survives the atomic commit; fold removes the
      // fence (tombstones superseded by the new base watermark)
      val preFold = Retrieval.bm25TopKStored(spark, dir, terms)
      Retrieval.compactPostingsIndex(spark, dir)
      assert(rows(preFold) === want(1))
      assert(probes(dir) === want)
      Retrieval.vacuumPostingsIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("tomb_")),
        s"folded tombstones survived vacuum: $left")
      assert(probes(dir) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("delete-everything then compact leaves a servable, appendable index") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_text_purge_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") < 50), dir)
      Retrieval.deletePostingsDocs(spark, dir,
        docs.filter(col("doc_id") < 50).select(col("doc_id")))
      // the purge lifecycle: fold the now-empty index, reclaim, and
      // keep serving (empty) and accepting new generations
      Retrieval.compactPostingsIndex(spark, dir)
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms).isEmpty)
      assert(Retrieval.bm25TopKStored(spark, dir,
        Retrieval.QueryTerms).isEmpty)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") < 20), dir)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === rows(Retrieval.conjunctiveSearch(
        docs.filter(col("doc_id") < 20), Retrieval.QueryTerms)))
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("IVF delta append == monolithic build with the same centroids; compaction atomic + vacuum") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    // split even/odd: every centroid id (vec_id % 40 == 0) is even, so
    // the base build's centroid set IS the full corpus's — the frozen-
    // centroid delta index must then equal a from-scratch full build
    val dir = "/tmp/graft_ivf_delta_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfDelta(spark, dir, emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.writeIvfIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      val got = Similarity.ivfTopKStored(spark, dir, queries, 3, nProbe = 2)
      got.collect()
      // both generations' scans carry the static cluster filter
      val p = got.queryExecution.executedPlan.toString
      assert(p.linesIterator.count(_.contains("PartitionFilters: [cluster"))
        >= 2, s"probe did not prune both generations:\n$p")
      val want = rows(Similarity.ivfTopKStored(spark, ref, queries, 3,
        nProbe = 2))
      assert(rows(got) === want,
        "delta-generation probe diverged from the monolithic build")
      // pre-fold reader survives the atomic commit with identical rows
      val preFold = Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)
      Similarity.compactIvfIndex(spark, dir)
      assert(rows(preFold) === want)
      val afterCommit = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(afterCommit.contains("LATEST") &&
        afterCommit.exists(_.startsWith("delta_")),
        s"commit must be pointer-only: $afterCommit")
      Similarity.vacuumVectorIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("delta_")),
        s"deltas survived vacuum: $left")
      assert(left.contains("centroids"), "vacuum must not touch centroids")
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("IVF tombstoned deletes fence every generation; restore serves once; compaction folds the fence away") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_ivf_tomb_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      // deletes = odd multiples of 3 (never a % 40 == 0 centroid id, so
      // the monolithic reference build freezes the SAME centroid set);
      // restores = the odd-multiples-of-9 subset
      val deleted = col("vec_id") % 2 === 1 && col("vec_id") % 3 === 0
      val restored = col("vec_id") % 2 === 1 && col("vec_id") % 9 === 0
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.deleteVectors(spark, dir,
        emb.filter(deleted).select(col("vec_id")))
      Similarity.appendIvfDelta(spark, dir, emb.filter(restored))
      Similarity.writeIvfIndex(emb.filter(!deleted || restored), ref)

      val queries = emb.filter(col("vec_id") < 8)
      def probe(d: String) =
        Similarity.ivfTopKStored(spark, d, queries, 3, nProbe = 2)
      val want = rows(probe(ref))
      assert(rows(probe(dir)) === want,
        "tombstone-fenced probe diverged from the monolithic served-set build")
      // the fence is observable: the full no-delete index ranks differently
      assert(want !== rows(Similarity.ivfTopKStored(spark,
        Similarity.indexDir(spark, "/root/testdata/sf0.001") + "/ivf",
        queries, 3, nProbe = 2)), "vacuous: deletes did not change the probe")

      val preFold = probe(dir)
      Similarity.compactIvfIndex(spark, dir)
      assert(rows(preFold) === want)
      Similarity.vacuumVectorIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("tomb_")),
        s"folded tombstones survived vacuum: $left")
      assert(rows(probe(dir)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("PQ delta append == monolithic encode (frozen codebook); tombstones fold; compaction + vacuum") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_pq_tomb_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      val deleted = col("vec_id") % 2 === 1 && col("vec_id") % 3 === 0
      val restored = col("vec_id") % 2 === 1 && col("vec_id") % 9 === 0
      Similarity.writePqIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendPqDelta(spark, dir, emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.deleteVectors(spark, dir,
        emb.filter(deleted).select(col("vec_id")))
      Similarity.appendPqDelta(spark, dir, emb.filter(restored))
      // reference: monolithic build over the served set — the frozen
      // codebook equals it (all % 40 == 0 sources are even, never deleted)
      Similarity.writePqIndex(emb.filter(!deleted || restored), ref)
      val queries = emb.filter(col("vec_id") < 8)
      def probe(d: String) = Similarity.pqTopKStored(spark, d, queries, 3)
      val want = rows(probe(ref))
      assert(rows(probe(dir)) === want,
        "PQ generational serving diverged from the monolithic served-set encode")
      val preFold = probe(dir)
      Similarity.compactPqIndex(spark, dir)
      assert(rows(preFold) === want)
      Similarity.vacuumVectorIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(n => n.startsWith("tomb_") || n.startsWith("delta_")),
        s"folded generations survived vacuum: $left")
      assert(left.contains("codebook"), "vacuum must not touch the codebook")
      assert(rows(probe(dir)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("IVF-PQ delta append == monolithic build (frozen centroids+codebook); tombstones fence; compaction + vacuum") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_ivfpq_tomb_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      val deleted = col("vec_id") % 2 === 1 && col("vec_id") % 3 === 0
      val restored = col("vec_id") % 2 === 1 && col("vec_id") % 9 === 0
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfPqDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.deleteVectors(spark, dir,
        emb.filter(deleted).select(col("vec_id")))
      Similarity.appendIvfPqDelta(spark, dir, emb.filter(restored))
      // reference: monolithic build over the served set — both frozen
      // sidecars equal it (every % 40 == 0 source is even, never deleted)
      Similarity.writeIvfPqIndex(emb.filter(!deleted || restored), ref)
      val queries = emb.filter(col("vec_id") < 8)
      def probe(d: String) =
        Similarity.ivfPqTopKStored(spark, d, queries, 3, nProbe = 2)
      val got = probe(dir)
      got.collect()
      // every generation's codes scan carries the static cluster filter
      val p = got.queryExecution.executedPlan.toString
      assert(p.linesIterator.count(_.contains("PartitionFilters: [cluster"))
        >= 3, s"IVF-PQ probe did not prune every generation:\n$p")
      val want = rows(probe(ref))
      assert(rows(got) === want,
        "IVF-PQ generational serving diverged from the monolithic served-set build")
      // the fence is observable (vacuity guard on the delete set)
      assert(want !== rows(Similarity.ivfPqTopKStored(spark,
        Similarity.indexDir(spark, "/root/testdata/sf0.001") + "/ivfpq",
        queries, 3, nProbe = 2)), "vacuous: deletes did not change the probe")
      // inline twin agrees with the stored probe on the clean corpus
      assert(rows(Similarity.ivfPqTopK(emb, col("vec_id") < 8, 3, nProbe = 2))
        === rows(Similarity.ivfPqTopKStored(spark,
          Similarity.indexDir(spark, "/root/testdata/sf0.001") + "/ivfpq",
          queries, 3, nProbe = 2)))
      val preFold = probe(dir)
      Similarity.compactIvfPqIndex(spark, dir)
      assert(rows(preFold) === want)
      Similarity.vacuumVectorIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(n => n.startsWith("tomb_") || n.startsWith("delta_")),
        s"folded generations survived vacuum: $left")
      assert(left.contains("centroids") && left.contains("codebook"),
        "vacuum must not touch the frozen sidecars")
      assert(rows(probe(dir)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("in-place text rebuild over a versioned index = a new base generation (atomic, vacuum-safe)") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_text_rebuild_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      // an index with versioned state: build + delta + compact → LATEST
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 2 =!= 0), dir)
      Retrieval.compactPostingsIndex(spark, dir)
      val terms = Retrieval.QueryTerms
      val oldRows = rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
      // a reader that resolved the PRE-rebuild pointer…
      val preRebuild = Retrieval.conjunctiveSearchStored(spark, dir, terms)
      // REBUILD in place over a different corpus: before the fix this
      // landed in the legacy root layout — the pointer kept serving
      // the stale corpus and vacuum then DELETED the fresh build
      val corpus2 = docs.filter(col("doc_id") < 100)
      Retrieval.writePostingsIndex(corpus2, dir)
      Retrieval.writePostingsIndex(corpus2, ref)
      def probes(d: String) = Seq(
        rows(Retrieval.conjunctiveSearchStored(spark, d, terms)),
        rows(Retrieval.bm25TopKStored(spark, d, terms)),
        rows(Retrieval.phraseCountStored(spark, d, Bigram)))
      val want = probes(ref)
      assert(probes(dir) === want,
        "rebuild did not take over serving")
      assert(want.head !== oldRows, "vacuous: rebuild corpus identical")
      // the old-pointer reader still completes against intact files
      assert(rows(preRebuild) === oldRows)
      // vacuum reclaims the superseded state and must NOT touch the
      // rebuilt index
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(probes(dir) === want)
      // post-rebuild appends serve on top of the new base
      Retrieval.appendPostingsDelta(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 150), dir)
      Retrieval.appendPostingsDelta(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 150), ref)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === rows(Retrieval.conjunctiveSearchStored(spark, ref, terms)))
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("vector builders refuse an in-place rebuild over a pointer-versioned index") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_vec_rebuild_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.compactIvfIndex(spark, dir)
      // the sidecars are unversioned at the root, so an in-place
      // rebuild cannot be atomic — it must fail loudly, not serve
      // stale rows until a vacuum destroys the new build
      assertThrows[IllegalArgumentException](
        Similarity.writeIvfIndex(emb, dir))
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("vector builders refuse an in-place rebuild over an uncompacted delta/tombstone index (no pointer yet)") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_vec_rebuild_nc_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      // append + delete WITHOUT compaction (the default: maybeCompact
      // is opt-in) — delta_/tomb_ dirs exist but no LATEST pointer; a
      // rebuild would overwrite the frozen sidecars while the stale
      // generations stayed in the probe union (stale IVF-PQ codes
      // decoded against a NEW codebook are garbage)
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfPqDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      assertThrows[IllegalArgumentException](
        Similarity.writeIvfPqIndex(emb, dir))
      // tombstone-only versioned state refuses the same way
      val tombOnly = dir + "_tomb"
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), tombOnly)
      Similarity.deleteVectors(spark, tombOnly,
        emb.filter(col("vec_id") % 8 === 0).select(col("vec_id")))
      assertThrows[IllegalArgumentException](
        Similarity.writeIvfIndex(emb, tombOnly))
      val tp = new org.apache.hadoop.fs.Path(tombOnly)
      tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("assignment with an empty centroid set is loudly empty, never null-partitioned") {
    import graft.operators.Similarity
    // a corpus with NO `% 40 == 0` member has no deterministic
    // centroids: the argmax fold yields null clusters, which must be
    // DROPPED (the old inner-join contract — an empty result), not
    // written as a __HIVE_DEFAULT_PARTITION__ no probe ever reads
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") % 40 =!= 0)
    assert(Similarity.knnJoin(emb).isEmpty)
  }

  test("residual IVF-PQ delta == monolithic (frozen residual codebook); shared compactor + vacuum") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_ivfpqr_delta_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      // split so the base contains BOTH deterministic sidecar sources:
      // centroids (% 40 == 0 → % 4 == 0) and the residual-codebook
      // sample (% 40 == 1 → % 4 == 1) — the frozen sidecars then equal
      // the monolithic build's and delta coding cannot drift
      Similarity.writeIvfPqResidualIndex(
        emb.filter(col("vec_id") % 4 =!= 3), dir)
      Similarity.appendIvfPqResidualDelta(spark, dir,
        emb.filter(col("vec_id") % 4 === 3))
      Similarity.writeIvfPqResidualIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      def probe(d: String) =
        Similarity.ivfPqResidualTopKStored(spark, d, queries, 3, nProbe = 2)
      val got = probe(dir)
      got.collect()
      val p = got.queryExecution.executedPlan.toString
      assert(p.linesIterator.count(_.contains("PartitionFilters: [cluster"))
        >= 2, s"residual probe did not prune both generations:\n$p")
      val want = rows(probe(ref))
      assert(rows(got) === want,
        "residual delta probe diverged from the monolithic build")
      // the raw-vector and residual codings are genuinely different
      // indexes (vacuity guard on the variant itself)
      assert(want !== rows(Similarity.ivfPqTopKStored(spark,
        Similarity.indexDir(spark, "/root/testdata/sf0.001") + "/ivfpq",
        queries, 3, nProbe = 2)),
        "vacuous: residual coding indistinguishable from raw coding")
      // the residual layout rides the SHARED ivfpq compactor/vacuum
      Similarity.compactIvfPqIndex(spark, dir)
      Similarity.vacuumVectorIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("delta_")),
        s"deltas survived vacuum: $left")
      assert(left.contains("centroids") && left.contains("codebook"))
      assert(rows(probe(dir)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("LSH delta append == monolithic build (frozen hyperplanes); compaction + vacuum") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    // split so the base contains the hyperplane vectors (vec_id
    // 100..107): the stored hyperplanes then equal the monolithic
    // build's and delta bucketing cannot drift
    val dir = "/tmp/graft_lsh_delta_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      Similarity.writeLshIndex(emb.filter(col("vec_id") < 250), dir)
      Similarity.appendLshDelta(spark, dir, emb.filter(col("vec_id") >= 250))
      Similarity.writeLshIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      val got = Similarity.lshTopKStored(spark, dir, queries, 3)
      got.collect()
      // both generations' scans carry the static bucket filter (the
      // IVF test's per-generation pruning assert, LSH layout)
      val p = got.queryExecution.executedPlan.toString
      assert(p.linesIterator.count(_.contains("PartitionFilters: [bucket"))
        >= 2, s"LSH probe did not prune both generations:\n$p")
      val want = rows(Similarity.lshTopKStored(spark, ref, queries, 3))
      assert(rows(got) === want,
        "LSH delta-generation probe diverged from the monolithic build")
      // the ADVICE r8 gap: LSH deltas had no fold path — compactLshIndex
      // folds the bucket layout with hyperplanes untouched
      Similarity.compactLshIndex(spark, dir)
      assert(rows(Similarity.lshTopKStored(spark, dir, queries, 3)) === want)
      Similarity.vacuumVectorIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("delta_")),
        s"deltas survived vacuum: $left")
      assert(left.contains("hyperplanes"),
        "vacuum must not touch hyperplanes")
      assert(rows(Similarity.lshTopKStored(spark, dir, queries, 3)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }
}
