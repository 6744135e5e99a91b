package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity}

/** Round-10 operator gates: fuzzy term expansion on the stored text
  * index, attribute-filtered ANN edge cases. */
class Round10OpsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("fuzzySearchStored: exact at maxDist=0, dictionary-complete at maxDist≥1, loud past the expansion bound") {
    val idx = Retrieval.indexDir(spark, sf)
    val docs = Tables.t(spark, sf, "documents")

    // maxDist=0 ≡ the term's own postings (exact lookup through the
    // fuzzy path)
    val exact = rows(Retrieval.fuzzySearchStored(spark, idx, "spark", 0))
    val direct = rows(Retrieval.postings(docs)
      .filter(col("term") === "spark")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("hits")))
    assert(exact === direct)
    assert(exact.nonEmpty)

    // brute-force reference: expansion = vocab terms within distance,
    // result = per-doc distinct-matched-terms + total occurrences
    val want = rows(Retrieval.postings(docs)
      .filter(levenshtein(col("term"), lit("spork")) <= 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("hits")))
    assert(rows(Retrieval.fuzzySearchStored(spark, idx, "spork", 2))
      === want)
    assert(want.nonEmpty)

    // a query term nothing is within range of returns empty, not junk
    assert(Retrieval.fuzzySearchStored(spark, idx, "qqqqqqqqqq", 1).isEmpty)

    // a term SHORTER than maxDist+1 segments skips the pigeonhole
    // prefilter but stays correct (length band + levenshtein only)
    val short = rows(Retrieval.fuzzySearchStored(spark, idx, "ke", 2))
    val wantShort = rows(Retrieval.postings(docs)
      .filter(levenshtein(col("term"), lit("ke")) <= 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("hits")))
    assert(short === wantShort)
    assert(short.nonEmpty)

    // expansion past the bound refuses with instructions — never a
    // silent recall cap
    assertThrows[IllegalArgumentException](
      Retrieval.fuzzySearchStored(spark, idx, "spork", 2,
        maxExpansions = 1))

    // the large-expansion access path (broadcast semi-join instead of
    // an inlined In-literal list) is row-identical: force it by
    // setting the inline limit below the expansion count
    assert(rows(Retrieval.fuzzySearchStored(spark, idx, "spork", 2,
      inlineTermLimit = 0)) === want)
  }

  test("fuzzySearchStored expands through delta-generation dictionaries and respects tombstones") {
    val docs = Tables.t(spark, sf, "documents")
    val dir = "/tmp/graft_fuzzy_delta_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      // base WITHOUT the novel term; delta introduces vocab "zplork"
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      Retrieval.appendPostingsDelta(
        docs.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"),
            concat(col("text"), lit(" zplork")).as("text")), dir)
      // the delta-only term resolves through the delta's dict
      val got = Retrieval.fuzzySearchStored(spark, dir, "zplorc", 1)
      val matched = got.collect()
      assert(matched.nonEmpty, "delta-generation vocab did not expand")
      // every odd doc carries exactly one zplork occurrence
      assert(matched.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L))
      // deleting the delta docs fences the expansion's postings (the
      // dict may keep a stale entry — it must cost a wasted probe at
      // most, never a wrong row)
      Retrieval.deletePostingsDocs(spark, dir,
        docs.filter(col("doc_id") % 2 =!= 0).select(col("doc_id")))
      assert(Retrieval.fuzzySearchStored(spark, dir, "zplorc", 1).isEmpty)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("batched stored-table BPE encode ≡ the single-expression encode on a TRAINED merge table") {
    import graft.operators.Pipeline
    val docs = Tables.t(spark, sf, "documents")
    // 48 trained merges: above one batch (32), below the old path's
    // ceiling — the batched path must reproduce the nested-expression
    // path byte-for-byte (same merges, same greedy-replace semantics)
    val merges = Pipeline.bpeTrain(docs, 48)
    val stored = rows(Pipeline.bpeEncodedCountsStored(docs, merges))
    val nested = rows(Pipeline.bpeEncodedCounts(docs, 48))
    assert(stored === nested)
    assert(stored.nonEmpty)
    // batch boundaries are invisible: any batch size gives the same rows
    assert(rows(Pipeline.bpeEncodedCountsStored(docs, merges, batch = 1))
      === nested)
    assert(rows(Pipeline.bpeEncodedCountsStored(docs, merges, batch = 7))
      === nested)
  }

  test("frequencyMergeTable is ≥1024 merges with complete formation chains") {
    import graft.operators.Pipeline
    val docs = Tables.t(spark, sf, "documents")
    val mt = Pipeline.frequencyMergeTable(docs).collect()
    assert(mt.length >= 1024, s"merge table has only ${mt.length} rows")
    // ranks are dense 1..N (the recursive oracle walks rank = rk+1 —
    // a gap would silently truncate the merge sequence)
    assert(mt.map(_.getInt(0)).sorted.toSeq === (1 to mt.length))
    // every corpus merge's LEFT symbol longer than one char has its
    // own formation merge EARLIER (length-ascending ranking)
    val formed = scala.collection.mutable.Set.empty[String]
    mt.sortBy(_.getInt(0)).foreach { r =>
      val l = r.getString(1)
      if (l.length > 1 && r.getLong(3) > 0) // corpus rows carry freq>0
        assert(formed.contains(l),
          s"merge rank ${r.getInt(0)} left '$l' has no earlier formation")
      formed += (l + r.getString(2))
    }
  }

  test("trained-codebook index: frozen-state delta == monolithic; shared fold + vacuum; rebuild refused") {
    val emb = Tables.t(spark, sf, "embeddings")
    val dir = "/tmp/graft_ivfpq_trained_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      // split so the base holds every deterministic sidecar source
      // (% 40 == 0 centroid/codeword seeds are all even): the frozen
      // trained state equals the monolithic build's ONLY if training
      // saw the same corpus — so train on evens, verify delta coding
      // (not delta training) is what append does
      Similarity.writeIvfPqTrainedIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfPqTrainedDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      // reference: monolithic CODES against the same frozen state
      Similarity.writeIvfPqTrainedIndex(emb.filter(col("vec_id") % 2 === 0), ref)
      Similarity.appendIvfPqTrainedDelta(spark, ref,
        emb.filter(col("vec_id") % 2 =!= 0))
      val queries = emb.filter(col("vec_id") < 8)
      val want = rows(Similarity.ivfPqTrainedTopKStored(spark, dir, queries, 3))
      assert(want.nonEmpty)
      assert(rows(Similarity.ivfPqTrainedTopKStored(spark, ref, queries, 3))
        === want, "same build recipe diverged (nondeterministic training?)")
      // fold + vacuum are the SHARED codes-layout verbs; serving holds
      Similarity.compactIvfPqIndex(spark, dir)
      Similarity.vacuumVectorIndex(spark, dir)
      assert(rows(Similarity.ivfPqTrainedTopKStored(spark, dir, queries, 3))
        === want)
      // uncompacted-delta rebuild refusal covers this layout too
      assertThrows[IllegalArgumentException](
        Similarity.writeIvfPqTrainedIndex(emb, ref))
    } finally {
      Seq(dir, ref).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  test("delete-aware components IVM == fresh recompute across random mixed feeds") {
    import graft.sources.graphar.GraphArMutations
    import graft.graph.GraphOps
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    val V = 120
    def cc(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
      if (edges.isEmpty) Set.empty
      else GraphOps.connectedComponents(spark,
          edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to 4).foreach { trial =>
      var edges = Seq.fill(160)(
        (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong))
        .filter(e => e._1 != e._2).distinct
      var prev = cc(edges)
      (1 to 3).foreach { step =>
        // random mixed batch: delete ~25% of current edges, insert
        // fresh ones (some touching affected components, some not)
        val dels = rnd.shuffle(edges).take(edges.size / 4)
        val ins = Seq.fill(30)(
          (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong))
          .filter(e => e._1 != e._2).distinct
          .filterNot(edges.contains)
        edges = (edges.diff(dels) ++ ins).distinct
        val feed = dels.map(e => (e._1, e._2, "delete")) ++
          ins.map(e => (e._1, e._2, "insert"))
        val got = GraphArMutations.maintainComponentsWithDeletes(
          prev.toSeq.toDF("grapharId", "component"),
          feed.toDF("src", "dst", "_change_type"),
          edges.toDF("src", "dst"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = cc(edges)
        assert(got === want,
          s"trial $trial step $step: IVM drifted from recompute " +
            s"(missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)})")
        prev = want
      }
    }
  }

  test("filtered ANN: selective predicate still yields k survivors; rank-then-filter would not") {
    val emb = Tables.t(spark, sf, "embeddings")
    val base = Similarity.indexDir(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    val k = 3
    val got = Similarity.ivfTopKStoredFiltered(spark, s"$base/ivf",
      queries, k, emb, col("label") === 3).collect()
    // one label ≈ 1/10 of the corpus: a post-window filter would keep
    // ~k/10 rows per query; filter-then-rank keeps k whenever the
    // probed cluster holds k matching vectors
    val perQuery = got.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(got.nonEmpty)
    perQuery.foreach { case (q, n) =>
      val inCluster = Similarity.ivfTopKStoredFiltered(spark,
        s"$base/ivf", queries.filter(col("vec_id") === q), 1000000,
        emb, col("label") === 3).count()
      assert(n == math.min(k, inCluster),
        s"query $q returned $n of min($k, $inCluster) filtered candidates")
    }
    // every served neighbor satisfies the predicate
    val allowed = emb.filter(col("label") === 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.forall(r => allowed.contains(r.getLong(2))))
  }
}
