package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall CONTRACTS for the approximate-ANN tier on a clustered,
  * skewed synthetic embedding set. The gate corpus checks the
  * estimators are bit-exact vs the oracle, but nothing pinned their
  * recall@k against brute force — a future change could silently
  * degrade retrieval quality while staying oracle-green (the oracle
  * replicates whatever the approximation computes). These bounds fail
  * that change.
  *
  * The corpus is deterministic: 10 well-separated unit-norm cluster
  * centers (hash-seeded), skewed populations (150 down to 10 — one
  * heavy head, a long tail, the shape real embedding corpora have),
  * points = normalize(center + 0.35·noise). Every operator keeps its
  * gate-default index geometry (centroids = vec_id % 40, hyperplanes =
  * vec_ids 100-107, PQ 8×8), so the spec also exercises how an
  * id-drawn index copes with skew: the heavy cluster gets more
  * centroids, the tail shares.
  *
  * Bounds are measured-then-margined (measured recall minus ~5-10 pts),
  * not analytic — IVF/LSH recall on a specific corpus has no closed
  * form; the contract is "at least this good from now on".
  */
class AnnRecallSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Dims = 64
  // Skewed populations (one heavy head, a long tail) ALIGNED to the
  // centroid stride (vec_id % 40): every cluster holds >= 1 centroid
  // id and dense clusters hold proportionally more — the coverage a
  // data-drawn (k-means) centroid set would give. A first cut with
  // unaligned sizes left the two tail clusters centroid-less and IVF
  // recall collapsed to 0.40 — a real id-drawn-index failure mode
  // under skew, pinned here as the monotonicity contracts instead.
  val Sizes = Seq(160, 120, 80, 40, 40, 40, 40, 40, 40, 40) // 640

  /** xorshift-mixed deterministic pseudo-noise in [-1, 1). */
  private def noise(seed: Long): Double = {
    var x = seed * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    x ^= x >>> 27; x *= 0x2545f4914f6cdd1dL; x ^= x >>> 31
    (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  private def normalize(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  lazy val corpus: DataFrame = {
    val centers = (0 until Sizes.size).map { c =>
      normalize(Array.tabulate(Dims)(d => noise(c * 1000L + d)))
    }
    val rows = Sizes.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map { i =>
        val id = Sizes.take(c).sum + i
        val v = normalize(Array.tabulate(Dims)(d =>
          centers(c)(d) + 0.5 * noise(id * 131L + d * 7L + 999L)))
        (id.toLong, v.toSeq)
      }
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint()
  }

  /** Query ids spread across clusters, head and tail alike. */
  val QueryIds: Seq[Long] = Seq(3L, 77L, 180L, 260L, 333L, 381L, 422L,
    463L, 505L, 615L)
  private def qPred = col("vec_id").isin(QueryIds: _*)

  lazy val truth: Map[Long, Set[Long]] =
    operators.Similarity.bruteForceTopK(corpus, qPred, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }

  private def recallAt10(result: DataFrame): Double = {
    val got = result.select(col("q_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val per = QueryIds.map { q =>
      truth(q).intersect(got.getOrElse(q, Set.empty)).size / 10.0
    }
    per.sum / per.size
  }

  // Measured on this corpus (2026-08, the values the bounds protect):
  //   ivf nProbe=1/2/4/8 -> 0.19 / 0.32 / 0.51 / 0.84
  //   lsh single / multiprobe -> 1.00 / 1.00
  //   pq adc / rerank c=30 / c=120 -> 0.11 / 0.28 / 0.56
  // The IVF curve is the sub-cell effect: the id-drawn centroid set
  // (16 for 10 clusters) SPLITS the heavy clusters, so a query's true
  // neighbors scatter over its cluster's cells and recall ≈ probed
  // cells / cluster cells — the knob that buys it back is nProbe,
  // which the curve shows doing exactly that. PQ's 16 id-drawn
  // codewords per subspace collapse in-cluster vectors to near-equal
  // codes, so ADC ordering within a cluster is weak and re-rank
  // recall grows with the shortlist c. Real deployments train 256
  // k-means codewords; the contract here is the SHAPE (monotone in
  // every widening knob) plus measured floors.

  test("IVF recall@10 under skew: monotone in nProbe, floors hold") {
    val r = Seq(1, 2, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfTopK(corpus, qPred, 10, nProbe = np))).toMap
    info(r.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }.mkString("ivf: ", ", ", ""))
    assert(r(1) >= 0.15, f"ivf nProbe=1 recall degraded: ${r(1)}%.3f")
    assert(r(2) >= 0.27, f"ivf nProbe=2 recall degraded: ${r(2)}%.3f")
    assert(r(4) >= 0.45, f"ivf nProbe=4 recall degraded: ${r(4)}%.3f")
    assert(r(8) >= 0.78, f"ivf nProbe=8 recall degraded: ${r(8)}%.3f")
    assert(r(1) <= r(2) && r(2) <= r(4) && r(4) <= r(8),
      "more probes must never lose recall")
  }

  test("LSH recall@10 under skew: sign buckets separate these clusters cleanly") {
    val r1 = recallAt10(operators.Similarity.lshTopK(corpus, qPred, 10))
    val rm = recallAt10(
      operators.Similarity.lshTopKMultiProbe(corpus, qPred, 10))
    info(f"lsh recall@10: single $r1%.3f, multiprobe $rm%.3f")
    assert(r1 >= 0.90, f"lsh single-bucket recall degraded: $r1%.3f")
    assert(rm >= 0.90, f"lsh multiprobe recall degraded: $rm%.3f")
    assert(rm >= r1, "multiprobe must never lose recall vs single-bucket")
  }

  test("PQ recall@10: rerank beats ADC and grows with the shortlist") {
    val radc = recallAt10(operators.Similarity.pqTopK(corpus, qPred, 10))
    val r30 = recallAt10(
      operators.Similarity.pqTopKRerank(corpus, qPred, 10, c = 30))
    val r120 = recallAt10(
      operators.Similarity.pqTopKRerank(corpus, qPred, 10, c = 120))
    info(f"pq recall@10: adc $radc%.3f, rerank c=30 $r30%.3f, c=120 $r120%.3f")
    assert(radc >= 0.08, f"pq ADC recall degraded: $radc%.3f")
    assert(r30 >= 0.23, f"pq rerank(c=30) recall degraded: $r30%.3f")
    assert(r120 >= 0.50, f"pq rerank(c=120) recall degraded: $r120%.3f")
    assert(r30 >= radc && r120 >= r30,
      "a wider exact re-rank must never lose recall")
  }

  test("IVF-PQ and residual IVF-PQ recall@10: floors hold; exact rerank is the recall knob (ADC is NOT monotone in nProbe)") {
    // composition of both approximations: cluster pruning caps WHICH
    // candidates are seen (the IVF ceiling) and ADC ordering decides
    // WHO of them ranks (the PQ weakness) — so ivfpq ≤ ivf at equal
    // nProbe, and the exact-cosine rerank recovers toward the ivf
    // ceiling.
    val pq = Seq(1, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfPqTopK(corpus, qPred, 10, nProbe = np))).toMap
    val pqr = Seq(1, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfPqResidualTopK(corpus, qPred, 10,
        nProbe = np))).toMap
    info(pq.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }
      .mkString("ivfpq: ", ", ", ""))
    info(pqr.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }
      .mkString("ivfpqr: ", ", ", ""))
    // measured 2026-08: ivfpq 0.090/0.130/0.120, ivfpqr
    // 0.050/0.110/0.090 — note nProbe=8 DIPS below nProbe=4: unlike
    // exact-cosine IVF, widening the probe set adds candidates whose
    // NOISY ADC scores can displace true neighbors, so ADC recall is
    // not monotone in nProbe (the id-drawn 16-codeword codebook makes
    // in-cluster ADC ordering nearly flat; production 256-codeword
    // k-means books dampen but don't eliminate this). The contract
    // that IS stable: floors, and the exact-cosine rerank recovering
    // to the cluster-pruning ceiling — rerank, not nProbe, is the
    // recall knob for coded layouts.
    assert(pq(1) >= 0.06, f"ivfpq nProbe=1 recall degraded: ${pq(1)}%.3f")
    assert(pq(4) >= 0.09, f"ivfpq nProbe=4 recall degraded: ${pq(4)}%.3f")
    assert(pq(8) >= 0.09, f"ivfpq nProbe=8 recall degraded: ${pq(8)}%.3f")
    assert(pqr(4) >= 0.07, f"ivfpqr nProbe=4 recall degraded: ${pqr(4)}%.3f")
    // the serving shape: stored rerank recovers toward the IVF ceiling
    val dir = java.nio.file.Files.createTempDirectory("ann_recall_ivfpq").toString
    operators.Similarity.writeIvfPqIndex(corpus, dir)
    val rr = recallAt10(operators.Similarity.ivfPqTopKRerankStored(
      spark, dir, corpus, corpus.filter(qPred), 10, c = 40, nProbe = 8))
    val ceiling = recallAt10(
      operators.Similarity.ivfTopK(corpus, qPred, 10, nProbe = 8))
    info(f"ivfpq rerank(c=40, nProbe=8) $rr%.3f vs ivf ceiling $ceiling%.3f")
    assert(rr >= pq(8), "exact rerank must never lose recall vs ADC")
  }

  test("TRAINED codebook lifts coded-layout recall on clustered data (the measured collapse's fix)") {
    val un = Seq(1, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfPqTopK(corpus, qPred, 10, nProbe = np))).toMap
    val tr = Seq(1, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfPqTrainedTopK(corpus, qPred, 10,
        nProbe = np))).toMap
    info(un.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }
      .mkString("ivfpq untrained: ", ", ", ""))
    info(tr.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }
      .mkString("ivfpq trained:   ", ", ", ""))
    Seq(1, 4, 8).foreach { np =>
      assert(tr(np) >= un(np),
        f"training lost recall at nProbe=$np: ${tr(np)}%.3f < ${un(np)}%.3f")
    }
    // measured 2026-08: untrained 0.090/0.130/0.120, trained
    // 0.110/0.140/0.190 — 2 Lloyd rounds on 16 codewords already
    // +58% at nProbe=8; the effect grows with cluster structure
    // (SCALE.md round-10: the 2M clustered rung is where untrained
    // collapses outright)
    assert(tr(8) >= 0.15, f"trained nProbe=8 recall degraded: ${tr(8)}%.3f")
  }

  test("TRAINED rerank is the coded tier's top recall line (stored layout, shortlist refine)") {
    val dir = java.nio.file.Files.createTempDirectory("ann_recall_tr").toString
    operators.Similarity.writeIvfPqTrainedIndex(corpus, dir)
    val q = corpus.filter(qPred)
    val adc = Seq(1, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfPqTrainedTopKStored(spark, dir, q, 10,
        nProbe = np))).toMap
    val rr = Seq(1, 4, 8).map(np => np -> recallAt10(
      operators.Similarity.ivfPqTrainedTopKRerankStored(spark, dir, corpus,
        q, 10, c = 30, nProbe = np))).toMap
    info(adc.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }
      .mkString("trained ADC:    ", ", ", ""))
    info(rr.toSeq.sortBy(_._1)
      .map { case (np, v) => f"nProbe=$np $v%.3f" }
      .mkString("trained rerank: ", ", ", ""))
    Seq(1, 4, 8).foreach { np =>
      assert(rr(np) >= adc(np),
        f"exact rerank lost recall vs trained ADC at nProbe=$np")
    }
    // measured 2026-08 (r11): trained ADC 0.110/0.140/0.190, trained
    // rerank(c=30) 0.160/0.320/0.460 — the refine more than doubles
    // the trained ADC line past nProbe=1, the same knob shape the 2M
    // rung shows (SCALE.md round-11 table)
    assert(rr(8) >= 0.40, f"trained rerank nProbe=8 recall degraded: ${rr(8)}%.3f")
  }

  test("stored IVF probe matches the recompute variant on the skewed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ann_recall_ivf").toString
    operators.Similarity.writeIvfIndex(corpus, dir)
    val stored = operators.Similarity.ivfTopKStored(
        spark, dir, corpus.filter(qPred), 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    val recomputed = operators.Similarity.ivfTopK(
        corpus, qPred, 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(stored === recomputed,
      "persisted index probe diverged from the recompute variant")
  }
}
