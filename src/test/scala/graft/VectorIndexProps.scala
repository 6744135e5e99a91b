package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Similarity

/** Model-based property test for the stored-ANN lifecycle — the vector
  * twin of [[RetrievalIndexProps]], run over ALL THREE stored layouts
  * (IVF cluster-partitioned, LSH bucket-partitioned, PQ codes): a
  * random sequence of frozen-centroid/hyperplane/codebook delta
  * appends, tombstoned deletes, re-embed upserts (delete + re-append
  * with a new embedding), compactions, and vacuums must serve — at
  * EVERY step — exactly what the CANONICAL two-generation form of the
  * same corpus serves: one base built from the original corpus (the
  * centroid/hyperplane/codebook source, identical by construction),
  * one tombstone fencing every original vector deleted or re-embedded,
  * one delta carrying every live vector the base doesn't serve. Any
  * interleaving of maintenance must be indistinguishable from that
  * canonical history — what makes compaction, vacuum, and the
  * sequence-aware fence safe in whatever order a production pipeline
  * emits them.
  */
object VectorIndexProps extends Properties("graft.similarity.index") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(3)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 4
  private val Modulo = 4 // IVF centroids / PQ codebook ids: 0 and 4
  private val HpBase = 0L
  private val NBits = 2 // LSH hyperplanes: initial vectors 0 and 1
  private val PqM = 2 // 2 subspaces of 2 dims each
  private val K = 5
  private val NProbe = 2

  /** Deterministic embedding for (id, version): distinct versions give
    * distinct directions, so a served stale version changes ranks and
    * the invariant sees it. */
  private def embOf(id: Long, version: Int): Array[Float] =
    Array.tabulate(Dim)(d =>
      (((id * 31 + d * 17 + version * 101) % 13).toFloat - 6.0f) / 6.0f)

  /** One stored layout: build a base, append a delta, probe. Delete /
    * compact / vacuum are shared ([[Similarity.deleteVectors]] and the
    * generation machinery are layout-common by design). */
  private case class Layout(
      name: String,
      build: (DataFrame, String) => Unit,
      append: (String, DataFrame) => Unit,
      compact: String => Unit,
      probe: String => DataFrame)

  private lazy val layouts = Seq(
    Layout("ivf",
      (e, d) => Similarity.writeIvfIndex(e, d, Modulo),
      (d, e) => Similarity.appendIvfDelta(spark, d, e),
      d => Similarity.compactIvfIndex(spark, d),
      d => Similarity.ivfTopKStored(spark, d, queryDf, K, NProbe)),
    Layout("lsh",
      (e, d) => Similarity.writeLshIndex(e, d, NBits, HpBase),
      (d, e) => Similarity.appendLshDelta(spark, d, e, HpBase),
      d => Similarity.compactLshIndex(spark, d),
      d => Similarity.lshTopKStored(spark, d, queryDf, K, HpBase)),
    Layout("pq",
      (e, d) => Similarity.writePqIndex(e, d, PqM, Dim, Modulo),
      (d, e) => Similarity.appendPqDelta(spark, d, e, PqM, Dim),
      d => Similarity.compactPqIndex(spark, d),
      d => Similarity.pqTopKStored(spark, d, queryDf, K, PqM, Dim)),
    Layout("ivfpq",
      (e, d) => Similarity.writeIvfPqIndex(e, d, Modulo, PqM, Dim),
      (d, e) => Similarity.appendIvfPqDelta(spark, d, e, PqM, Dim),
      d => Similarity.compactIvfPqIndex(spark, d),
      d => Similarity.ivfPqTopKStored(spark, d, queryDf, K, NProbe, PqM, Dim)))

  sealed trait Op
  private case class Append(n: Int) extends Op    // n NEW vec ids
  private case class Delete(seed: Int) extends Op // a live subset
  private case class Upsert(seed: Int) extends Op // delete + re-embed
  private case object Compact extends Op
  private case object CompactVacuum extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> Gen.choose(1, 6).map(Append),
    3 -> Gen.choose(0, 1000).map(Delete),
    2 -> Gen.choose(0, 1000).map(Upsert),
    1 -> Gen.const(Compact),
    2 -> Gen.const(CompactVacuum))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def vecsDf(m: Map[Long, Int]): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (id, v) => (id, embOf(id, v)) }
      .toDF("vec_id", "embedding")
  }

  /** One query vector off the corpus id space. */
  private def queryDf: DataFrame = {
    import spark.implicits._
    Seq((999999L, embOf(999999L, 0))).toDF("vec_id", "embedding")
  }

  private val initial: Map[Long, Int] = (0L until 8L).map(_ -> 0).toMap

  /** The canonical two-generation index of the current model state
    * under `lo`: base = the ORIGINAL corpus (so the frozen
    * centroids/hyperplanes/codebook are bit-identical to what the
    * lifecycle index froze at build), one tombstone for originals no
    * longer served as-built, one delta for everything live the base
    * doesn't serve. */
  private def canonicalDir(lo: Layout, live: Map[Long, Int]): String = {
    val dir = "/tmp/graft_vec_canon_" +
      java.util.UUID.randomUUID().toString.take(8)
    lo.build(vecsDf(initial), dir)
    val gone = initial.keySet.filter(id => !live.get(id).contains(0))
    if (gone.nonEmpty)
      Similarity.deleteVectors(spark, dir, vecsDf(gone.map(_ -> 0).toMap)
        .select("vec_id"))
    val fresh = live.filter { case (id, v) => !(initial.contains(id) && v == 0) }
    if (fresh.nonEmpty) lo.append(dir, vecsDf(fresh))
    dir
  }

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  property("random lifecycle == the canonical two-generation index (ivf/lsh/pq)") =
    forAll(Gen.listOfN(6, genOp)) { ops =>
      val root = "/tmp/graft_vec_props_" +
        java.util.UUID.randomUUID().toString.take(8)
      var live = initial
      var nextId = 8L
      var version = 1
      try {
        layouts.foreach(lo => lo.build(vecsDf(live), s"$root/${lo.name}"))
        ops.foreach { op =>
          op match {
            case Append(n) =>
              val fresh = (nextId until nextId + n).map(_ -> version).toMap
              nextId += n; version += 1
              layouts.foreach(lo => lo.append(s"$root/${lo.name}", vecsDf(fresh)))
              live ++= fresh
            case Delete(seed) =>
              val victims = live.keySet.filter(id => (id + seed) % 3 == 0)
              layouts.foreach(lo => Similarity.deleteVectors(spark,
                s"$root/${lo.name}",
                vecsDf(victims.map(_ -> 0).toMap).select("vec_id")))
              live --= victims
            case Upsert(seed) =>
              val targets = live.keySet.filter(id => (id + seed) % 4 == 0)
              if (targets.nonEmpty) {
                layouts.foreach(lo => Similarity.deleteVectors(spark,
                  s"$root/${lo.name}",
                  vecsDf(targets.map(_ -> 0).toMap).select("vec_id")))
                val renewed = targets.map(_ -> version).toMap
                version += 1
                layouts.foreach(lo =>
                  lo.append(s"$root/${lo.name}", vecsDf(renewed)))
                live ++= renewed
              }
            case Compact =>
              layouts.foreach(lo => lo.compact(s"$root/${lo.name}"))
            case CompactVacuum =>
              layouts.foreach { lo =>
                lo.compact(s"$root/${lo.name}")
                Similarity.vacuumVectorIndex(spark, s"$root/${lo.name}")
              }
          }
          // the step invariant, per layout: the lifecycle index serves
          // exactly what the canonical two-generation history serves
          layouts.foreach { lo =>
            val canon = canonicalDir(lo, live)
            try assert(rows(lo.probe(s"$root/${lo.name}"))
              == rows(lo.probe(canon)),
              s"${lo.name} probe diverged after $op in $ops")
            finally rm(canon)
          }
        }
        true
      } finally rm(root)
    }
}
