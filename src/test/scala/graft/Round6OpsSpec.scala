package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 operator family: Markov transitions, perplexity buckets,
  * keep-best dedup, k-means, SQ8 ANN, perceptual-hash dedup, bloom join.
  * Each test pins a semantic property the DuckDB oracle can't (or
  * checks equivalence against an exact in-engine reference).
  */
class Round6OpsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.01"

  test("q28_markov: per-row probabilities sum to ~1 and counts cover all transitions") {
    val m = operators.Relational.queries("q28_markov")(spark, sf)
      .collect()
    val byFrom = m.groupBy(_.getString(0))
    byFrom.foreach { case (from, rows) =>
      val p = rows.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-9, s"probabilities for $from sum to $p")
    }
    val nTrans = m.map(_.getLong(2)).sum
    val ev = Tables.t(spark, sf, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nTrans == expected,
      s"transition count $nTrans != events - users = $expected")
  }

  test("t_ppl_buckets: terciles cover every doc and are balanced") {
    val b = operators.TextAnalysis.queries("t_ppl_buckets")(spark, sf)
      .groupBy("bucket").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b.keySet == Set("head", "middle", "tail"))
    val total = b.values.sum
    assert(total == 500)
    // interpolated tercile cuts leave each bucket within ±2 of N/3
    b.values.foreach(n => assert(math.abs(n - total / 3.0) <= 2.0, b.toString))
  }

  test("d_keep_best: one survivor per cluster, best quality, solos all kept") {
    val docs = Tables.t(spark, sf, "documents")
    val out = operators.Dedup.queries("d_keep_best")(spark, sf)
    assert(out.count() == docs.count())
    val clustered = out.filter(col("cluster_id").isNotNull)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .collect()
    val byCluster = clustered.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rows) =>
      val kept = rows.filter(_.getBoolean(2))
      assert(kept.length == 1, s"cluster $c kept ${kept.length}")
      val bestLen = rows.map(_.getLong(3)).max
      assert(kept.head.getLong(3) == bestLen,
        s"cluster $c kept quality ${kept.head.getLong(3)} < best $bestLen")
    }
    assert(out.filter(col("cluster_id").isNull && !col("keep")).isEmpty)
  }

  test("sim_kmeans one iteration == nearest seed by quantized L2") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = operators.Similarity.kmeansAssign(emb, modulo = 40, iters = 1)
    // independent reference: quantize, then argmin over seed vectors of
    // plain Σ(q_i − s_i)² (cnt = 1 for the seed state)
    val qv = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 4096 + 0.5)).as("q"))
    val seeds = qv.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("c_id"), col("q").as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("a"), col("c_id"))
    val ref = qv.crossJoin(broadcast(seeds))
      .withColumn("a", aggregate(
        zip_with(col("q"), col("s"), (x, si) => (x - si) * (x - si)),
        lit(0L), (acc, v) => acc + v))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("c_id").as("cluster"))
    assert(got.select("vec_id", "cluster").exceptAll(ref).isEmpty &&
      ref.exceptAll(got.select("vec_id", "cluster")).isEmpty)
  }

  test("sim_sq8 with shortlist >= corpus equals exact brute-force top-k") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = operators.Similarity
      .sq8TopK(emb, col("vec_id") < 8, k = 3, c = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = operators.Similarity
      .bruteForceTopK(emb, col("vec_id") < 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("phashPairs finds exactly the brute-force Hamming<=3 pairs") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(150).select(col("doc_id"), col("text"))
    val got = operators.Multimodal.phashPairs(docs)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the full hash table (no banding)
    import graft.functions.TextFunctions.charHash
    val px = transform(sequence(lit(0), lit(31)), i =>
      pmod(charHash(col("text"), i + 100), lit(256L)))
    val h = docs.select(col("doc_id"), px.as("p"))
      .withColumn("psum", aggregate(col("p"), lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"),
        aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) =>
          acc + when(
            element_at(col("p"), b.cast("int") + 1) * 32 >= col("psum"),
            pow(lit(2.0), b).cast("long")).otherwise(lit(0L))).as("ph"))
    val a = h.select(col("doc_id").as("a_id"), col("ph").as("ha"))
    val b = h.select(col("doc_id").as("b_id"), col("ph").as("hb"))
    val want = a.join(b, col("a_id") < col("b_id"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("bloomJoin == plain join (fpp-independent exactness)") {
    val dim = Tables.t(spark, sf, "supplier")
      .filter(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"), col("s_name"))
    val fact = Tables.t(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"))
    // tiny bloom forced to collide (high fpp) must not change results
    val got = operators.Sketches
      .bloomJoin(spark, fact, dim, "l_suppkey", "s_suppkey",
        expectedItems = 10, fpp = 0.5)
    val want = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bloomJoin with empty dim yields empty result, schema intact") {
    val dim = Tables.t(spark, sf, "supplier")
      .filter(lit(false)).select(col("s_suppkey"), col("s_name"))
    val fact = Tables.t(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"))
    val got = operators.Sketches
      .bloomJoin(spark, fact, dim, "l_suppkey", "s_suppkey")
    assert(got.isEmpty)
    assert(got.columns.toSeq ==
      Seq("l_suppkey", "l_orderkey", "s_suppkey", "s_name"))
  }
}
