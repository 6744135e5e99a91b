package graft.graph

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** SQL-callable graph scalar functions — the analogue of the reference's
  * `bfs_length` / `bfs_exist` ScalarFunctions (src/functions/scalar/
  * bfs.cpp:165-177) and the `duckdb_graphar` hello function
  * (duckdb_graphar_extension.cpp:23-34).
  *
  * Design: the reference runs a single-threaded BFS per ROW, re-opening
  * the graph per vector chunk (bfs.cpp:37-80) — 300+ s on unlucky pairs
  * (BASELINE.md). Here the adjacency (CSR arrays) is built ONCE from the
  * connector and broadcast; each UDF call is then an in-memory
  * early-exit BFS — many orders of magnitude faster for SQL workloads
  * that evaluate the function over many rows.
  *
  * Scale note: broadcast CSR is the right tool while the graph fits in
  * executor memory (an int64 pair per edge; ~16 GB per billion edges).
  * Beyond that, use [[GraphArGraph.bfsLength]] — the driver-orchestrated
  * distributed frontier join — which has no single-machine bound.
  */
object GraphSqlFunctions {

  /** Compact CSR adjacency for broadcast. */
  final case class Csr(offsets: Array[Int], targets: Array[Long],
                       index: Map[Long, Int]) {
    def neighbors(v: Long): (Int, Int) = index.get(v) match {
      case Some(i) => (offsets(i), offsets(i + 1))
      case None => (0, 0)
    }
  }

  def buildCsr(spark: SparkSession, edgesStd: org.apache.spark.sql.DataFrame): Csr = {
    import org.apache.spark.sql.functions._
    // One shuffle-free job (vs groupBy+collect_list's full shuffle) that
    // collects PRIMITIVE long arrays per partition — never boxed Rows.
    // The earlier cut collected Array[Row] (~3 objects/edge) and sorted
    // boxed (Long, Long) tuples via sortBy (2 more allocations/edge plus
    // a megamorphic Ordering); profiled at sf0.1 that was most of the
    // path_exist CSR phase. toRdd's UnsafeRows are buffer-backed and
    // reused per iterator, so the primitives are read out immediately.
    val parts = edgesStd.select(col("src"), col("dst"))
      .queryExecution.toRdd.mapPartitions { it =>
        val sb = new mutable.ArrayBuilder.ofLong
        val db = new mutable.ArrayBuilder.ofLong
        while (it.hasNext) {
          val r = it.next()
          sb += r.getLong(0); db += r.getLong(1)
        }
        Iterator((sb.result(), db.result()))
      }.collect()
    val total = parts.foldLeft(0L)((a, p) => a + p._1.length)
    // fail fast (not silently overflow) past Int-addressable targets —
    // register()'s metadata guard normally refuses long before this
    require(total <= Int.MaxValue - 8,
      s"graph has $total edges — beyond a broadcastable CSR; " +
        "use GraphArGraph.bfsLength (distributed frontier BFS) instead")
    val n = total.toInt
    val srcA = new Array[Long](n)
    val dstA = new Array[Long](n)
    var i = 0
    parts.foreach { case (s, d) =>
      System.arraycopy(s, 0, srcA, i, s.length)
      System.arraycopy(d, 0, dstA, i, d.length)
      i += s.length
    }
    // (src, dst) order: when both endpoints fit in an unsigned 31-bit
    // range the pair packs into one long whose natural order IS the pair
    // order, and a primitive dual-pivot sort replaces the boxed index
    // sort. GraphAr vertex indices always land here; arbitrary long ids
    // (SQL-registered graphs) keep the general index-sort fallback.
    var fits = true
    i = 0
    while (fits && i < n) {
      if ((srcA(i) | dstA(i)) < 0 || srcA(i) > Int.MaxValue ||
        dstA(i) > Int.MaxValue) fits = false
      i += 1
    }
    val index = scala.collection.mutable.HashMap.empty[Long, Int]
    val offsetsBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
    val targets = new Array[Long](n)
    var p = 0
    if (fits) {
      val packed = new Array[Long](n)
      i = 0
      while (i < n) { packed(i) = (srcA(i) << 32) | dstA(i); i += 1 }
      java.util.Arrays.sort(packed)
      while (p < n) {
        val s = packed(p) >>> 32
        if (!index.contains(s)) { index(s) = offsetsBuf.length; offsetsBuf += p }
        targets(p) = packed(p) & 0xffffffffL; p += 1
      }
    } else {
      val order = Array.range(0, n).sortBy(k => (srcA(k), dstA(k)))
      order.foreach { k =>
        val s = srcA(k)
        if (!index.contains(s)) { index(s) = offsetsBuf.length; offsetsBuf += p }
        targets(p) = dstA(k); p += 1
      }
    }
    offsetsBuf += p
    Csr(offsetsBuf.toArray, targets, index.toMap)
  }

  private[graph] def bfs(csr: Csr, src: Long, dst: Long, maxDepth: Int): Long = {
    if (src == dst) return 0L
    val visited = mutable.HashSet(src)
    var frontier = List(src)
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      depth += 1
      val next = mutable.ListBuffer.empty[Long]
      frontier.foreach { v =>
        val (b, e) = csr.neighbors(v)
        var i = b
        while (i < e) {
          val t = csr.targets(i)
          if (t == dst) return depth.toLong
          if (visited.add(t)) next += t
          i += 1
        }
      }
      frontier = next.toList
    }
    -1L
  }

  /** Register `<prefix>bfs_length(src,dst)`, `<prefix>bfs_exist(src,dst)`
    * over the FIRST edge type of the graph (matching
    * `GetEdgeInfoByIndex(0)`, bfs.cpp:66), plus the `duckdb_graphar`-style
    * hello function `graft(name)`.
    *
    * Refuses graphs whose edge-count METADATA exceeds `maxBroadcastEdges`
    * (checked before any scan or collect, so an oversized graph costs one
    * metadata read, not a driver OOM); the error names the distributed
    * alternative. The default is sized for what `buildCsr`'s collect
    * actually materializes on the driver — BOXED java.lang.Long elements
    * inside Row/WrappedArray (~50-80 bytes per edge transiently, an
    * order of magnitude above the final 8-byte CSR entry) — so ~8M edges
    * is a few hundred MB of driver heap. Override consciously for big
    * drivers.
    */
  def register(spark: SparkSession, graph: GraphArGraph, prefix: String = "",
               maxDepth: Int = 15,
               maxBroadcastEdges: Long = 8_000_000L): Broadcast[Csr] = {
    val e = graph.info.edges.head
    val conf = spark.sessionState.newHadoopConf()
    val nEdges = e.adjLists.headOption.map(e.edgeCount(_, conf)).getOrElse(0L)
    require(nEdges <= maxBroadcastEdges,
      s"graph ${graph.info.name} has $nEdges edges (> $maxBroadcastEdges): " +
        "a broadcast-CSR BFS UDF would not fit executor memory; use " +
        "GraphArGraph.bfsLength/bfsExists (distributed frontier BFS), or " +
        "raise maxBroadcastEdges explicitly")
    val csr = buildCsr(spark, graph.edgesStd(e.srcType, e.edgeType, e.dstType))
    val bc = spark.sparkContext.broadcast(csr)
    spark.udf.register(s"${prefix}bfs_length",
      (src: Long, dst: Long) => bfs(bc.value, src, dst, maxDepth))
    spark.udf.register(s"${prefix}bfs_exist",
      (src: Long, dst: Long) => bfs(bc.value, src, dst, maxDepth) != -1L)
    // hello-world parity with `duckdb_graphar('Sam')` → "DuckDB_Graphar Sam 🐥"
    spark.udf.register(s"${prefix}graft", (name: String) => s"Graft $name ⚡")
    bc
  }
}
