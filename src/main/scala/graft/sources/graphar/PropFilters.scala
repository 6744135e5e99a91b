package graft.sources.graphar

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._

/** Property-predicate pushdown support for the GraphAr connector (P3).
  *
  * The reference pushes `WHERE prop = const` into its Arrow chunk reader
  * (read_vertices.cpp:109-114, expression builder func.cpp:98-122). The
  * Spark-side equivalent here has two layers, both conservative — the
  * predicates stay residual Catalyst `Filter`s above the scan, so a miss
  * here can only read MORE rows, never produce wrong results:
  *
  *  1. '''chunk skip''' — before opening any file of a chunk, parquet
  *     footer min/max row-group statistics are consulted; if no row group
  *     of the property-group file can satisfy the conjunction, the whole
  *     chunk (all its property-group files) is skipped unopened. At 100 TB
  *     with sorted/clustered properties this prunes most of the scan I/O,
  *     matching the reference's dataset-level predicate.
  *  2. '''row test''' — surviving chunks evaluate the predicates on the
  *     zipped row before it is converted/emitted, so only matching rows
  *     cross into Spark (positional alignment across property groups is
  *     preserved because the test runs after the zip, not inside one file).
  *
  * Only null-safe, monotone-friendly leaves are accepted; `Not` is
  * rejected (its three-valued-logic inversion is unsafe to apply before
  * the residual filter).
  */
object PropFilters {

  /** Leaves we can evaluate exactly (SQL semantics: comparisons with null
    * are unknown → row not emitted, matching the residual filter's final
    * answer).
    */
  def acceptable(f: Filter, propCols: Set[String]): Boolean = f match {
    case EqualTo(c, v) => propCols.contains(c) && literalOk(v)
    case GreaterThan(c, v) => propCols.contains(c) && literalOk(v)
    case GreaterThanOrEqual(c, v) => propCols.contains(c) && literalOk(v)
    case LessThan(c, v) => propCols.contains(c) && literalOk(v)
    case LessThanOrEqual(c, v) => propCols.contains(c) && literalOk(v)
    case In(c, vs) => propCols.contains(c) && vs != null && vs.forall(literalOk)
    case IsNull(c) => propCols.contains(c)
    case IsNotNull(c) => propCols.contains(c)
    case And(l, r) => acceptable(l, propCols) && acceptable(r, propCols)
    case Or(l, r) => acceptable(l, propCols) && acceptable(r, propCols)
    case _ => false
  }

  private def literalOk(v: Any): Boolean = norm(v) match {
    case null => false
    case _: java.lang.Boolean | _: java.lang.Integer | _: java.lang.Long |
         _: java.lang.Float | _: java.lang.Double | _: String => true
    case _ => false
  }

  /** Normalize a pushed literal to the connector's internal value space
    * (GraphAr DATE is Int days-since-epoch, ChunkIO.scala header note).
    */
  private def norm(v: Any): Any = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case x => x
  }

  /** Three-valued-safe compare; None when either side is null or the
    * types are incomparable (callers treat None as "unknown"). Both
    * sides are normalized: row values may arrive as UTF8String from the
    * vectorized parquet path, literals as java.sql/java.time dates.
    */
  private def cmp(a: Any, b: Any): Option[Int] = (norm(a), norm(b)) match {
    case (null, _) | (_, null) => None
    case (x: java.lang.Number, y: java.lang.Number) =>
      if (x.isInstanceOf[java.lang.Float] || x.isInstanceOf[java.lang.Double] ||
        y.isInstanceOf[java.lang.Float] || y.isInstanceOf[java.lang.Double])
        // Spark SQL treats -0.0 = 0.0 (Double.compare does not) — fold
        // negative zero before comparing; NaN keeps Double.compare's
        // greater-than-everything order, which matches Spark's.
        Some(java.lang.Double.compare(zeroNorm(x.doubleValue()),
          zeroNorm(y.doubleValue())))
      else Some(java.lang.Long.compare(x.longValue(), y.longValue()))
    case (x: String, y: String) =>
      // Spark/parquet order strings by UTF-8 bytes (code points), not
      // Java's UTF-16 code units — the orders differ for
      // supplementary-plane characters, and a divergence here breaks the
      // "pushed filter can only read MORE rows" invariant.
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)))
    case (x: java.lang.Boolean, y: java.lang.Boolean) =>
      Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private def zeroNorm(d: Double): Double = if (d == 0.0d) 0.0d else d

  /** Evaluate one accepted filter against a row (`get` = column → raw
    * JVM value per ChunkIO's representation, null when absent).
    */
  def evalRow(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(c, v) => cmp(get(c), v).contains(0)
    case GreaterThan(c, v) => cmp(get(c), v).exists(_ > 0)
    case GreaterThanOrEqual(c, v) => cmp(get(c), v).exists(_ >= 0)
    case LessThan(c, v) => cmp(get(c), v).exists(_ < 0)
    case LessThanOrEqual(c, v) => cmp(get(c), v).exists(_ <= 0)
    case In(c, vs) => vs.exists(v => cmp(get(c), v).contains(0))
    case IsNull(c) => get(c) == null
    case IsNotNull(c) => get(c) != null
    case And(l, r) => evalRow(l, get) && evalRow(r, get)
    case Or(l, r) => evalRow(l, get) || evalRow(r, get)
    case _ => true // unreachable for accepted filters; conservative
  }

  /** Per-column [min, max] + hasNulls from one parquet row group. */
  private final case class ColStats(min: Any, max: Any, hasNulls: Boolean)

  /** Parquet min/max statistics EXCLUDE NaN (per spec), while Spark
    * orders NaN above every value and NaN = NaN is true — so min/max
    * reasoning is unsound for float/double comparisons (a chunk whose
    * stats say max=2.0 may hold NaN rows that match `> 5.0`). Those
    * filters never skip on stats; the per-row test (Double.compare ==
    * Spark's NaN order) still applies.
    */
  private def fpLiteral(v: Any): Boolean = norm(v) match {
    case _: java.lang.Float | _: java.lang.Double => true
    case _ => false
  }

  /** Can this row group possibly satisfy `f`? Missing stats → true. */
  private def canMatch(f: Filter, stats: Map[String, ColStats]): Boolean = f match {
    case EqualTo(_, v) if fpLiteral(v) => true
    case GreaterThan(_, v) if fpLiteral(v) => true
    case GreaterThanOrEqual(_, v) if fpLiteral(v) => true
    case LessThan(_, v) if fpLiteral(v) => true
    case LessThanOrEqual(_, v) if fpLiteral(v) => true
    case In(_, vs) if vs.exists(fpLiteral) => true
    case EqualTo(c, v) => stats.get(c).forall(s =>
      cmp(v, s.min).forall(_ >= 0) && cmp(v, s.max).forall(_ <= 0))
    case GreaterThan(c, v) => stats.get(c).forall(s => cmp(s.max, v).forall(_ > 0))
    case GreaterThanOrEqual(c, v) => stats.get(c).forall(s => cmp(s.max, v).forall(_ >= 0))
    case LessThan(c, v) => stats.get(c).forall(s => cmp(s.min, v).forall(_ < 0))
    case LessThanOrEqual(c, v) => stats.get(c).forall(s => cmp(s.min, v).forall(_ <= 0))
    case In(c, vs) => stats.get(c).forall(s => vs.exists(v =>
      cmp(v, s.min).forall(_ >= 0) && cmp(v, s.max).forall(_ <= 0)))
    case IsNull(c) => stats.get(c).forall(_.hasNulls)
    case IsNotNull(_) => true
    case And(l, r) => canMatch(l, stats) && canMatch(r, stats)
    case Or(l, r) => canMatch(l, stats) || canMatch(r, stats)
    case _ => true
  }

  /** Chunk-level skip decision from parquet footer statistics: false only
    * when NO row group of the file can satisfy the conjunction of
    * `filters`. Non-parquet files and any stats hiccup → true (read it).
    */
  def parquetChunkCanMatch(path: Path, filters: Seq[Filter],
                           conf: Configuration): Boolean = {
    if (filters.isEmpty) return true
    try {
      val in = HadoopInputFile.fromPath(path, conf)
      val reader = ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks
        var bi = 0
        while (bi < blocks.size()) {
          val block = blocks.get(bi)
          val stats = scala.collection.mutable.Map.empty[String, ColStats]
          val cols = block.getColumns
          var ci = 0
          while (ci < cols.size()) {
            val cc = cols.get(ci)
            val st = cc.getStatistics
            if (st != null && st.hasNonNullValue) {
              val name = cc.getPath.toDotString
              stats(name) = ColStats(
                statVal(st.genericGetMin.asInstanceOf[AnyRef]),
                statVal(st.genericGetMax.asInstanceOf[AnyRef]),
                st.getNumNulls != 0)
            }
            ci += 1
          }
          if (filters.forall(canMatch(_, stats.toMap))) return true
          bi += 1
        }
        false
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(_) => true // stats unavailable → scan
    }
  }

  private def statVal(v: AnyRef): Any = v match {
    case b: Binary => b.toStringUsingUTF8
    case x => x
  }

  /** Format dispatch for the chunk-skip decision; formats without
    * readable statistics (csv) always read.
    */
  def chunkCanMatch(path: Path, fileType: String, filters: Seq[Filter],
                    conf: Configuration): Boolean = fileType match {
    case "parquet" => parquetChunkCanMatch(path, filters, conf)
    case "orc" => orcChunkCanMatch(path, filters, conf)
    case _ => true
  }

  /** Chunk-level skip from ORC file-level column statistics (GraphAr
    * chunks are small files, typically one stripe — file granularity is
    * the stripe granularity). Only integer/date/boolean stats are
    * consulted: fp literals are stats-exempt in [[canMatch]] (NaN is
    * outside min/max), and STRING stats are ignored because ORC writers
    * compute string extrema in Java UTF-16 order, which diverges from
    * Spark's UTF-8 order on supplementary-plane characters — range
    * reasoning over them could skip rows the residual filter would keep.
    * Any stats hiccup → read the chunk.
    */
  def orcChunkCanMatch(path: Path, filters: Seq[Filter],
                       conf: Configuration): Boolean = {
    if (filters.isEmpty) return true
    try {
      val reader = org.apache.orc.OrcFile.createReader(
        path, org.apache.orc.OrcFile.readerOptions(conf))
      try {
        val schema = reader.getSchema
        val names = schema.getFieldNames
        val colStats = reader.getStatistics
        val stats = scala.collection.mutable.Map.empty[String, ColStats]
        var i = 0
        while (i < names.size()) {
          val st = colStats(schema.getChildren.get(i).getId)
          if (st.getNumberOfValues > 0) st match {
            case s: org.apache.orc.IntegerColumnStatistics =>
              stats(names.get(i)) = ColStats(s.getMinimum, s.getMaximum, st.hasNull)
            case s: org.apache.orc.DateColumnStatistics =>
              stats(names.get(i)) = ColStats(s.getMinimumDayOfEpoch.toInt,
                s.getMaximumDayOfEpoch.toInt, st.hasNull)
            case s: org.apache.orc.BooleanColumnStatistics =>
              // min = "are there any false", max = "are there any true"
              stats(names.get(i)) = ColStats(s.getFalseCount == 0L,
                s.getTrueCount > 0L, st.hasNull)
            case _ => // double/float/string: excluded (see scaladoc)
          }
          i += 1
        }
        filters.forall(canMatch(_, stats.toMap))
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(_) => true // stats unavailable → scan
    }
  }

  /** Does the conjunction contain a leaf a bloom filter could refute?
    * (Only membership leaves — range predicates can't use a bloom.) */
  def hasBloomableLeaf(f: Filter): Boolean = f match {
    case _: EqualTo | _: In => true
    case And(l, r) => hasBloomableLeaf(l) || hasBloomableLeaf(r)
    case Or(l, r) => hasBloomableLeaf(l) && hasBloomableLeaf(r)
    case _ => false
  }

  /** Can this chunk possibly satisfy `f`, given per-column bloom
    * filters? Columns without a bloom → unknown → true. Conservative
    * like [[canMatch]]: a `false` can only come from a definite
    * bloom miss on every disjunct.
    */
  def bloomCanMatch(f: Filter,
                    blooms: Map[String, org.apache.spark.util.sketch.BloomFilter]): Boolean =
    f match {
      case EqualTo(c, v) => blooms.get(c).forall(might(_, v))
      case In(c, vs) => blooms.get(c).forall(b => vs.exists(might(b, _)))
      case And(l, r) => bloomCanMatch(l, blooms) && bloomCanMatch(r, blooms)
      case Or(l, r) => bloomCanMatch(l, blooms) || bloomCanMatch(r, blooms)
      case _ => true
    }

  private def might(b: org.apache.spark.util.sketch.BloomFilter, v: Any): Boolean =
    norm(v) match {
      case null => true // null literal: bloom holds non-null values only
      case i: java.lang.Byte => b.mightContainLong(i.longValue())
      case i: java.lang.Short => b.mightContainLong(i.longValue())
      case i: java.lang.Integer => b.mightContainLong(i.longValue())
      case i: java.lang.Long => b.mightContainLong(i.longValue())
      case s: String => b.mightContainString(s)
      case _ => true // fp/boolean literals are never bloom-indexed
    }

  /** Chunk-level skip from the optional `<chunk>.bloom` sidecar
    * ([[BloomSidecar]], written by GraphArWriter for the spec's
    * `bloomCols`): false only when the conjunction is definitely
    * unsatisfiable by the sidecar's membership filters. Missing or
    * unreadable sidecar → read the chunk. The footer min/max skip
    * ([[chunkCanMatch]]) handles sorted/clustered columns; the bloom
    * handles the complementary case — point lookups on UNSORTED
    * high-cardinality columns, where every chunk's min/max range spans
    * the probe value and stats prune nothing.
    */
  def bloomChunkCanMatch(path: Path, filters: Seq[Filter],
                         conf: Configuration): Boolean = {
    if (filters.isEmpty || !filters.exists(hasBloomableLeaf)) return true
    try {
      val fs = path.getFileSystem(conf)
      val bp = BloomSidecar.sidecarPath(path)
      if (!fs.exists(bp)) return true
      // stale-sidecar guard: trust only a sidecar at least as new as the
      // chunk it indexes (the writer closes the chunk before writing the
      // sidecar) — a chunk later rewritten WITHOUT bloomCols must not be
      // pruned by the previous write's filters
      if (fs.getFileStatus(bp).getModificationTime <
        fs.getFileStatus(path).getModificationTime) return true
      val blooms = BloomSidecar.read(bp, conf)
      blooms.isEmpty || filters.forall(bloomCanMatch(_, blooms))
    } catch {
      case scala.util.control.NonFatal(_) => true // sidecar hiccup → scan
    }
  }
}

/** Per-chunk bloom-filter sidecar file: `<chunk>.bloom` beside the
  * property-group chunk it indexes. Layout: magic, column count, then
  * per column (UTF name, byte length, `spark.util.sketch.BloomFilter`
  * stream bytes). Sidecars are ~1.2 MB per million rows per column at
  * the default 1% fpp — ≤0.5% of the chunk they can save reading.
  */
object BloomSidecar {
  val Magic = 0x47424C4D // "GBLM"

  def sidecarPath(chunk: Path): Path =
    new Path(chunk.getParent, chunk.getName + ".bloom")

  def write(path: Path, conf: Configuration,
            cols: Seq[(String, org.apache.spark.util.sketch.BloomFilter)]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(
        path.getFileSystem(conf).create(path, true)))
    try {
      out.writeInt(Magic)
      out.writeInt(cols.size)
      cols.foreach { case (name, bf) =>
        out.writeUTF(name)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        val bytes = bos.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    } finally out.close()
  }

  /** Empty map when the sidecar is absent or unreadable (→ no skip). */
  def read(path: Path,
           conf: Configuration): Map[String, org.apache.spark.util.sketch.BloomFilter] =
    try {
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path)) return Map.empty
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fs.open(path)))
      try {
        if (in.readInt() != Magic) return Map.empty
        val n = in.readInt()
        (0 until n).map { _ =>
          val name = in.readUTF()
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          name -> org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes))
        }.toMap
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => Map.empty
    }
}
