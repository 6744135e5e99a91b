package graft.sources.graphar

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{GraphArMeta, VertexInfo}

/** Columnar DSv2 read path: the vectorized parquet readers' batches are
  * zipped across property-group files and handed to Spark as
  * `ColumnarBatch`es — no per-row materialization at the source boundary
  * (the reference's analogue is its zero-copy Arrow export,
  * read_base.hpp:408-449). Spark plans `ColumnarToRow` (codegen'd bulk
  * copy) or keeps batches columnar for operators that support them.
  *
  * Enabled by [[GraphArScan]] only for full-chunk parquet scans (no id
  * seek slice, no pushed property predicates); everything else uses the
  * row path, and Spark requires the choice to be uniform per scan.
  */
object GraphArColumnar {

  /** Per-property-group batch readers for a vertex chunk (projection
    * pushdown: groups with no required column are never opened).
    */
  def vertexGroups(p: VertexChunkPartition, required: StructType,
                   conf: Configuration): Seq[(ChunkIO.BatchReader, StructType)] = {
    val requiredNames = required.fieldNames.toSet
    val specs = p.info.propertyGroups.flatMap { g =>
      val sch = StructType(g.properties
        .filter(pr => requiredNames.contains(pr.name))
        .map(pr => StructField(pr.name, GraphArMeta.sparkType(pr.dataType), pr.isNullable)))
      if (sch.isEmpty) None
      else Some((new Path(s"${p.info.dir}${g.prefix}chunk${p.chunk}"), g.fileType, sch))
    }
    ChunkIO.openAll(specs.map { case (path, ft, sch) =>
      () => ChunkIO.readBatches(path, ft, sch, conf)
    }).zip(specs.map(_._3))
  }

  /** Per-file batch readers for an edge chunk. Unlike the row path, the
    * adjacency file is opened ONLY when src/dst indices are projected —
    * the partition's row bounds are exact, so a properties-only scan
    * skips the adjacency file entirely.
    */
  def edgeGroups(p: EdgeChunkPartition, required: StructType,
                 conf: Configuration): Seq[(ChunkIO.BatchReader, StructType)] = {
    val requiredNames = required.fieldNames.toSet
    val adjSch = StructType(Seq(
      StructField(GraphArMeta.SrcIndexCol, LongType, nullable = false),
      StructField(GraphArMeta.DstIndexCol, LongType, nullable = false))
      .filter(f => requiredNames.contains(f.name)))
    val adj =
      if (adjSch.isEmpty) None
      else Some((new Path(s"${p.info.adjDir(p.al)}adj_list/part${p.part}/chunk${p.chunk}"),
        p.al.fileType, adjSch))
    val pgs = p.info.propertyGroups.flatMap { g =>
      val sch = StructType(g.properties
        .filter(pr => requiredNames.contains(pr.name))
        .map(pr => StructField(pr.name, GraphArMeta.sparkType(pr.dataType), pr.isNullable)))
      if (sch.isEmpty) None
      else Some((new Path(s"${p.info.adjDir(p.al)}${g.prefix}part${p.part}/chunk${p.chunk}"),
        g.fileType, sch))
    }
    val specs = adj.toSeq ++ pgs
    ChunkIO.openAll(specs.map { case (path, ft, sch) =>
      () => ChunkIO.readBatches(path, ft, sch, conf)
    }).zip(specs.map(_._3))
  }
}

/** Zips per-group `ColumnarBatch`es into the projected output batch.
  *
  * Groups may batch on different boundaries (row-group size vs the 4096
  * capacity); each output batch covers the overlap of what every group
  * has available, exposing later rows of a partially-consumed source
  * batch through an [[OffsetVector]] view — realignment without copying.
  *
  * `syntheticBase(name)` gives the absolute index value of this chunk's
  * row 0 for a synthetic column served from arithmetic (vertex index);
  * with no opened groups at all, batches are generated purely from the
  * partition's row bounds.
  */
class ColumnarChunkReader(open: () => Seq[(ChunkIO.BatchReader, StructType)],
                          required: StructType,
                          syntheticBase: String => Long,
                          totalRows: Long)
  extends PartitionReader[ColumnarBatch] {

  // explicit var, not a lazy val: failed lazy init would re-run open()
  // (re-opening files) when close() touches it after an error
  private var groupsV: Seq[(ChunkIO.BatchReader, StructType)] = null
  private def groups: Seq[(ChunkIO.BatchReader, StructType)] = {
    if (groupsV == null) groupsV = open() // open() is leak-safe (openAll)
    groupsV
  }

  /** required field → Left(synthetic name) | Right((group, column)). */
  private lazy val fieldSources: Array[Either[String, (Int, Int)]] =
    required.fields.map { f =>
      val hit = groups.zipWithIndex.flatMap { case ((_, sch), gi) =>
        val fi = sch.fieldNames.indexOf(f.name)
        if (fi >= 0) Some((gi, fi)) else None
      }
      f.name match {
        case n if n == GraphArMeta.VertexIndexCol || n == GraphArMeta.SrcIndexCol ||
          n == GraphArMeta.DstIndexCol =>
          hit.headOption.map(Right(_)).getOrElse(Left(n))
        case _ => Right(hit.headOption.getOrElse(
          throw new IllegalArgumentException(s"column ${f.name} not found in any property group")))
      }
    }

  private lazy val cur = new Array[ColumnarBatch](groups.length)
  private lazy val consumed = new Array[Int](groups.length)
  private var emitted = 0L
  private var out: ColumnarBatch = _

  override def next(): Boolean = {
    if (emitted >= totalRows) return false
    if (groups.isEmpty) {
      val n = math.min(4096L, totalRows - emitted).toInt
      // Serve ONLY the known synthetic index columns from arithmetic;
      // fieldSources throws "column not found" for any other required
      // field, matching the row path — fabricating index values for a
      // real property column would be silent corruption.
      val vecs: Array[ColumnVector] = fieldSources.map {
        case Left(name) =>
          new LongRangeVector(syntheticBase(name) + emitted): ColumnVector
        case Right(_) => throw new IllegalStateException(
          "non-synthetic column mapped to a property group but no group was opened")
      }
      out = new ColumnarBatch(vecs, n)
      emitted += n
      return true
    }
    var i = 0
    while (i < groups.length) {
      if (cur(i) == null || consumed(i) >= cur(i).numRows) {
        if (!groups(i)._1.nextBatch()) return false
        cur(i) = groups(i)._1.batch()
        consumed(i) = 0
      }
      i += 1
    }
    var n = (totalRows - emitted).min(Int.MaxValue.toLong).toInt
    i = 0
    while (i < groups.length) {
      n = math.min(n, cur(i).numRows - consumed(i))
      i += 1
    }
    val vecs: Array[ColumnVector] = fieldSources.map {
      case Left(name) => new LongRangeVector(syntheticBase(name) + emitted): ColumnVector
      case Right((gi, fi)) =>
        val v = cur(gi).column(fi)
        if (consumed(gi) == 0) v else new OffsetVector(v, consumed(gi))
    }
    out = new ColumnarBatch(vecs, n)
    i = 0
    while (i < groups.length) { consumed(i) += n; i += 1 }
    emitted += n
    true
  }

  override def get(): ColumnarBatch = out
  override def close(): Unit = if (groupsV != null) {
    groupsV.foreach(_._1.close())
    groupsV = null
  }
}

/** Read-only view of `v` shifted by `off` rows — realigns
  * differently-batched property groups without copying. Flat primitive
  * chunk schemas only (GraphAr's 7 types); nested children would need
  * offset-aware traversal and are rejected at eligibility time.
  */
class OffsetVector(v: ColumnVector, off: Int) extends ColumnVector(v.dataType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = v.hasNull
  override def numNulls: Int = v.numNulls
  override def isNullAt(rowId: Int): Boolean = v.isNullAt(rowId + off)
  override def getBoolean(rowId: Int): Boolean = v.getBoolean(rowId + off)
  override def getByte(rowId: Int): Byte = v.getByte(rowId + off)
  override def getShort(rowId: Int): Short = v.getShort(rowId + off)
  override def getInt(rowId: Int): Int = v.getInt(rowId + off)
  override def getLong(rowId: Int): Long = v.getLong(rowId + off)
  override def getFloat(rowId: Int): Float = v.getFloat(rowId + off)
  override def getDouble(rowId: Int): Double = v.getDouble(rowId + off)
  override def getArray(rowId: Int): ColumnarArray = v.getArray(rowId + off)
  override def getMap(rowId: Int): ColumnarMap = v.getMap(rowId + off)
  override def getDecimal(rowId: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    v.getDecimal(rowId + off, precision, scale)
  override def getUTF8String(rowId: Int): UTF8String = v.getUTF8String(rowId + off)
  override def getBinary(rowId: Int): Array[Byte] = v.getBinary(rowId + off)
  override def getChild(ordinal: Int): ColumnVector =
    throw new UnsupportedOperationException("nested types not offset-viewable")
}

/** Synthetic index column: value(rowId) = base + rowId, no storage. */
class LongRangeVector(base: Long) extends ColumnVector(LongType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = false
  override def numNulls: Int = 0
  override def isNullAt(rowId: Int): Boolean = false
  override def getBoolean(rowId: Int): Boolean =
    throw new UnsupportedOperationException
  override def getByte(rowId: Int): Byte = throw new UnsupportedOperationException
  override def getShort(rowId: Int): Short = throw new UnsupportedOperationException
  override def getInt(rowId: Int): Int = throw new UnsupportedOperationException
  override def getLong(rowId: Int): Long = base + rowId
  override def getFloat(rowId: Int): Float = throw new UnsupportedOperationException
  override def getDouble(rowId: Int): Double = throw new UnsupportedOperationException
  override def getArray(rowId: Int): ColumnarArray = throw new UnsupportedOperationException
  override def getMap(rowId: Int): ColumnarMap = throw new UnsupportedOperationException
  override def getDecimal(rowId: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    throw new UnsupportedOperationException
  override def getUTF8String(rowId: Int): UTF8String =
    throw new UnsupportedOperationException
  override def getBinary(rowId: Int): Array[Byte] =
    throw new UnsupportedOperationException
  override def getChild(ordinal: Int): ColumnVector =
    throw new UnsupportedOperationException
}
