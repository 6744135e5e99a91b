package graft.sources.graphar

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.time.LocalDate

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader, ParquetWriter}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

/** Chunk-file codec for GraphAr data files.
  *
  * GraphAr stores fixed-size row chunks per property group / adjacency list
  * (`file_type: csv | parquet | orc` — Person.vertex.yaml); rows across
  * property groups of the same chunk are positionally aligned (the
  * reference zips them during its Arrow export, read_base.hpp:365-467).
  *
  * Executor-side: these run inside DSv2 `PartitionReader`s and in the
  * writer's `foreachPartition` tasks — no SparkSession needed, all I/O via
  * the Hadoop FileSystem API (local/HDFS/S3).
  *
  * Internal value representation per GraphAr's 7 primitives
  * (func.cpp:18-28): Boolean, Int, Long, Float, Double, String, and DATE
  * as Int days-since-epoch.
  */
object ChunkIO {

  // ---------------------------------------------------------------- parquet

  private def parquetSchema(name: String, schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val rep = if (f.nullable) org.apache.parquet.schema.Type.Repetition.OPTIONAL
                else org.apache.parquet.schema.Type.Repetition.REQUIRED
      val t = f.dataType match {
        case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep)
        case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep)
        case LongType => Types.primitive(PrimitiveTypeName.INT64, rep)
        case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, rep)
        case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, rep)
        case StringType => Types.primitive(PrimitiveTypeName.BINARY, rep)
          .as(LogicalTypeAnnotation.stringType())
        case DateType => Types.primitive(PrimitiveTypeName.INT32, rep)
          .as(LogicalTypeAnnotation.dateType())
        case other => throw new IllegalArgumentException(s"unsupported: $other")
      }
      b.addField(t.named(f.name))
    }
    b.named(name)
  }

  /** Closeable row iterator: partial consumers (id seeks, pushed limits)
    * MUST call close() or file handles leak on long-lived executors.
    */
  trait RowReader extends Iterator[Array[Any]] with AutoCloseable

  /** Open several readers; if the k-th open throws, the k-1 already
    * opened are closed before rethrowing — a missing/corrupt file in one
    * property group must not leak the other groups' handles on a
    * long-lived executor.
    */
  def openAll[T <: AutoCloseable](opens: Seq[() => T]): Seq[T] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[T]
    try { opens.foreach(o => acc += o()); acc.toSeq }
    catch {
      case e: Throwable =>
        acc.foreach(r => try r.close() catch { case _: Throwable => () })
        throw e
    }
  }

  /** Vectorized parquet chunk decode via Spark's own
    * `VectorizedParquetRecordReader` — columnar page decode, requested-
    * schema projection inside the file, and no per-row `Group` object
    * churn (the reference's analogue is its zero-copy Arrow export,
    * read_base.hpp:408-449). Values surface in Catalyst representation
    * (UTF8String for strings, Int days for dates), which
    * `ChunkZipReader.get` passes through unconverted.
    *
    * Row-at-a-time `readParquetRows` (the parquet example API) remains as
    * the fallback for schema shapes the vectorized reader rejects.
    */
  /** Construct + initialize Spark's vectorized reader for one chunk file
    * (shared by the row-materializing and ColumnarBatch paths).
    */
  private def vectorizedReader(path: Path, schema: StructType, conf: Configuration)
      : org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader = {
    import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
    val c = new Configuration(conf)
    // the keys Spark's ParquetFileFormat seeds before handing a split to
    // the vectorized reader (stable string constants since Spark 2.x)
    c.set("org.apache.spark.sql.parquet.row.requested_schema", schema.json)
    c.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    c.setBoolean("spark.sql.parquet.binaryAsString", false)
    c.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    c.setBoolean("spark.sql.caseSensitive", false)
    c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    val len = path.getFileSystem(c).getFileStatus(path).getLen
    val split = new org.apache.hadoop.mapred.FileSplit(
      path, 0, len, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      c, new org.apache.hadoop.mapreduce.TaskAttemptID())
    // CORRECTED rebase: our chunks are written with modern (proleptic
    // Gregorian) semantics; no legacy hybrid-calendar files exist
    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "", "CORRECTED", "", false, 4096)
    reader.initialize(split, ctx)
    reader
  }

  /** Batch-level chunk reader: surfaces the vectorized reader's
    * `ColumnarBatch`es directly — zero per-row materialization. The
    * DSv2 columnar path ([[ColumnarChunkReader]]) zips these across
    * property groups; batch vectors are REUSED on each `nextBatch`, so
    * a batch must be fully consumed before advancing.
    */
  trait BatchReader extends AutoCloseable {
    def nextBatch(): Boolean
    def batch(): org.apache.spark.sql.vectorized.ColumnarBatch
  }

  def readParquetBatches(path: Path, schema: StructType,
                         conf: Configuration): BatchReader = {
    val reader = vectorizedReader(path, schema, conf)
    reader.enableReturningBatches()
    new BatchReader {
      private var closed = false
      override def nextBatch(): Boolean = reader.nextKeyValue()
      override def batch(): org.apache.spark.sql.vectorized.ColumnarBatch =
        reader.getCurrentValue.asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
      override def close(): Unit = if (!closed) { closed = true; reader.close() }
    }
  }

  /** Batch-level ORC chunk decode: the ORC reader's own
    * `VectorizedRowBatch` columns are wrapped as Spark `ColumnVector`s
    * (OrcVectorBridge → Spark's null/repeating-aware adapters) — no
    * per-row materialization, matching the parquet batch path. Column
    * pruning happens INSIDE the file via the include mask (unselected
    * streams never decode). CSV stays row-based: its parser is
    * inherently row-at-a-time.
    */
  def readOrcBatches(path: Path, schema: StructType,
                     conf: Configuration): BatchReader = {
    import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
    val reader = org.apache.orc.OrcFile.createReader(
      path, org.apache.orc.OrcFile.readerOptions(conf))
    // the RecordReader does not own the file Reader's stream on every
    // ORC version — close BOTH, and don't leak the Reader if setup throws
    try {
      val fileSchema = reader.getSchema
      val names = fileSchema.getFieldNames
      val colIdx = schema.fields.map(f => names.indexOf(f.name))
      colIdx.zip(schema.fields).foreach { case (i, f) =>
        if (i < 0) throw new IllegalArgumentException(
          s"column ${f.name} not in orc schema of $path")
      }
      val include = new Array[Boolean](fileSchema.getMaximumId + 1)
      include(0) = true
      colIdx.foreach { i =>
        val child = fileSchema.getChildren.get(i)
        (child.getId to child.getMaximumId).foreach(id => include(id) = true)
      }
      val rows = reader.rows(reader.options().include(include))
      val vrb = fileSchema.createRowBatch(4096)
      new BatchReader {
        private var closed = false
        private var out: ColumnarBatch = _
        override def nextBatch(): Boolean = {
          val more = rows.nextBatch(vrb)
          if (more) {
            val vecs: Array[ColumnVector] = colIdx.zip(schema.fields).map {
              case (i, f) =>
                org.apache.spark.sql.execution.datasources.orc.OrcVectorBridge
                  .wrap(f.dataType, vrb.cols(i)): ColumnVector
            }
            out = new ColumnarBatch(vecs, vrb.size)
          }
          more
        }
        override def batch(): ColumnarBatch = out
        override def close(): Unit = if (!closed) {
          closed = true
          try rows.close() finally reader.close()
        }
      }
    } catch { case t: Throwable => reader.close(); throw t }
  }

  /** Batch reader dispatch for the columnar scan path (parquet + orc;
    * csv has no vectorized decode and is rejected at eligibility time).
    */
  def readBatches(path: Path, fileType: String, schema: StructType,
                  conf: Configuration): BatchReader = fileType match {
    case "parquet" => readParquetBatches(path, schema, conf)
    case "orc" => readOrcBatches(path, schema, conf)
    case other => throw new IllegalArgumentException(
      s"no batch reader for file_type $other")
  }

  private def readParquetVectorized(path: Path, schema: StructType,
                                    conf: Configuration): RowReader = {
    val reader = vectorizedReader(path, schema, conf)
    new RowReader {
      private var closed = false
      private var advanced = false
      private var hasRow = false
      override def close(): Unit = if (!closed) { closed = true; reader.close() }
      override def hasNext: Boolean = {
        if (!advanced) { hasRow = reader.nextKeyValue(); advanced = true; if (!hasRow) close() }
        hasRow
      }
      override def next(): Array[Any] = {
        if (!hasNext) throw new NoSuchElementException(path.toString)
        advanced = false
        val r = reader.getCurrentValue.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val row = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          row(i) =
            if (r.isNullAt(i)) null
            else schema(i).dataType match {
              case BooleanType => r.getBoolean(i)
              case IntegerType | DateType => r.getInt(i)
              case LongType => r.getLong(i)
              case FloatType => r.getFloat(i)
              case DoubleType => r.getDouble(i)
              // clone: the batch's backing buffers are recycled on the
              // next page, so the string must own its bytes
              case StringType => r.getUTF8String(i).clone()
              case other => throw new IllegalArgumentException(s"unsupported: $other")
            }
          i += 1
        }
        row
      }
    }
  }

  private def readParquet(path: Path, schema: StructType,
                          conf: Configuration): RowReader =
    try readParquetVectorized(path, schema, conf)
    catch {
      case scala.util.control.NonFatal(_) => readParquetRows(path, schema, conf)
    }

  private def readParquetRows(path: Path, schema: StructType,
                              conf: Configuration): RowReader = {
    val reader = ParquetReader.builder(new GroupReadSupport(), path)
      .withConf(conf).build()
    new RowReader {
      private var closed = false
      override def close(): Unit = if (!closed) { closed = true; reader.close() }
      private var nextGroup: Group = reader.read()
      override def hasNext: Boolean = {
        if (nextGroup == null) close()
        nextGroup != null
      }
      override def next(): Array[Any] = {
        val g = nextGroup
        val row = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          val f = schema(i)
          // column resolution by name: chunk files may carry extra columns
          val fi = g.getType.getFieldIndex(f.name)
          row(i) =
            if (g.getFieldRepetitionCount(fi) == 0) null
            else f.dataType match {
              case BooleanType => g.getBoolean(fi, 0)
              case IntegerType => g.getInteger(fi, 0)
              case LongType => g.getLong(fi, 0)
              case FloatType => g.getFloat(fi, 0)
              case DoubleType => g.getDouble(fi, 0)
              case StringType => g.getString(fi, 0)
              case DateType => g.getInteger(fi, 0)
              case other => throw new IllegalArgumentException(s"unsupported: $other")
            }
          i += 1
        }
        nextGroup = reader.read()
        row
      }
    }
  }

  /** Streaming row sink — lets the writer stream one pass of rows into
    * several chunk files (one per property group) simultaneously.
    */
  trait RowSink {
    def write(row: Array[Any]): Unit
    def close(): Unit
  }

  private class ParquetSink(path: Path, schema: StructType, conf: Configuration)
    extends RowSink {
    private val msgType = parquetSchema("graphar_chunk", schema)
    private val writer: ParquetWriter[Group] = {
      val c = new Configuration(conf)
      GroupWriteSupport.setSchema(msgType, c)
      ExampleParquetWriter.builder(path)
        .withConf(c)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
    }
    private val factory = new SimpleGroupFactory(msgType)
    override def write(row: Array[Any]): Unit = {
      val g = factory.newGroup()
      var i = 0
      while (i < schema.length) {
        if (row(i) != null) {
          schema(i).dataType match {
            case BooleanType => g.add(i, row(i).asInstanceOf[Boolean])
            case IntegerType => g.add(i, row(i).asInstanceOf[Int])
            case LongType => g.add(i, row(i).asInstanceOf[Long])
            case FloatType => g.add(i, row(i).asInstanceOf[Float])
            case DoubleType => g.add(i, row(i).asInstanceOf[Double])
            case StringType => g.add(i, row(i).asInstanceOf[String])
            case DateType => g.add(i, row(i).asInstanceOf[Int])
            case other => throw new IllegalArgumentException(s"unsupported: $other")
          }
        }
        i += 1
      }
      writer.write(g)
    }
    override def close(): Unit = writer.close()
  }

  private class CsvSink(path: Path, schema: StructType, conf: Configuration)
    extends RowSink {
    private val fs = path.getFileSystem(conf)
    private val w = new OutputStreamWriter(fs.create(path, true), StandardCharsets.UTF_8)
    w.write(schema.fields.map(f => "\"" + f.name + "\"").mkString(",") + "\n")
    override def write(row: Array[Any]): Unit = {
      val cells = schema.fields.zipWithIndex.map { case (f, i) =>
        row(i) match {
          case null => ""
          case days: Int if f.dataType == DateType => LocalDate.ofEpochDay(days.toLong).toString
          case s: String => quoteCsv(s)
          case v => v.toString
        }
      }
      w.write(cells.mkString(",") + "\n")
    }
    override def close(): Unit = w.close()
  }

  def openSink(path: Path, fileType: String, schema: StructType,
               conf: Configuration): RowSink = fileType match {
    case "parquet" => new ParquetSink(path, schema, conf)
    case "csv" => new CsvSink(path, schema, conf)
    case "orc" => new OrcSink(path, schema, conf)
    case other => throw new IllegalArgumentException(
      s"unsupported GraphAr file_type: $other (supported: parquet, csv, orc)")
  }

  // ------------------------------------------------------------------- csv

  /** Minimal RFC-4180 codec — the reference fixture uses quoted headers and
    * bare values (`"_graphArVertexIndex","hash_phone_no"` / `0,0`).
    */
  def splitCsvLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString(); sb.clear()
        case _ => sb.append(c)
      }
      i += 1
    }
    out += sb.toString()
    out.toArray
  }

  /** An empty STRING is quoted (`""`) so it stays distinguishable from a
    * null, which is written as a bare empty cell.
    */
  private def quoteCsv(s: String): String =
    if (s.isEmpty || s.contains(',') || s.contains('"') ||
      s.contains('\n') || s.contains('\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def parseCsvValue(v: String, quoted: Boolean, dt: DataType,
                            nullable: Boolean): Any = {
    // bare empty cell = null (quoted "" is a real empty string)
    if (v.isEmpty && !quoted && nullable) return null
    dt match {
      case BooleanType => v.toBoolean
      case IntegerType => v.toInt
      case LongType => v.toLong
      case FloatType => v.toFloat
      case DoubleType => v.toDouble
      case StringType => v
      case DateType => LocalDate.parse(v).toEpochDay.toInt
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
  }

  /** RFC-4180 record parser over a char stream: quoted fields may span
    * physical lines (embedded \n / \r\n). Returns null at EOF; otherwise
    * the cells plus which were quoted.
    */
  private def readCsvRecord(br: BufferedReader): (Array[String], Array[Boolean]) = {
    var c = br.read()
    if (c == -1) return null
    // NOTE: a blank line is a REAL record (one bare-empty cell = a null in
    // a single-column group) — only EOF ends the stream. The final
    // newline of the file is consumed by the record it terminates, so it
    // produces no spurious empty record.
    val cells = scala.collection.mutable.ArrayBuffer.empty[String]
    val quoted = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val sb = new StringBuilder
    var cellQuoted = false
    var inQ = false
    var done = false
    while (!done) {
      if (c == -1) done = true
      else if (inQ) {
        if (c == '"') {
          val n = br.read()
          if (n == '"') { sb.append('"'); c = br.read() }
          else { inQ = false; c = n }
        } else { sb.append(c.toChar); c = br.read() }
      } else c match {
        case '"' => inQ = true; cellQuoted = true; c = br.read()
        case ',' =>
          cells += sb.toString(); quoted += cellQuoted
          sb.clear(); cellQuoted = false; c = br.read()
        case '\r' => c = br.read() // swallow; \n (or EOF) ends the record
        case '\n' => done = true
        case ch => sb.append(ch.toChar); c = br.read()
      }
    }
    cells += sb.toString(); quoted += cellQuoted
    (cells.toArray, quoted.toArray)
  }

  private def readCsv(path: Path, schema: StructType,
                      conf: Configuration): RowReader = {
    val fs = path.getFileSystem(conf)
    val br = new BufferedReader(new InputStreamReader(fs.open(path), StandardCharsets.UTF_8))
    val header = Option(readCsvRecord(br)).map(_._1).getOrElse(Array.empty[String])
    val colIdx = schema.fields.map(f => header.indexOf(f.name))
    colIdx.zip(schema.fields).foreach { case (idx, f) =>
      if (idx < 0) { br.close(); throw new IllegalArgumentException(
        s"column ${f.name} not in csv header ${header.mkString(",")} of $path") }
    }
    new RowReader {
      private var closed = false
      override def close(): Unit = if (!closed) { closed = true; br.close() }
      private var rec = readCsvRecord(br)
      override def hasNext: Boolean = {
        if (rec == null) close()
        rec != null
      }
      private var recNo = 0L
      override def next(): Array[Any] = {
        val (parts, qs) = rec
        recNo += 1
        // a ragged record (foreign/hand-edited chunk) must fail with a
        // diagnosable error, not an ArrayIndexOutOfBounds deep in a task
        if (parts.length < header.length) throw new IllegalArgumentException(
          s"csv record $recNo of $path has ${parts.length} cells, " +
            s"header has ${header.length}")
        val row = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          val f = schema(i)
          val ci = colIdx(i)
          row(i) = parseCsvValue(parts(ci), qs(ci), f.dataType, f.nullable)
          i += 1
        }
        rec = readCsvRecord(br)
        row
      }
    }
  }

  // ------------------------------------------------------------------- orc

  private def orcSchema(schema: StructType): org.apache.orc.TypeDescription = {
    val td = org.apache.orc.TypeDescription.createStruct()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case BooleanType => org.apache.orc.TypeDescription.createBoolean()
        case IntegerType => org.apache.orc.TypeDescription.createInt()
        case LongType => org.apache.orc.TypeDescription.createLong()
        case FloatType => org.apache.orc.TypeDescription.createFloat()
        case DoubleType => org.apache.orc.TypeDescription.createDouble()
        case StringType => org.apache.orc.TypeDescription.createString()
        case DateType => org.apache.orc.TypeDescription.createDate()
        case other => throw new IllegalArgumentException(s"unsupported: $other")
      }
      td.addField(f.name, t)
    }
    td
  }

  private def readOrc(path: Path, schema: StructType,
                      conf: Configuration): RowReader = {
    import org.apache.hadoop.hive.ql.exec.vector._
    val reader = org.apache.orc.OrcFile.createReader(
      path, org.apache.orc.OrcFile.readerOptions(conf))
    // close the file Reader alongside the RecordReader (see readOrcBatches)
    try {
    val fileSchema = reader.getSchema
    val colIdx = schema.fields.map(f => fileSchema.getFieldNames.indexOf(f.name))
    colIdx.zip(schema.fields).foreach { case (i, f) =>
      if (i < 0) throw new IllegalArgumentException(
        s"column ${f.name} not in orc schema of $path")
    }
    val rows = reader.rows()
    val batch = fileSchema.createRowBatch()
    new RowReader {
      private var closed = false
      override def close(): Unit = if (!closed) {
        closed = true
        try rows.close() finally reader.close()
      }
      private var pos = 0
      private var more = rows.nextBatch(batch)
      override def hasNext: Boolean = {
        while (more && pos >= batch.size) { pos = 0; more = rows.nextBatch(batch) }
        if (!more) close()
        more
      }
      override def next(): Array[Any] = {
        val row = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          val cv = batch.cols(colIdx(i))
          val r = if (cv.isRepeating) 0 else pos
          row(i) =
            if (!cv.noNulls && cv.isNull(r)) null
            else schema(i).dataType match {
              case BooleanType => cv.asInstanceOf[LongColumnVector].vector(r) != 0L
              case IntegerType => cv.asInstanceOf[LongColumnVector].vector(r).toInt
              case LongType => cv.asInstanceOf[LongColumnVector].vector(r)
              case FloatType => cv.asInstanceOf[DoubleColumnVector].vector(r).toFloat
              case DoubleType => cv.asInstanceOf[DoubleColumnVector].vector(r)
              case StringType =>
                val b = cv.asInstanceOf[BytesColumnVector]
                new String(b.vector(r), b.start(r), b.length(r), StandardCharsets.UTF_8)
              case DateType => cv.asInstanceOf[LongColumnVector].vector(r).toInt
              case other => throw new IllegalArgumentException(s"unsupported: $other")
            }
          i += 1
        }
        pos += 1
        row
      }
    }
    } catch { case t: Throwable => reader.close(); throw t }
  }

  private class OrcSink(path: Path, schema: StructType, conf: Configuration)
    extends RowSink {
    import org.apache.hadoop.hive.ql.exec.vector._
    private val td = orcSchema(schema)
    private val fs = path.getFileSystem(conf)
    if (fs.exists(path)) fs.delete(path, false)
    private val writer = org.apache.orc.OrcFile.createWriter(
      path, org.apache.orc.OrcFile.writerOptions(conf).setSchema(td))
    private val batch = td.createRowBatch()
    override def write(row: Array[Any]): Unit = {
      val r = batch.size
      var i = 0
      while (i < schema.length) {
        val cv = batch.cols(i)
        if (row(i) == null) { cv.noNulls = false; cv.isNull(r) = true }
        else schema(i).dataType match {
          case BooleanType =>
            cv.asInstanceOf[LongColumnVector].vector(r) =
              if (row(i).asInstanceOf[Boolean]) 1L else 0L
          case IntegerType | DateType =>
            cv.asInstanceOf[LongColumnVector].vector(r) = row(i).asInstanceOf[Int].toLong
          case LongType =>
            cv.asInstanceOf[LongColumnVector].vector(r) = row(i).asInstanceOf[Long]
          case FloatType =>
            cv.asInstanceOf[DoubleColumnVector].vector(r) = row(i).asInstanceOf[Float].toDouble
          case DoubleType =>
            cv.asInstanceOf[DoubleColumnVector].vector(r) = row(i).asInstanceOf[Double]
          case StringType =>
            val b = row(i).asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
            cv.asInstanceOf[BytesColumnVector].setRef(r, b, 0, b.length)
          case other => throw new IllegalArgumentException(s"unsupported: $other")
        }
        i += 1
      }
      batch.size += 1
      if (batch.size == batch.getMaxSize) { writer.addRowBatch(batch); batch.reset() }
    }
    override def close(): Unit = {
      if (batch.size > 0) writer.addRowBatch(batch)
      writer.close()
    }
  }

  // ------------------------------------------------------------- dispatch

  def readRows(path: Path, fileType: String, schema: StructType,
               conf: Configuration): RowReader = fileType match {
    case "parquet" => readParquet(path, schema, conf)
    case "csv" => readCsv(path, schema, conf)
    case "orc" => readOrc(path, schema, conf)
    case other => throw new IllegalArgumentException(
      s"unsupported GraphAr file_type: $other (supported: parquet, csv, orc)")
  }

  def writeRows(path: Path, fileType: String, schema: StructType,
                rows: Iterator[Array[Any]], conf: Configuration): Long = {
    val sink = openSink(path, fileType, schema, conf)
    var n = 0L
    try rows.foreach { r => sink.write(r); n += 1 }
    finally sink.close()
    n
  }
}
