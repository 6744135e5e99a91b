package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.graph.{GraphArGraph, GraphOps}
import graft.sources.graphar.GraphArWriter

/** Property-based CSR offset arithmetic (SURVEY.md §7 risk register:
  * "off-by-ones are the main bug risk"): for random multigraphs written
  * through the GraphAr writer, the offset-table degree fast path, the
  * connector seek path, and a plain edge-scan groupBy must all agree —
  * across part boundaries, empty vertices, and empty parts.
  */
object CsrOffsetProps extends Properties("graft.csr") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(4, 17) // vertex count; chunk size 5 → ragged last part
    m <- Gen.choose(1, 50)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      d <- Gen.choose(0L, n - 1L)
    } yield (s, d))
  } yield edges

  property("offset fast path == seek path == edge-scan degrees") =
    forAll(genEdges) { edges =>
      val s = spark
      import s.implicits._
      val nVerts = 17L
      val dir = Files.createTempDirectory("csr_prop").toString
      GraphArWriter.writeEdges(edges.toDF("src", "dst"), dir,
        GraphArWriter.EdgeSpec("T", "e", "T", srcVertexCount = nVerts,
          dstVertexCount = nVerts, chunkSize = 3, srcChunkSize = 5,
          dstChunkSize = 5, fileType = "parquet"))
      GraphArWriter.writeVertices((0L until nVerts).map(Tuple1(_)).toDF("x"), dir,
        GraphArWriter.VertexSpec("T", nVerts, "parquet"))
      GraphArWriter.writeGraphYaml(dir, "G", Seq("T"), Seq("T_e_T"))
      val g = GraphArGraph(spark, s"$dir/G.yaml")

      val fast = g.degreesFast("T", "e", "T").collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap
      val scan = GraphOps.degrees(g.edgesStd("T", "e", "T")).collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap
      val expected = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap

      // seek path on a couple of vertices incl. guaranteed-empty ones
      val probes = (edges.map(_._1).take(2) ++ Seq(0L, nVerts - 1)).distinct
      val seekOk = probes.forall { v =>
        g.oneHop("T", "e", "T", v).count() == expected.getOrElse(v, 0L)
      }
      val fastOk = fast.filter(_._2 > 0) == expected
      val scanOk = scan == expected
      fastOk && scanOk && seekOk
    }

  private val genPacked: Gen[(List[(Long, Long)], Int)] = for {
    edges <- genEdges
    maxTasks <- Gen.choose(1, 5)
  } yield (edges, maxTasks)

  property("packed write (maxTasks) ≡ unpacked: rows, offsets, seeks") =
    forAll(genPacked) { case (edges, maxTasks) =>
      val s = spark
      import s.implicits._
      val nVerts = 17L
      def write(mt: Option[Int]): String = {
        val dir = Files.createTempDirectory(s"csr_pack").toString
        GraphArWriter.writeEdges(edges.toDF("src", "dst"), dir,
          GraphArWriter.EdgeSpec("T", "e", "T", srcVertexCount = nVerts,
            dstVertexCount = nVerts, chunkSize = 3, srcChunkSize = 5,
            dstChunkSize = 5, maxTasks = mt))
        GraphArWriter.writeVertices((0L until nVerts).map(Tuple1(_)).toDF("x"), dir,
          GraphArWriter.VertexSpec("T", 4, maxTasks = mt))
        GraphArWriter.writeGraphYaml(dir, "G", Seq("T"), Seq("T_e_T"))
        s"$dir/G.yaml"
      }
      val (plain, packed) = (write(None), write(Some(maxTasks)))
      def edgesOf(y: String) = GraphArGraph(spark, y).edgesStd("T", "e", "T")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      def degOf(y: String) = GraphArGraph(spark, y).degreesFast("T", "e", "T")
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      val probe = edges.head._1
      edgesOf(packed) == edgesOf(plain) &&
        degOf(packed) == degOf(plain) &&
        GraphArGraph(spark, packed).oneHop("T", "e", "T", probe).count() ==
          GraphArGraph(spark, plain).oneHop("T", "e", "T", probe).count()
    }
}
