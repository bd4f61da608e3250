package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Writer
import graft.spec._

/** Spec-informed parquet sink hints: per-column dictionary control and
  * the zstd default actually reach the written files. */
class WriterHintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)

  private val table = TableSpec("t", 100000, Seq(
    c("phone", "string", ColumnStrategy.Template("(ddd)-ddd-dddd")),
    c("country", "string", ColumnStrategy.Values(Seq("US", "UK", "DE"))),
    c("dev", "string", ColumnStrategy.Sequence(1, 1)).copy(format = Some("0x%09x")),
    c("plain_seq", "bigint", ColumnStrategy.Sequence(1, 1)),
    c("ts_fine", "timestamp", ColumnStrategy.Timestamp(
      java.time.Instant.parse("2020-01-01T00:00:00Z"),
      java.time.Instant.parse("2020-12-31T23:59:00Z"), 60)),
    c("hidden", "string", ColumnStrategy.Uuid).copy(omit = true)),
    partitions = Some(2))

  test("hint derivation: high-entropy columns only, omitted excluded, zstd default") {
    val hints = Writer.parquetEncodingHints(table)
    assert(hints("compression") === "zstd")
    assert(hints.contains("parquet.enable.dictionary#phone"))
    assert(hints.contains("parquet.enable.dictionary#dev"))
    assert(hints.contains("parquet.enable.dictionary#ts_fine"), "525k-value lattice")
    assert(!hints.contains("parquet.enable.dictionary#country"), "3 distinct values")
    assert(!hints.contains("parquet.enable.dictionary#plain_seq"), "unformatted sequence")
    assert(!hints.contains("parquet.enable.dictionary#hidden"), "omitted column")
  }

  test("written files honor the hints: codec + per-column encodings") {
    val df = graft.engine.Generator.generate(spark, DataGenPlan(Seq(table), 42L))("t")
    val dir = java.nio.file.Files.createTempDirectory("graft_hints").toString
    Writer.writeBatch(df, OutputDataset(dir, options = Writer.parquetEncodingHints(table)))

    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getPath),
      spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val chunks = reader.getFooter.getBlocks.get(0).getColumns.asScala
        .map(cc => cc.getPath.toDotString -> cc).toMap
      def hasDict(col: String): Boolean =
        chunks(col).getEncodings.asScala.exists(_.toString.contains("DICTIONARY"))
      assert(chunks("phone").getCodec.toString === "ZSTD")
      assert(!hasDict("phone"), "template column must skip the dictionary encoder")
      assert(!hasDict("dev"), "formatted sequence must skip the dictionary encoder")
      assert(hasDict("country"), "3-value column must keep its dictionary")
    } finally reader.close()

    // Cleanup.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }
}
