package graft

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader

import graft.pipeline.Sinks

/** Arrow IPC handoff ([[Sinks.toArrowFile]]): the file a reference-style
  * Python consumer would `pyarrow.ipc.open_file(...)` must round-trip
  * every supported column type, nulls included, across multiple record
  * batches. Read back here with the arrow-vector reader (same wire
  * format pyarrow reads — the IPC file layout is the public contract).
  */
class ArrowSpec extends SparkSpec {

  private def readAll(path: String): (Seq[String], Seq[Seq[Any]]) = {
    val alloc = new RootAllocator()
    val fis = new java.io.FileInputStream(path)
    val reader = new ArrowFileReader(fis.getChannel, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val names = (0 until root.getFieldVectors.size())
        .map(root.getVector(_).getName)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (reader.loadNextBatch()) {
        for (i <- 0 until root.getRowCount)
          rows += names.indices.map { c =>
            val v = root.getVector(c)
            if (v.isNull(i)) null else v.getObject(i)
          }
      }
      (names, rows.toSeq)
    } finally { reader.close(); fis.close(); alloc.close() }
  }

  private def canon(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case t: org.apache.arrow.vector.util.Text => t.toString
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case other => other.toString
  }

  test("toArrowFile round-trips all supported types, nulls, multiple batches") {
    val df = spark.sql("""
      SELECT * FROM VALUES
        (true,  1,    10000000000, CAST(1.5 AS FLOAT), 2.25, CAST('12.3400' AS DECIMAL(18,4)), 'alpha',  CAST('ab' AS BINARY)),
        (false, NULL, 2,           NULL,               NULL, NULL,                              NULL,     NULL),
        (NULL,  3,    NULL,        CAST(-0.5 AS FLOAT), 1e-3, CAST('-7.0001' AS DECIMAL(18,4)), 'émoji✓', CAST('' AS BINARY)),
        (true,  -4,   -9999999999, CAST(0 AS FLOAT),   -2.5, CAST('0.0000' AS DECIMAL(18,4)),  '',       CAST('xyz' AS BINARY))
      AS t(b, i, l, f, d, dec, s, bin)""")
    val expected = df.collect().map(r =>
      (0 until r.length).map(c => canon(if (r.isNullAt(c)) null else r.get(c))))
    val path = java.nio.file.Files.createTempDirectory("arrow_spec")
      .resolve("out.arrow").toString
    // batchRows=3 over 4 rows forces two record batches
    val bytes = Sinks.toArrowFile(df, path, batchRows = 3)
    assert(bytes > 0)
    val (names, rows) = readAll(path)
    assert(names == df.schema.fieldNames.toSeq)
    assert(rows.length == expected.length)
    rows.map(_.map(canon)).zip(expected).foreach { case (got, want) =>
      assert(got == want, s"row drift: $got vs $want")
    }
  }

  test("toArrowFile carries a judged query result (the pandas-handoff shape)") {
    val q = SparkEntry.queries("q02_ref_query")(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("arrow_spec")
      .resolve("q02.arrow").toString
    Sinks.toArrowFile(q, path)
    val (names, rows) = readAll(path)
    assert(names == Seq("o_orderpriority", "n", "avg_price"))
    assert(rows.nonEmpty)
    val spark_rows = q.collect()
    assert(rows.length == spark_rows.length)
    rows.zip(spark_rows).foreach { case (got, want) =>
      assert(got.map(canon) ==
        (0 until want.length).map(c => canon(if (want.isNullAt(c)) null else want.get(c))))
    }
  }

  test("toArrowFile rejects unsupported column types loudly") {
    val df = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts")
    val path = java.nio.file.Files.createTempDirectory("arrow_spec")
      .resolve("bad.arrow").toString
    val e = intercept[IllegalArgumentException](Sinks.toArrowFile(df, path))
    assert(e.getMessage.contains("cast it first"))
  }
}
