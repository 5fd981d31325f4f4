package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.ingest.Xlsx
import graft.queries.ExtensionQueries67
import graft.sinks.XlsxWrite

/** The DSv2 Excel connector: writer↔reader round trip (incl. XML
  * escaping and sparse nulls), executor-side projection skip, one
  * partition per file, pushed-down pruning visible in the physical
  * plan, schema-merge tolerance, and the q296 integrity identity.
  */
class ExcelDsv2Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def tmpXlsxDir(): String =
    Files.createTempDirectory("graft_xlsx_spec_").toString

  test("writer -> reader round trip: escaping, unicode, sparse nulls") {
    val d = tmpXlsxDir()
    val header = Seq("a", "b<&>\"c", "d")
    val rows = Seq(
      Seq("""<tag attr="x">&amp;</tag>""", "plain", null),
      Seq("", "naïve – 中文 🚀", "3"),
      Seq(null, null, null))
    XlsxWrite.writeXlsx(s"$d/t.xlsx", header, rows)
    val (h, got) = Xlsx.readSheet(s"$d/t.xlsx")
    assert(h == header)
    // empty-string cells read back as None — `read_excel(dtype=str)`
    // parity (empty cell ≡ NaN); omitted cells likewise None
    val expect = rows.map(_.map(v => if (v == "") null else v).padTo(3, null))
    assert(got.map(_.map(_.orNull)) == expect)
  }

  test("deterministic bytes: same rows -> identical file") {
    val d = tmpXlsxDir()
    XlsxWrite.writeXlsx(s"$d/a.xlsx", Seq("x"), Seq(Seq("1"), Seq("2")))
    XlsxWrite.writeXlsx(s"$d/b.xlsx", Seq("x"), Seq(Seq("1"), Seq("2")))
    assert(java.util.Arrays.equals(
      Files.readAllBytes(java.nio.file.Path.of(s"$d/a.xlsx")),
      Files.readAllBytes(java.nio.file.Path.of(s"$d/b.xlsx"))))
  }

  test("projected parse never materializes non-required cells") {
    val d = tmpXlsxDir()
    XlsxWrite.writeXlsx(s"$d/t.xlsx", Seq("keep", "drop"),
      Seq(Seq("k1", "d1"), Seq("k2", "d2")))
    val (h, rows) = Xlsx.readSheetProjected(s"$d/t.xlsx", Some(Set("keep")))
    assert(h == Seq("keep", "drop")) // header always full: it IS the map
    assert(rows.map(_.head) == Seq(Some("k1"), Some("k2")))
    assert(rows.forall(_(1).isEmpty), "pruned column must surface as None")
  }

  test("one input partition per file; file-wise rows union") {
    val df = spark.read.format("graft.sources.excel")
      .load(ExtensionQueries67.excelDir(spark, dir))
    assert(df.rdd.getNumPartitions == 5, "5 lang workbooks -> 5 partitions")
    assert(df.count() == 500)
  }

  test("column pruning reaches the V2 scan (q295 plan readSchema)") {
    val rel = ExtensionQueries67.q295_excel_pruned(spark, dir)
      .queryExecution.optimizedPlan
      .collectFirst { case r: DataSourceV2ScanRelation => r }
    assert(rel.isDefined)
    assert(rel.get.scan.readSchema().fieldNames.toSeq == Seq("n_chars"),
      s"scan must read only n_chars, got ${rel.get.scan.readSchema().fieldNames.toSeq}")
  }

  test("schema-merge tolerance: a file missing a projected column yields nulls") {
    val d = tmpXlsxDir()
    XlsxWrite.writeXlsx(s"$d/full.xlsx", Seq("id", "v"), Seq(Seq("1", "a")))
    XlsxWrite.writeXlsx(s"$d/narrow.xlsx", Seq("id"), Seq(Seq("2")))
    val df = spark.read.format("graft.sources.excel").load(d)
    val got = df.orderBy("id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("1", "a"), ("2", null)))
  }

  test("q296 integrity: every exported row matches its lake twin") {
    val rows = ExtensionQueries67.q296_excel_integrity(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"lang ${r.getString(0)}: ${r.getLong(2)}/${r.getLong(1)} matched"))
    assert(rows.map(_.getLong(1)).sum == 500)
  }
}
