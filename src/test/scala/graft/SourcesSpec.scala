package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.Sources

/** Input sources + malformed-record modes (the semi-structured face of the
  * reference's `stop_on_invalid_record`; split planning is Spark's own —
  * `EmbulkInputFormat.java:37` analogue).
  */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("_corrupt_record", StringType)))

  private def write(ext: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_")
    java.nio.file.Files.write(dir.resolve(s"data.$ext"),
      lines.mkString("\n").getBytes)
    dir.toString
  }

  test("jsonl permissive keeps corrupt rows marked; dropmalformed removes") {
    val path = write("json", Seq(
      """{"id": 1, "name": "a"}""", """not json at all""",
      """{"id": 3, "name": "c"}"""))
    // Spark disallows querying only the corrupt-record column on raw
    // files; cache first (the documented pattern)
    val perm = Sources.jsonl(spark, path, schema).cache()
    assert(perm.count() === 3)
    assert(perm.where(perm("_corrupt_record").isNotNull).count() === 1)
    perm.unpersist()
    val drop = Sources.jsonl(spark, path, schema, mode = "DROPMALFORMED")
    assert(drop.count() === 2)
  }

  test("csv with header reads typed columns; malformed row dropped on demand") {
    val path = write("csv", Seq("id,name", "1,a", "not_a_long,b", "3,c"))
    val drop = Sources.csv(spark, path,
      StructType(schema.filter(_.name != "_corrupt_record")),
      mode = "DROPMALFORMED")
    // request the data columns: CSV parses lazily per-column, so a bare
    // count() would never hit the malformed long
    assert(drop.select("id", "name").collect().length === 2)
  }

  test("split-size knob reaches the scan (input task sizing)") {
    Sources.withMaxSplitBytes(spark, 1024 * 1024)
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") === "1048576")
    Sources.withMaxSplitBytes(spark, 128L * 1024 * 1024)
  }

  test("schema-evolution read merges drifted parquet drops by name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_")
    Seq((1L, "a")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/drop1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$dir/drop2")
    val merged = Sources.parquetEvolving(spark, s"$dir/drop*")
    assert(merged.columns.toSet === Set("id", "name", "score"))
    val rows = merged.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[Any]("score")))).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }
}
