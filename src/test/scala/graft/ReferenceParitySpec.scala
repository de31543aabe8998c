package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.TimePartitioning
import graft.pipeline.Pipeline
import graft.sources.{Sinks, Sources}

/** End-to-end mirrors of the reference's own test configs
  * (the yml files under `src/test/resources/config/`) on same-shaped data:
  * CSV in (typed
  * columns incl. timestamp parse) → hour partitioning with
  * `map_side_partition_split` → formatted output
  * (`embulk_mapred_partitioning_config.yml`), the map-only variant
  * (`embulk_mapred_config.yml`), and the invalid-config rejections.
  */
class ReferenceParitySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // the reference fixture's column shape (sample_1.csv)
  private val schema = StructType(Seq(
    StructField("timestamp", TimestampType), StructField("host", StringType),
    StructField("path", StringType), StructField("method", StringType),
    StructField("code", LongType), StructField("size", LongType),
    StructField("d", DoubleType), StructField("flag", BooleanType)))

  private def writeFixture(rows: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ref_")
    val header = "timestamp,host,path,method,code,size,d,flag"
    java.nio.file.Files.write(dir.resolve("sample_1.csv"),
      (header +: rows).mkString("\n").getBytes)
    dir.toString
  }

  private val goodRows = Seq(
    "2024-03-01 00:10:00,h1,/a,GET,200,100,1.5,true",
    "2024-03-01 00:50:00,h2,/b,GET,200,210,2.5,false",
    "2024-03-01 01:05:00,h1,/c,POST,500,320,0.5,true",
    "2024-03-01 03:59:59,h3,/d,GET,404,430,9.5,false")

  test("embulk_mapred_partitioning_config.yml: csv -> hour partitioning -> csv") {
    val in = writeFixture(goodRows)
    val df = Sources.csv(spark, in,
      StructType(schema.fields :+ StructField("_corrupt_record", StringType)))
      .drop("_corrupt_record")
    val out = java.nio.file.Files.createTempDirectory("graft_refout_").toString
    Sinks.write(df, out, format = "csv",
      bucket = Some(TimePartitioning.bucket($"timestamp", TimePartitioning.Hour)),
      reducers = Some(2), options = Map("header" -> "true"))
    val dirs = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .map(_.getName).sorted
    // hours 00, 01 and 03 of 2024-03-01 → three distinct buckets
    assert(dirs.length === 3)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() === 4)
    // map_side_partition_split=2 semantics: salted agg equals plain agg
    val plain = df.groupBy(TimePartitioning.bucket($"timestamp",
        TimePartitioning.Hour).as("bucket"))
      .agg(count(lit(1)).as("n")).orderBy($"bucket").collect().toSeq
    val salted = TimePartitioning.aggregateByBucketSalted(df,
        TimePartitioning.bucket($"timestamp", TimePartitioning.Hour),
        $"host", split = 2,
        partial = Seq(count(lit(1)).as("pn")),
        finalAggs = Seq(sum($"pn").as("n")))
      .orderBy($"bucket").collect().toSeq
    assert(plain === salted)
  }

  test("embulk_mapred_config.yml: map-only csv load preserves rows and types") {
    val in = writeFixture(goodRows)
    val cfg = Pipeline.Config(inputPath = in, format = "csv",
      transforms = Seq(Pipeline.Where("code = 200"),
        Pipeline.Select(Seq("host", "path", "code"))))
    // csv needs the schema: plan via Sources then transforms by hand
    val df = Sources.csv(spark, in,
      StructType(schema.fields :+ StructField("_corrupt_record", StringType)))
      .drop("_corrupt_record")
      .where("code = 200").select("host", "path", "code")
    assert(df.count() === 2)
    assert(df.schema("code").dataType === LongType)
    assert(cfg.transforms.length === 2) // config parses/holds the same stages
  }

  test("embulk_mapred_invalid_partitioning_config.yml: bad unit rejected") {
    val e = intercept[IllegalArgumentException] {
      TimePartitioning.BucketUnit.of("minute")
    }
    assert(e.getMessage.contains("Supported units are hour and day"))
  }

  test("embulk_mapred_invalid_reducers_config.yml: reducers<=0 rejected") {
    // MapReduceExecutor.java:98-100 hard-errors on a non-positive reducer
    // count when partition: is configured; graft fails the same way at
    // plan time rather than running a silently misconfigured shuffle
    val in = writeFixture(goodRows)
    val cfg = Pipeline.Config(inputPath = in, format = "csv",
      partitioning = Some(Pipeline.Partitioning(
        column = "timestamp", unit = "hour")),
      reducers = Some(0))
    val e = intercept[IllegalArgumentException] {
      Pipeline.plan(spark, cfg)
    }
    assert(e.getMessage.contains(
      "Reducers must be larger than 1 if partition: is set"))
    // without partitioning the same reducer count is ignored, as in the
    // reference (reducers only exist for the partitioned shuffle)
    assert(Pipeline.plan(spark, cfg.copy(partitioning = None)) != null)
  }

  test("unknown partitioning keys and non-UTC timezone rejected loudly") {
    // TimestampPartitioning.java:34-36,128-131: `timezone` is declared,
    // validated, and anything non-UTC throws ConfigException — a silently
    // ignored timezone would hour-bucket every row wrong by the offset
    val base = """{"in": {"path": "/dev/null"}, "partitioning":
      {"column": "ts", "unit": "hour""""
    val tz = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigJson.parse(
        base + """, "timezone": "America/Los_Angeles"}}""")
    }
    assert(tz.getMessage.contains("timezone must be UTC"))
    // explicit UTC is the reference's accepted value
    assert(graft.pipeline.ConfigJson.parse(
      base + """, "timezone": "UTC"}}""").partitioning.isDefined)
    // any unknown key in the partitioning block is a config error, not a
    // silently dropped option (the reference's @Config field set is closed)
    val unk = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigJson.parse(base + """, "granularity": "day"}}""")
    }
    assert(unk.getMessage.contains("unknown partitioning key"))
    assert(unk.getMessage.contains("granularity"))
  }

  test("job_name labels the pipeline's Spark jobs (MapReduceExecutorTask.job_name)") {
    val in = writeFixture(goodRows)
    val prev = spark.sparkContext.getLocalProperty("spark.job.description")
    try {
      Pipeline.plan(spark, graft.pipeline.ConfigJson.parse(
        s"""{"in": {"path": "$in", "format": "csv"},
             "job_name": "graft parity job"}"""))
      assert(spark.sparkContext.getLocalProperty("spark.job.description")
        === "graft parity job")
    } finally spark.sparkContext.setJobDescription(prev)
  }

  test("config passthrough sets runtime conf before planning (MapReduceExecutorTask.config)") {
    val in = writeFixture(goodRows)
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      Pipeline.plan(spark, graft.pipeline.ConfigJson.parse(
        s"""{"in": {"path": "$in", "format": "csv"},
             "config": {"$key": "7"}}"""))
      assert(spark.conf.get(key) === "7")
    } finally spark.conf.set(key, prev)
  }

  test("config_files merge in order, inline config last-wins (MapReduceExecutor.java:207-232)") {
    // the reference folds each file of `config_files` into the job conf
    // in list order, then applies the inline `config` map AFTER — so a
    // key set in two files takes the later file's value and an inline
    // key beats both; a missing file throws ConfigException loudly
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_")
    def writeJson(name: String, body: String): String = {
      val f = dir.resolve(name)
      java.nio.file.Files.writeString(f, body)
      f.toString
    }
    val f1 = writeJson("a.json", """{"k.one": "file1", "k.two": "file1"}""")
    val f2 = writeJson("b.json", """{"k.two": "file2", "k.three": "file2"}""")
    val cfg = graft.pipeline.ConfigJson.parse(
      s"""{"in": {"path": "/dev/null"},
           "config_files": ["$f1", "$f2"],
           "config": {"k.three": "inline"}}""")
    assert(cfg.sparkConf === Map(
      "k.one" -> "file1", "k.two" -> "file2", "k.three" -> "inline"))
    val missing = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigJson.parse(
        s"""{"in": {"path": "/dev/null"},
             "config_files": ["$dir/nope.json"]}""")
    }
    assert(missing.getMessage.contains("does not exist"))
    // a file that isn't a flat string->string object is a config error
    val bad = writeJson("c.json", """["not", "an", "object"]""")
    val shape = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigJson.parse(
        s"""{"in": {"path": "/dev/null"}, "config_files": ["$bad"]}""")
    }
    assert(shape.getMessage.contains("JSON object"))
  }

  test("embulk_mapred_stop_on_invalid_record_config.yml: failfast vs skip") {
    val in = writeFixture(goodRows :+ "not-a-timestamp,h9,/z,GET,xx,yy,zz,notabool")
    val base = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val drop = Sources.csv(spark, in, base, mode = "DROPMALFORMED")
      .drop("_corrupt_record")
    assert(drop.select("host", "code").collect().length === 4)
    val fail = Sources.csv(spark, in, base, mode = "FAILFAST")
    assertThrows[org.apache.spark.SparkException] {
      fail.select("host", "code").collect()
    }
  }
}
