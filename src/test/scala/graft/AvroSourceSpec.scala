package graft

import java.io.File
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.{Schema, SchemaBuilder}
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigLoader
import graft.sources.AvroSource

/** S5: avro ingestion end-to-end without a spark-avro DataSource —
  * container files written by avro core, decoded by AvroSource, driven
  * through the full bronze→silver pipeline incl. incremental second run.
  */
class AvroSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val avroSchema: Schema = SchemaBuilder.record("reading").fields()
    .requiredLong("rid")
    .requiredInt("temp")
    .optionalString("site")
    .endRecord()

  private def writeAvro(dir: String, name: String,
      rows: Seq[(Long, Int, String)]): Unit = {
    Files.createDirectories(Path.of(dir))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new File(dir, name))
    try rows.foreach { case (rid, temp, site) =>
      val r = new GenericData.Record(avroSchema)
      r.put("rid", rid); r.put("temp", temp); r.put("site", site)
      w.append(r)
    } finally w.close()
  }

  test("schema inference maps avro types; int stays int pre-upcast") {
    val dir = Files.createTempDirectory("graft-avro-inf").toString
    writeAvro(dir, "a.avro", Seq((1L, 20, "x")))
    val st = AvroSource.inferSchema(spark, dir)
    assert(st.fieldNames.toSeq == Seq("rid", "temp", "site"))
    assert(st("rid").dataType.typeName == "long")
    assert(st("temp").dataType.typeName == "integer")
    assert(st("site").dataType.typeName == "string")
  }

  test("batch read decodes records and carries _metadata") {
    val dir = Files.createTempDirectory("graft-avro-batch").toString
    writeAvro(dir, "a.avro", Seq((1L, 20, "x"), (2L, 21, null)))
    val df = AvroSource.read(spark, dir)
    val rows = df.orderBy("rid").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getInt(1) == 20)
    assert(rows(1).isNullAt(2)) // optional string null round-trips
    val meta = rows(0).getStruct(rows(0).fieldIndex("_metadata"))
    assert(meta.getString(0).endsWith("a.avro"))
    assert(meta.getTimestamp(1) != null)
  }

  test("timestamp-millis and timestamp-micros logical types decode correctly") {
    val dir = Files.createTempDirectory("graft-avro-ts").toString
    val ms = org.apache.avro.LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val us = org.apache.avro.LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val sch = Schema.createRecord("ts_rec", null, "g", false,
      java.util.List.of(
        new Schema.Field("rid", Schema.create(Schema.Type.LONG), null, null),
        new Schema.Field("t_ms", ms, null, null),
        new Schema.Field("t_us", us, null, null)))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new File(dir, "ts.avro"))
    try {
      val r = new GenericData.Record(sch)
      val epochMs = 1704067200000L // 2024-01-01T00:00:00Z
      r.put("rid", 1L); r.put("t_ms", epochMs); r.put("t_us", epochMs * 1000)
      w.append(r)
    } finally w.close()
    val row = AvroSource.read(spark, dir).collect().head
    val expect = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
    assert(row.getAs[java.sql.Timestamp]("t_ms") == expect,
      s"millis decoded as ${row.getAs[java.sql.Timestamp]("t_ms")}")
    assert(row.getAs[java.sql.Timestamp]("t_us") == expect)
  }

  test("timestamp-millis inside an array decodes correctly (nested units)") {
    val dir = Files.createTempDirectory("graft-avro-nested").toString
    val ms = org.apache.avro.LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val sch = Schema.createRecord("n_rec", null, "g", false,
      java.util.List.of(
        new Schema.Field("rid", Schema.create(Schema.Type.LONG), null, null),
        new Schema.Field("times", Schema.createArray(ms), null, null)))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new File(dir, "n.avro"))
    try {
      val r = new GenericData.Record(sch)
      r.put("rid", 1L)
      r.put("times", java.util.List.of(
        java.lang.Long.valueOf(1704067200000L))) // 2024-01-01T00:00:00Z ms
      w.append(r)
    } finally w.close()
    val row = AvroSource.read(spark, dir).collect().head
    val ts = row.getAs[Seq[java.sql.Timestamp]]("times").head
    assert(ts == java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z")),
      s"nested millis decoded as $ts")
  }

  test("timestamps beyond the Instant.plusNanos range (year 2262+) decode " +
      "without Long overflow") {
    val dir = Files.createTempDirectory("graft-avro-farts").toString
    val us = org.apache.avro.LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val sch = Schema.createRecord("far_rec", null, "g", false,
      java.util.List.of(
        new Schema.Field("rid", Schema.create(Schema.Type.LONG), null, null),
        new Schema.Field("t", us, null, null)))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new File(dir, "far.avro"))
    try {
      val r = new GenericData.Record(sch)
      // 9999-12-31T23:59:59Z — ×1000 to nanos overflows a Long
      r.put("rid", 1L)
      r.put("t", java.time.Instant.parse("9999-12-31T23:59:59Z")
        .getEpochSecond * 1000000L)
      w.append(r)
      val r2 = new GenericData.Record(sch)
      r2.put("rid", 2L) // pre-1677 side of the old overflow window
      r2.put("t", java.time.Instant.parse("1500-01-01T00:00:00Z")
        .getEpochSecond * 1000000L)
      w.append(r2)
    } finally w.close()
    val rows = AvroSource.read(spark, dir).orderBy("rid").collect()
    assert(rows(0).getAs[java.sql.Timestamp]("t") == java.sql.Timestamp
      .from(java.time.Instant.parse("9999-12-31T23:59:59Z")),
      s"far-future decoded as ${rows(0).getAs[java.sql.Timestamp]("t")}")
    assert(rows(1).getAs[java.sql.Timestamp]("t") == java.sql.Timestamp
      .from(java.time.Instant.parse("1500-01-01T00:00:00Z")))
  }

  test("writer-vs-target type conflict decodes to null, not a " +
      "ClassCastException mid-stream") {
    val dir = Files.createTempDirectory("graft-avro-conflict").toString
    // older file: temp written as STRING
    val oldSch = SchemaBuilder.record("reading").fields()
      .requiredLong("rid")
      .requiredString("temp")
      .optionalString("site")
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](oldSch))
    w.create(oldSch, new File(Files.createDirectories(Path.of(dir)).toString,
      "old.avro"))
    try {
      val r = new GenericData.Record(oldSch)
      r.put("rid", 1L); r.put("temp", "twenty"); r.put("site", "x")
      w.append(r)
    } finally w.close()
    // target pins temp as int (what the newest files say)
    writeAvro(dir, "new.avro", Seq((2L, 21, "y")))
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("temp",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("site",
        org.apache.spark.sql.types.StringType)))
    val rows = AvroSource.read(spark, dir, Some(target))
      .orderBy("rid").collect()
    assert(rows(0).isNullAt(1), "string-written temp must null out")
    assert(rows(0).getString(2) == "x") // compatible columns survive
    assert(rows(1).getInt(1) == 21)
  }

  test("bytes written under a string-inferred target null out, scalars stringify") {
    val dir = Files.createTempDirectory("graft-avro-str").toString
    // older file: site written as BYTES, temp as LONG; newest pins both
    // differently (site string, temp int is incompatible → separate case)
    val oldSch = SchemaBuilder.record("reading").fields()
      .requiredLong("rid")
      .requiredLong("temp")
      .name("site").`type`().bytesType().noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](oldSch))
    w.create(oldSch, new File(Files.createDirectories(Path.of(dir)).toString,
      "old.avro"))
    try {
      val r = new GenericData.Record(oldSch)
      r.put("rid", 1L); r.put("temp", 7L)
      r.put("site", java.nio.ByteBuffer.wrap(Array[Byte](1, 2, 3)))
      w.append(r)
    } finally w.close()
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("temp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("site",
        org.apache.spark.sql.types.StringType)))
    val row = AvroSource.read(spark, dir, Some(target)).collect()(0)
    // a long under a string target has a meaningful string form
    assert(row.getString(1) == "7")
    // bytes under a string target must NOT become JVM debug text
    assert(row.isNullAt(2),
      s"bytes-under-string must null out, got '${row.get(2)}'")
  }

  test("avro enum under a string target decodes to the symbol name") {
    val dir = Files.createTempDirectory("graft-avro-enum").toString
    val sch = SchemaBuilder.record("reading").fields()
      .requiredLong("rid")
      .name("status").`type`().enumeration("Status")
        .symbols("ACTIVE", "RETIRED").noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new File(Files.createDirectories(Path.of(dir)).toString,
      "e.avro"))
    try {
      val r = new GenericData.Record(sch)
      r.put("rid", 1L)
      r.put("status", new GenericData.EnumSymbol(
        sch.getField("status").schema(), "RETIRED"))
      w.append(r)
    } finally w.close()
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.StringType)))
    val row = AvroSource.read(spark, dir, Some(target)).collect()(0)
    assert(row.getString(1) == "RETIRED")
  }

  test("S7 evolution: a new column in a newer avro file widens the table") {
    val src = Files.createTempDirectory("graft-avro-evo").toString
    val store = Files.createTempDirectory("graft-avro-evo-store").toString
    Files.writeString(Path.of(src, "dp_config_template.json"),
      """{"readings": {"raw_file_format": "avro",
        |  "unique_primary_key": ["rid"]}}""".stripMargin)
    writeAvro(s"$src/readings", "b1.avro", Seq((1L, 20, "berlin")))
    val entities = ConfigLoader.load(spark, src)
    val params = config.PipelineParams(sourceLocation = src,
      catalogName = "tavroevo",
      fixedIngestedAt = Some(Timestamp.valueOf("2024-02-01 00:00:00")))
    new pipeline.PipelineRunner(spark, params, store).run(entities)
    assert(!spark.table(params.bronzeFqn("readings"))
      .columns.contains("grade"))

    // second run: a NEWER file carries an extra column
    val evolved = SchemaBuilder.record("reading").fields()
      .requiredLong("rid").requiredInt("temp").optionalString("site")
      .optionalString("grade")
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](evolved))
    w.create(evolved, new File(s"$src/readings", "b2.avro"))
    try {
      val r = new GenericData.Record(evolved)
      r.put("rid", 2L); r.put("temp", 31); r.put("site", "pune")
      r.put("grade", "A")
      w.append(r)
    } finally w.close()
    new pipeline.PipelineRunner(spark, params.copy(
      fixedIngestedAt = Some(Timestamp.valueOf("2024-03-01 00:00:00"))),
      store).run(entities)

    val bronze = spark.table(params.bronzeFqn("readings"))
    assert(bronze.columns.contains("grade"))
    assert(bronze.filter("rid = 1").select("grade").collect().head.isNullAt(0))
    assert(bronze.filter("rid = 2").select("grade")
      .collect().head.getString(0) == "A")
  }

  test("avro entity runs the full pipeline incl. incremental second run") {
    val src = Files.createTempDirectory("graft-avro-src").toString
    val store = Files.createTempDirectory("graft-avro-store").toString
    Files.writeString(Path.of(src, "dp_config_template.json"),
      """{"readings": {"raw_file_format": "avro",
        |  "unique_primary_key": ["rid"]}}""".stripMargin)
    writeAvro(s"$src/readings", "b1.avro",
      Seq((1L, 20, "berlin"), (2L, 25, "lima")))
    val entities = ConfigLoader.load(spark, src)
    val params = config.PipelineParams(sourceLocation = src,
      catalogName = "tavro",
      fixedIngestedAt = Some(Timestamp.valueOf("2024-02-01 00:00:00")))
    new pipeline.PipelineRunner(spark, params, store).run(entities)

    val bronze = spark.table(params.bronzeFqn("readings"))
    assert(bronze.count() == 2)
    // P1 upcast applied to the avro int
    assert(bronze.schema("temp").dataType.typeName == "long")
    // audit columns populated from the fabricated _metadata
    val src0 = bronze.select("_source_file").collect().head.getString(0)
    assert(src0.endsWith("b1.avro"))

    // incremental: second file, rid=2 updated; checkpoint skips b1
    writeAvro(s"$src/readings", "b2.avro", Seq((2L, 30, "lima2")))
    new pipeline.PipelineRunner(spark, params.copy(
      fixedIngestedAt = Some(Timestamp.valueOf("2024-03-01 00:00:00"))),
      store).run(entities)
    assert(spark.table(params.bronzeFqn("readings")).count() == 3)
    val silver = spark.table(params.silverFqn("readings"))
    assert(silver.count() == 2) // deduped on rid, latest wins
    val r2 = silver.filter("rid = 2").collect().head
    assert(r2.getAs[Long]("temp") == 30L)
    assert(r2.getAs[String]("site") == "lima2")
  }
}
