package graft

/** Writes a minimal events parquet file whose `ts` column carries a
  * REAL `TIMESTAMP(isAdjustedToUTC=true, unit=NANOS)` logical
  * annotation. Spark itself cannot write nanos timestamps (the driver's
  * generator can — pyarrow does), so the nanos-branch fixtures go
  * through parquet's example writer: the loader's LongType branch and
  * its footer guard are then exercised against the EXACT footer shape a
  * nanos-written corpus regeneration produces, not a plain-BIGINT
  * stand-in (which the guard must — and now does — reject as drift). */
object NanosParquet {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val schema: MessageType = Types.buildMessage()
    .required(INT64).named("event_id")
    .required(INT64)
    .as(LogicalTypeAnnotation.timestampType(true,
      LogicalTypeAnnotation.TimeUnit.NANOS))
    .named("ts")
    .required(INT64).named("user_id")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
    .required(DOUBLE).named("value")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
    .named("events")

  /** rows: (event_id, ts in NANOS, user_id, event_type, value, props) */
  def writeEvents(file: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withConf(conf).withType(schema).build()
    try {
      val f = new SimpleGroupFactory(schema)
      rows.foreach { case (id, tsNanos, uid, et, v, props) =>
        val g = f.newGroup()
        g.add("event_id", id); g.add("ts", tsNanos); g.add("user_id", uid)
        g.add("event_type", et); g.add("value", v); g.add("props", props)
        writer.write(g)
      }
    } finally writer.close()
  }
}
