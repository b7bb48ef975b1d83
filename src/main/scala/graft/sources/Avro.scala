package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File interop — read/write the PUBLIC Avro format
  * without the spark-avro datasource module (not on this classpath; the
  * core `avro` + `avro-mapred` jars are), via the classic Hadoop
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` pattern.
  *
  * Why it exists: .avro container files are the third interchange format a
  * corpus pipeline gets handed (after parquet and CSV/JSONL, both long
  * covered) — Kafka archive dumps and Hive exports ship as Avro. The
  * reference itself needs no Avro, so this is an S-family breadth
  * operator on the repo's own source/sink shelf (q20 CSV, q46 JSONL,
  * q111 ORC, q152 DSv2, q155 custom sink, q173 XML, q193/q198 Delta).
  *
  * Scale: both directions are ordinary distributed Hadoop-format jobs —
  * one task per file split on read (Avro container blocks are splittable),
  * one output file per partition on write; no driver funnel, records never
  * cross a shuffle as GenericRecords (converted to/from Row inside the
  * map). Type surface kept to the exact primitives the repo's tables use
  * (long, int, double, string, boolean, + nullable variants); anything
  * else fails loudly at schema build, not silently at read. */
object Avro {

  /** Avro record schema mirroring `schema` (nullable fields as
    * `["null", T]` unions — the standard Avro optional spelling). */
  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case other => throw new IllegalArgumentException(
          s"Avro interop supports long/int/double/string/boolean columns; " +
            s"'${f.name}' is $other — cast or drop it first")
      }
      // null default only on the nullable union spelling (Avro validates
      // the default against the field type — non-union fields get none)
      fields = if (f.nullable) {
        val s = Schema.createUnion(
          java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
        fields.name(f.name).`type`(s).withDefault(null)
      } else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  /** Write `df` as Avro container files at `path` (one file per
    * partition, a distributed Hadoop-format job). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val avroJson = avroSchema(sparkSchema).toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))
    df.rdd.mapPartitions { it =>
      // parse per task: avro Schema is not serializable, the JSON is
      val sch = new Schema.Parser().parse(avroJson)
      it.map { row =>
        val rec = new GenericData.Record(sch)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, if (row.isNullAt(i)) null else row.get(i))
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files at `path` into rows of `schema` (fields
    * looked up by NAME — column order need not match the writer's). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions { it =>
        val fields = schema.fields
        var checked = false
        it.map { case (k, _) =>
          val rec = k.datum()
          if (!checked) {
            // GenericRecord.get(name) returns null (not an error) for an
            // unknown field, so a misspelled/renamed column would read as
            // an all-null column — silent wrong aggregates downstream.
            // One check against the first record's writer schema per
            // partition fails fast instead.
            fields.foreach { f =>
              require(rec.getSchema.getField(f.name) != null,
                s"Avro read: requested field '${f.name}' does not exist in the " +
                  s"file's writer schema (${rec.getSchema.getName}) — it would " +
                  "read as all NULL; fix the schema or the field name")
            }
            checked = true
          }
          Row.fromSeq(fields.toIndexedSeq.map { f =>
            rec.get(f.name) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case s: CharSequence if f.dataType == StringType => s.toString
              case v => v
            }
          })
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
