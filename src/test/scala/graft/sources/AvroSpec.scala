package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro container interop: roundtrip fidelity (values, nulls, column
  * order independence), file shape (real .avro container files, one per
  * partition), and the loud unsupported-type refusal. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("avro").toString
    java.nio.file.Files.delete(java.nio.file.Path.of(d)) // writer wants it absent
    d
  }

  test("write → read roundtrips values and nulls exactly") {
    val dir = freshDir()
    val df = Seq(
      (1L, "a", Some(1.5), true),
      (2L, "b", None, false),
      (3L, "", Some(-0.25), true))
      .toDF("id", "name", "score", "flag")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir, df.schema)
    assert(back.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("reader resolves fields by name — a reordered read schema still lands correctly") {
    val dir = freshDir()
    val df = Seq((7L, "x", 42), (8L, "y", 43)).toDF("id", "name", "n")
    Avro.write(df, dir)
    val reordered = StructType(Seq(
      StructField("n", IntegerType), StructField("id", LongType),
      StructField("name", StringType)))
    val back = Avro.read(spark, dir, reordered)
      .select($"id", $"name", $"n").orderBy($"id").collect().toSeq
    assert(back == df.orderBy($"id").collect().toSeq)
  }

  test("output is real Avro container files, one per partition") {
    val dir = freshDir()
    Avro.write(spark.range(100).select($"id").repartition(3), dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".avro"))
    assert(parts.length == 3)
    // container magic: 'O' 'b' 'j' 1
    val head = java.nio.file.Files.readAllBytes(parts.head.toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)))
    assert(Avro.read(spark, dir,
      StructType(Seq(StructField("id", LongType)))).count() == 100)
  }

  test("unsupported column types refuse loudly at schema build") {
    val e = intercept[IllegalArgumentException] {
      Avro.avroSchema(StructType(Seq(
        StructField("v", ArrayType(FloatType)))))
    }
    assert(e.getMessage.contains("'v'"))
  }
}
