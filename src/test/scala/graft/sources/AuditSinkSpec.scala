package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditSinkSpec extends SparkSpec {

  test("two-phase commit aggregates per-task partials exactly once") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id")).repartition(7)
    df.write.format("graft-audit").option("tag", "t1").mode("append").save()
    val (rows, xor) = AuditSink.committed("t1").get
    assert(rows == 1000)
    assert(xor == (0L until 1000L).reduce(_ ^ _))
    // a second job under a different tag is independent
    Seq(5L, 6L).toDF("id").write.format("graft-audit")
      .option("tag", "t2").mode("append").save()
    assert(AuditSink.committed("t2").contains((2L, 5L ^ 6L)))
    assert(AuditSink.committed("t1").contains((rows, xor)))
  }

  test("rejects frames whose first column is not BIGINT") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq("a").toDF("s").write.format("graft-audit")
        .option("tag", "bad").mode("append").save()
    }
    assert(err.getMessage.contains("BIGINT first column"))
    assert(AuditSink.committed("bad").isEmpty)
  }

  test("requires a tag") {
    val err = intercept[Exception] {
      spark.range(3).write.format("graft-audit").mode("append").save()
    }
    assert(err.getMessage.contains("tag"))
  }
}
