package graft.tracking

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The registry's save/load/apply contract (q185; the M5 pyfunc-serving
  * twin): immutable ascending versions, latest-wins resolution, sidecar
  * round-trip, kind-dispatched model-as-function application, and loud
  * failures for unknown names/versions/kinds. */
class ModelRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("reg").toString

  private def w(i: Double, c: Double): org.apache.spark.sql.DataFrame =
    Seq((i, c)).toDF("intercept", "w_x")

  test("register publishes ascending immutable versions; load resolves latest or pinned") {
    val root = freshRoot()
    assert(ModelRegistry.versions(spark, root, "m").isEmpty)
    assert(ModelRegistry.register(spark, root, "m",
      ModelRegistry.KindLinearLogit, w(1.0, 2.0), Map("featmap" -> "x=w_x")) == 1)
    assert(ModelRegistry.register(spark, root, "m",
      ModelRegistry.KindLinearLogit, w(5.0, -1.0), Map("featmap" -> "x=w_x")) == 2)
    assert(ModelRegistry.versions(spark, root, "m") == Seq(1, 2))
    val (v2, kind, params, weights2) = ModelRegistry.load(spark, root, "m")
    assert(v2 == 2 && kind == ModelRegistry.KindLinearLogit &&
      params("featmap") == "x=w_x" && !params.contains("kind"))
    assert(weights2.head.getDouble(0) == 5.0)
    val (v1, _, _, weights1) = ModelRegistry.load(spark, root, "m", Some(1))
    assert(v1 == 1 && weights1.head.getDouble(0) == 1.0)
  }

  test("applyModel is the loaded model as a function, bit-exact vs the direct spelling") {
    val root = freshRoot()
    ModelRegistry.register(spark, root, "m", ModelRegistry.KindLinearLogit,
      w(0.25, -0.5), Map("featmap" -> "x=w_x"))
    val df = Seq((1L, 3.0), (2L, -1.0), (3L, 0.5)).toDF("id", "x")
    val got = ModelRegistry.applyModel(spark, root, "m", df, idCol = "id")
      .orderBy($"id").collect()
    val want = df.select($"id",
        round((lit(0.25) + lit(-0.5) * $"x") * 1e6).cast("long").as("logit_key"))
      .orderBy($"id").collect()
    got.zip(want).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0))
      assert(g.getLong(1) == 1L, "model_version")
      assert(g.getLong(2) == e.getLong(1))
      assert(g.getLong(3) == (if (e.getLong(1) > 0) 1L else 0L))
    }
  }

  test("unknown name, missing version, and unsupported kind fail loudly") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      ModelRegistry.load(spark, root, "ghost")
    }
    ModelRegistry.register(spark, root, "m", "alien_kind", w(0.0, 0.0))
    intercept[IllegalArgumentException] {
      ModelRegistry.load(spark, root, "m", Some(7))
    }
    intercept[IllegalArgumentException] {
      ModelRegistry.applyModel(spark, root, "m",
        Seq((1L, 1.0)).toDF("id", "x"), idCol = "id")
    }
  }

  test("sidecar params reject newlines and '=' in keys; 'kind' is reserved") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      ModelRegistry.register(spark, root, "m", ModelRegistry.KindLinearLogit,
        w(0.0, 0.0), Map("kind" -> "sneaky"))
    }
    intercept[IllegalArgumentException] {
      ModelRegistry.register(spark, root, "m", ModelRegistry.KindLinearLogit,
        w(0.0, 0.0), Map("a=b" -> "v"))
    }
    intercept[IllegalArgumentException] {
      ModelRegistry.register(spark, root, "m", ModelRegistry.KindLinearLogit,
        w(0.0, 0.0), Map("a" -> "line1\nline2"))
    }
  }

  test("a corrupted MLmodel sidecar fails loudly, not with a bare NoSuchElement") {
    // hand-edited/truncated sidecars (ADVICE r7): a missing 'kind' line and
    // a '='-less line must both raise the registry's IllegalArgumentException
    // naming the model/version — not NoSuchElementException or a silent
    // key=rest-of-line parse
    def corrupt(content: String): String = {
      val root = freshRoot()
      ModelRegistry.register(spark, root, "m", ModelRegistry.KindLinearLogit,
        w(1.0, 2.0), Map("featmap" -> "x=w_x"))
      val mf = java.nio.file.Paths.get(root, "m", "v1", "MLmodel")
      java.nio.file.Files.writeString(mf, content)
      // hand-editing invalidates Hadoop LocalFileSystem's sidecar checksum;
      // drop it so the read reaches the parse (the scenario under test)
      java.nio.file.Files.deleteIfExists(mf.resolveSibling(".MLmodel.crc"))
      root
    }
    val noKind = intercept[IllegalArgumentException] {
      ModelRegistry.load(spark, corrupt("featmap=x=w_x\n"), "m")
    }
    assert(noKind.getMessage.contains("kind") && noKind.getMessage.contains("'m' v1"))
    val noEq = intercept[IllegalArgumentException] {
      ModelRegistry.load(spark, corrupt("kind=linear_logit\ngarbageline\n"), "m")
    }
    assert(noEq.getMessage.contains("malformed") && noEq.getMessage.contains("garbageline"))
  }
}
