package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** File-level Bloom-filter index — the membership complement of
  * [[DataSkipping]]'s min/max manifest: one Bloom filter per parquet file
  * over a point-lookup column, consulted at planning time so an equality
  * probe reads only the files that MIGHT contain the key. Min/max stats
  * prune range predicates on clustered columns; blooms prune point lookups
  * on high-cardinality columns whose values scatter across files — the
  * Delta `bloomFilterIndex` / Parquet `parquet.bloom.filter.*` mechanism,
  * built from plain parquet.
  *
  * Scale shape (two-phase build): phase 1 folds each scan partition's rows
  * into per-file filters LOCALLY (`mapPartitions`, no row ever leaves its
  * partition un-aggregated); phase 2 shuffles only the serialized filters
  * — O(#partitions-touching-file × filter bytes), never O(rows) — and
  * OR-merges them per file (`mergeInPlace`; Bloom OR is lossless for
  * membership). The capacity is a caller-provided per-file NDV estimate,
  * the same contract as Parquet's `bloom.filter.expected.ndv`: an estimate
  * too low inflates the false-positive rate (weaker pruning) but can NEVER
  * cause a false drop, so planning stays sound.
  *
  * Reference tie-in: the reference's per-user Bloom scoring
  * (`utils/bloom_utils.py:8-11`) keys filters by USER for anomaly probes;
  * this keys them by FILE for I/O pruning — same sketch, storage-tier
  * role. */
object BloomFileIndex {

  /** Per-file Bloom manifest of `path` over column `c` (probed on its
    * string form): one row per parquet file, `(file, bloom)` with the
    * filter serialized to bytes. Single column-pruned scan. */
  def manifest(spark: SparkSession, path: String, c: String,
               expectedPerFile: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    import spark.implicits._
    require(expectedPerFile > 0, "manifest: expectedPerFile must be positive")
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), col(c).cast("string").as("v"))
      .where(col("v").isNotNull) // putString NPEs on null; NULL never equals a probe key
      .as[(String, String)]
      .mapPartitions { it =>
        val perFile = scala.collection.mutable.LinkedHashMap.empty[String, BloomFilter]
        it.foreach { case (file, v) =>
          perFile.getOrElseUpdate(file, BloomFilter.create(expectedPerFile, fpp))
            .putString(v)
        }
        perFile.iterator.map { case (file, bf) =>
          val bos = new ByteArrayOutputStream()
          bf.writeTo(bos)
          (file, bos.toByteArray)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val merged = it.map(t =>
          BloomFilter.readFrom(new ByteArrayInputStream(t._2)))
          .reduceLeft { (a, b) => a.mergeInPlace(b); a }
        val bos = new ByteArrayOutputStream()
        merged.writeTo(bos)
        (file, bos.toByteArray)
      }
      .toDF("file", "bloom")
  }

  /** Point-lookup planning: the files whose filter might contain ANY of
    * `values` — sound by the Bloom contract (false positives read extra
    * files; false negatives are impossible). Driver-side by design: this
    * IS the planning step, O(#files) like [[DataSkipping.prune]]. */
  def prune(man: DataFrame, values: Seq[String],
            maxFiles: Int = 100000): Seq[String] = {
    require(values.nonEmpty, "prune: at least one probe value")
    // lower default cap than the path-only manifests: each row carries the
    // file's serialized Bloom filter (KBs per row, not a path string)
    ManifestGuard.collectCapped(man.select(col("file"), col("bloom")),
      "BloomFileIndex.prune", cap = maxFiles).iterator.flatMap { r =>
      val bf = BloomFilter.readFrom(
        new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      if (values.exists(bf.mightContainString)) Some(r.getString(0)) else None
    }.toSeq.sorted
  }
}
