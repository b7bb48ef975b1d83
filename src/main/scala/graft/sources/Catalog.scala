package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog seam for the table-format tier — the interface that stops
  * table resolution being path-only (reference:
  * `01_geofraud_clustering.py:431` / `02_geofraud_fraud.py:18` resolve
  * tables through a metastore, not paths). A catalog maps a dotted
  * table NAME to the location the format readers/writers operate on;
  * everything else (metadata parsing, snapshots, commits) stays in
  * [[Iceberg]] / [[DeltaLogReader]] / the writers, so any catalog
  * implementation — the two shipped here, or a real REST/metastore
  * client a deployment supplies — plugs in without touching them.
  *
  * Scope, stated plainly: this repo has zero egress, so no live REST
  * catalog client ships. [[FileRegistryCatalog]] is the REST stand-in —
  * one document of name→location mappings with swap-on-write updates,
  * the same contract a REST catalog's `GET/POST /v1/tables` surface
  * provides — and [[HadoopWarehouseCatalog]] is Iceberg's real
  * path-convention catalog (`warehouse/namespace/table`). */
trait TableCatalog {
  /** Resolve `name` ("namespace.table") to the table's location.
    * Unknown names REFUSE — a silently-invented path would create
    * tables on typos. */
  def locate(name: String): String

  /** Table names under `namespace`, sorted. */
  def tables(namespace: String): Seq[String]
}

/** A catalog that also accepts registrations (the REST catalog's
  * create/drop surface). */
trait MutableTableCatalog extends TableCatalog {
  def register(name: String, location: String): Unit
  def drop(name: String): Unit
}

object TableCatalog {
  private[sources] def splitName(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    require(i > 0 && i < name.length - 1,
      s"table name '$name' is not namespace.table — catalogs resolve " +
        "dotted names only")
    (name.substring(0, i), name.substring(i + 1))
  }

  /** Read an Iceberg table BY NAME through a catalog. */
  def readIceberg(spark: SparkSession, catalog: TableCatalog,
                  name: String): DataFrame =
    Iceberg.read(spark, catalog.locate(name))

  /** Read a Delta table BY NAME through a catalog. */
  def readDelta(spark: SparkSession, catalog: TableCatalog,
                name: String): DataFrame =
    DeltaLogReader.read(spark, catalog.locate(name))
}

/** Iceberg's HADOOP catalog convention: a table named `ns.tbl` LIVES at
  * `warehouse/ns/tbl`, and existence = a `metadata/` dir with a
  * version hint (the same test `IcebergWriter.commitAppend` uses for
  * table presence). Listing a namespace is one directory listing —
  * planning altitude, no metadata opened. */
class HadoopWarehouseCatalog(spark: SparkSession, warehouse: String)
    extends TableCatalog {
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(location: String): Boolean = {
    val md = new Path(location, "metadata")
    val f = fs(md)
    f.exists(new Path(md, "version-hint.text")) ||
      // Delta tables under the same warehouse resolve too
      f.exists(new Path(location, "_delta_log"))
  }

  override def locate(name: String): String = {
    val loc = locationFor(name)
    require(exists(loc),
      s"catalog has no table '$name' (no Iceberg metadata or Delta log " +
        s"at $loc) — register/create it first")
    loc
  }

  /** The CONVENTION location for `name`, existence not required — where
    * a `CREATE TABLE` under this catalog puts the table. */
  private[sources] def locationFor(name: String): String = {
    val (ns, tbl) = TableCatalog.splitName(name)
    new Path(new Path(warehouse, ns), tbl).toString
  }

  override def tables(namespace: String): Seq[String] = {
    val nsPath = new Path(warehouse, namespace)
    val f = fs(nsPath)
    if (!f.exists(nsPath)) Seq.empty
    else f.listStatus(nsPath).filter(_.isDirectory).map(_.getPath)
      .filter(p => exists(p.toString)).map(_.getName).sorted.toSeq
  }
}

/** The REST-catalog STAND-IN: one JSON registry document of
  * `name → location` mappings, swapped on every mutation (write-temp,
  * delete, rename — the delete-then-rename window is covered by
  * [[load]]'s temp-file fallback, so a reader or a crash in the window
  * recovers the complete NEW document rather than observing an empty
  * catalog). Single-WRITER by contract, like the log writers; a real
  * REST catalog serializes mutations server-side. A deployment swaps
  * this class for a real client without touching the format tier. */
class FileRegistryCatalog(spark: SparkSession, registryPath: String)
    extends MutableTableCatalog {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private def p = new Path(registryPath)
  private def tmpP = new Path(p.getParent, s".${p.getName}.tmp")
  private def f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def load(): Map[String, String] = {
    // the main document, falling back to the temp file a store() left
    // mid-swap (crash or concurrent read in the delete→rename window):
    // the temp is always a COMPLETE newer document, never a partial one
    val src =
      if (f.exists(p)) Some(p)
      else if (f.exists(tmpP)) Some(tmpP)
      else None
    src match {
      case None => Map.empty
      case Some(path) =>
        val st = f.getFileStatus(path)
        val buf = new Array[Byte](st.getLen.toInt)
        val in = f.open(path)
        try in.readFully(buf) finally in.close()
        val node = mapper.readTree(
          new String(buf, java.nio.charset.StandardCharsets.UTF_8))
        val it = node.path("tables").fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
        b.result()
    }
  }

  private def store(m: Map[String, String]): Unit = {
    val obj = mapper.createObjectNode()
    val tbl = obj.putObject("tables")
    m.toSeq.sortBy(_._1).foreach { case (k, v) => tbl.put(k, v) }
    Option(p.getParent).foreach(f.mkdirs)
    val out = f.create(tmpP, true)
    try out.write(mapper.writeValueAsString(obj)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmpP, p), s"registry swap failed: $p")
  }

  override def locate(name: String): String = {
    TableCatalog.splitName(name) // spelling gate, even for lookups
    val m = load()
    m.getOrElse(name, throw new IllegalArgumentException(
      s"catalog has no table '$name' — known: " +
        s"${m.keys.toSeq.sorted.mkString(", ")}"))
  }

  /** DIRECT children only — a table registered as `db.sub.t1` belongs
    * to namespace `db.sub` (splitName's rule), not `db`; matching the
    * [[HadoopWarehouseCatalog]] one-level listing semantics. */
  override def tables(namespace: String): Seq[String] =
    load().keys.toSeq
      .collect { case k if TableCatalog.splitName(k)._1 == namespace =>
        TableCatalog.splitName(k)._2 }
      .sorted

  /** Distinct namespaces of the registered tables, sorted. */
  def namespaces(): Seq[String] =
    load().keys.toSeq.map(k => TableCatalog.splitName(k)._1).distinct.sorted

  override def register(name: String, location: String): Unit = {
    TableCatalog.splitName(name)
    store(load() + (name -> location))
  }

  override def drop(name: String): Unit = {
    val m = load()
    require(m.contains(name),
      s"catalog has no table '$name' to drop")
    store(m - name)
  }
}
