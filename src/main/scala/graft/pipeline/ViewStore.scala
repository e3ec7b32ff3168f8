package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Cross-run persistence of pipeline materializations — the Spark analog of
  * the reference's views living in the `.duckdb` file (`db_path`,
  * /root/reference/src/node.rs:157-165, src/main.rs:126-132): after a run,
  * a SECOND session over the same db_path sees every model.
  *
  * Spark temp views are session-scoped and the default in-memory catalog
  * forgets saveAsTable entries across JVMs, so parity needs a side store:
  * each view model's rendered SELECT is written to
  * `<dbPath>/_graft_views/<id>.sql` plus an ordered manifest (pipeline topo
  * order — dependencies replay before dependents); table models record a
  * manifest entry only (their parquet already lives in the warehouse) and
  * are re-registered from their warehouse directory on restore. A missing
  * `db_path` is the reference's in-memory mode: nothing persists.
  *
  * Restore is warn-and-skip per entry, so a view over a since-dropped
  * table degrades exactly like a stale view in the reference: visible
  * error on use, no startup crash.
  */
object ViewStore {

  private def storeDir(dbPath: String): Path =
    Paths.get(dbPath).resolve("_graft_views")
  private def manifest(dbPath: String): Path =
    storeDir(dbPath).resolve("manifest.tsv")

  def saveView(dbPath: Option[String], id: String, select: String): Unit =
    dbPath.foreach { db =>
      Files.createDirectories(storeDir(db))
      Files.writeString(storeDir(db).resolve(s"$id.sql"), select)
      appendEntry(db, "view", id)
    }

  def saveTable(dbPath: Option[String], id: String): Unit =
    dbPath.foreach { db =>
      Files.createDirectories(storeDir(db))
      appendEntry(db, "table", id)
    }

  // re-registering a model keeps its original (topo) position so replay
  // order stays dependency-safe; a changed definition just overwrites
  private def appendEntry(dbPath: String, kind: String, id: String): Unit = {
    val m = manifest(dbPath)
    val cur =
      if (Files.exists(m)) Files.readAllLines(m).asScala.toSeq else Seq.empty
    val line = s"$kind\t$id"
    val next = if (cur.exists(_.endsWith(s"\t$id")))
      cur.map(l => if (l.endsWith(s"\t$id")) line else l)
    else cur :+ line
    Files.write(m, next.asJava)
  }

  /** Replay persisted models into `spark` (typically a fresh session over
    * an existing db_path). Returns the number restored.
    */
  def restore(spark: SparkSession, dbPath: String): Int = {
    val m = manifest(dbPath)
    if (!Files.exists(m)) return 0
    var n = 0
    Files.readAllLines(m).asScala.foreach { line =>
      line.split("\t", 2) match {
        case Array("view", id) =>
          try {
            val sql = Files.readString(storeDir(dbPath).resolve(s"$id.sql"))
            spark.sql(sql).createOrReplaceTempView(id)
            n += 1
          } catch { case e: Exception =>
            println(s"WARNING: could not restore view `$id`: ${e.getMessage}")
          }
        case Array("table", id) =>
          try {
            if (!spark.catalog.tableExists(id)) {
              // managed-table data written by saveAsTable lives at
              // <warehouse>/<id>; re-register it as a parquet table
              val wh = spark.conf.get("spark.sql.warehouse.dir")
              val loc = (if (wh.startsWith("file:"))
                Paths.get(new java.net.URI(wh)) else Paths.get(wh)).resolve(id)
              spark.catalog.createTable(id, loc.toString, "parquet")
            }
            n += 1
          } catch { case e: Exception =>
            println(s"WARNING: could not restore table `$id`: ${e.getMessage}")
          }
        case _ => ()
      }
    }
    n
  }
}
