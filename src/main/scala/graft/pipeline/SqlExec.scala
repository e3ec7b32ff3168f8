package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.CommandResult

/** Executes a script statement WITHOUT fetching rows to the driver.
  *
  * A `SELECT * FROM lineitem` line in a script must stream through the
  * executors and be discarded, never materialize driver-side — the
  * reference's execute_batch likewise never fetches rows
  * (/root/reference/src/main.rs:165). Commands (DDL/SET/INSERT) execute
  * eagerly inside `spark.sql` and come back as a CommandResult whose rows
  * are already a tiny local relation, so only genuine queries take the
  * noop-sink path (the noop v2 sink runs the full plan distributed and
  * discards every row at the executor).
  */
object SqlExec {
  def run(spark: SparkSession, st: String): Unit = {
    // scalar CREATE MACRO is a registry operation, not a Spark statement:
    // it was recorded at rewrite time (idempotently re-recorded here for
    // direct callers) and call sites are inlined textually — see
    // DialectShim. Nothing to execute.
    if (DialectShim.registerMacroIfDef(spark, st)) return
    // DuckDB SUMMARIZE runs the native single-pass profiler over the
    // (execution-time-resolved) table — a view created by an EARLIER
    // statement of this same script resolves here, which an up-front
    // rewrite could not do. Rows discarded like any other side statement.
    DialectShim.summarizeTarget(st) match {
      case Some(ident) =>
        val t = spark.table(ident)
        val cols = t.schema.fields
          .filter(f => graft.ext.ProfileOps.supported(f.dataType)).map(_.name)
        val prof =
          if (cols.nonEmpty) graft.ext.ProfileOps.profile(t, cols.toSeq)
          else t // only unprofilable columns: still validate + scan
        prof.write.format("noop").mode("overwrite").save()
        return
      case None => ()
    }
    // DuckDB COPY … TO export: runs the (already-shimmed) source fully
    // distributed into a DataFrameWriter — rows never touch the driver.
    DialectShim.copyToTarget(st) match {
      case Some(c) =>
        val df = c.source match {
          case Left(ident)  => spark.table(ident)
          case Right(query) => spark.sql(query)
        }
        df.write.mode("overwrite").format(c.format).options(c.options).save(c.path)
        return
      case None => ()
    }
    val df = spark.sql(st)
    val isCommand = df.queryExecution.analyzed.isInstanceOf[CommandResult]
    if (!isCommand) df.write.format("noop").mode("overwrite").save()
  }
}
