package graft.pipeline

import org.apache.spark.sql.SparkSession

/** dbt `retry` (dbt 1.6): re-execute exactly the nodes the LAST
  * recorded run failed or skipped, under that run's flags — never the
  * successes, never a wider selection. The retry set comes from the
  * run ledger [[ViewStore.saveRunLedger]] writes at the end of every
  * `runNodes()` against a persistent db_path: `ERROR` rows plus the
  * forced skips (`SKIP upstream failed`, `SKIP fail-fast`), which are
  * DAG-closed downstream of the failures by construction. Vars,
  * --full-refresh, --parallel, --fail-fast, build mode, --defer
  * --state and the microbatch window flags re-apply from the ledger so
  * the retried nodes run under the invocation they originally failed
  * in. A retry writes a fresh ledger, so consecutive retries converge
  * to an empty set.
  */
object Retry {

  /** The retry work order: failed/skipped node ids (report order =
    * topo order) and the recorded invocation flags.
    */
  final case class Plan(ids: Seq[String], flags: Map[String, String])

  /** None = no run ever recorded against this db_path; a Plan with
    * empty `ids` = the last run needs nothing retried. Throws NAMED
    * when the config has no persistent db_path (the ledger lives
    * there — an in-memory run has nothing to retry FROM).
    */
  def plan(config: PipelineConfig): Option[Plan] = {
    val db = config.dbPath.getOrElse(throw GenericError(
      "graft retry needs a persistent db_path: the retry set is read " +
        "from the last run's ledger recorded there"))
    ViewStore.loadRunLedger(db).map { case (rows, flags) =>
      val ids = rows.collect {
        case (status, id)
            if status == "ERROR" ||
              status.startsWith("SKIP upstream") ||
              status.startsWith("SKIP fail-fast") => id
      }
      Plan(ids, flags)
    }
  }

  /** A session that re-runs exactly `p.ids` under the recorded flags
    * (exact-name selection — the set is already DAG-closed, so no
    * graph operators are applied).
    */
  def session(spark: SparkSession, config: PipelineConfig,
              p: Plan): PipelineSession = {
    val vars = p.flags.collect {
      case (k, v) if k.startsWith("var:") => k.stripPrefix("var:") -> v }
    new PipelineSession(spark, config,
      parallel = p.flags.get("parallel").contains("true"),
      selectors = p.ids,
      fullRefresh = p.flags.get("full-refresh").contains("true"),
      cliVars = vars,
      failFast = p.flags.get("fail-fast").contains("true"),
      buildMode = p.flags.get("build").contains("true"),
      deferEnabled = p.flags.get("defer").contains("true"),
      stateDir = p.flags.get("state"),
      eventTimeStart = p.flags.get("event-time-start"),
      eventTimeEnd = p.flags.get("event-time-end"))
  }
}
