package graft.pipeline

/** One model = one .sql file (/root/reference/src/node.rs:29-38).
  * Orchestration state is driver-side only — the distributed work is the
  * Spark jobs the rendered SQL plans into.
  *
  * @param id           filename stem; directory ignored (src/session.rs:87-92)
  * @param path         source file path (diagnostics)
  * @param rawSrc       file contents as read
  * @param renderedSrc  after comment-strip + macro render + dialect shim
  * @param prevs        model ids this node reads FROM
  * @param nexts        model ids that read this node
  * @param materialize  None/"view" → temp view; "table" → saved table;
  *                      "incremental" → saved table merged by uniqueKey
  *                      on later runs
  * @param uniqueKey    merge key for `materialize: incremental` — fresh
  *                      rows replace existing rows with the same key;
  *                      absent = append-only
  * @param tests        data tests run against the materialized result
  *                      right after the model executes
  */
final case class ModelNode(
    id: String,
    path: String,
    rawSrc: String,
    renderedSrc: String = "",
    prevs: Set[String] = Set.empty,
    nexts: Set[String] = Set.empty,
    materialize: Option[String] = None,
    uniqueKey: Option[String] = None,
    tests: Seq[ModelTest] = Nil,
    tags: Seq[String] = Nil,
    incrementalStrategy: Option[String] = None,
    partitionBy: Option[String] = None,
    eventTime: Option[String] = None,
    batchSize: Option[String] = None,
    lookback: Option[Int] = None,
    snapshotStrategy: Option[String] = None,
    updatedAt: Option[String] = None,
    onSchemaChange: Option[String] = None,
    preHooks: Seq[String] = Nil,
    postHooks: Seq[String] = Nil,
    freshness: Option[Freshness] = None,
    invalidateHardDeletes: Boolean = false,
    unitTests: Seq[UnitTest] = Nil,
    contract: Boolean = false,
    contractColumns: Seq[ContractColumn] = Nil)
