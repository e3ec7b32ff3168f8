package graft.pipeline

/** Error taxonomy mirroring the reference's three variants
  * (/root/reference/src/errors.rs:1-10, Display impl src/main.rs:51-61).
  */
sealed trait GraftError extends Exception {
  def render: String
}

final case class GenericError(msg: String) extends GraftError {
  override def getMessage: String = msg
  def render: String = s"Error: $msg"
}

/** A statement failed inside the engine; carries the offending SQL and the
  * model file it came from (src/node.rs:198-202).
  */
final case class StatementExecutionError(msg: String, sql: String, path: String)
    extends GraftError {
  override def getMessage: String = msg
  def render: String =
    s"""Error when executing statement. $msg
       |
       |Offending statement:
       |
       |$sql
       |(found in $path)""".stripMargin
}

final case class UnknownModelType(ext: String) extends GraftError {
  override def getMessage: String = s"Unknown model type: $ext"
  def render: String = s"Error: unknown model type `$ext`"
}
