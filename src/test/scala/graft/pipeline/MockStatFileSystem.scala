package graft.pipeline

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A local filesystem registered under the `mockstat://` scheme ONLY in a
  * session's hadoopConfiguration — the spec's stand-in for a credentialed
  * object store (an `s3a://` bucket whose client needs `spark.hadoop.*`
  * keys): a plain `new Configuration()` cannot resolve the scheme and
  * throws on stat, while the live session's configuration resolves it the
  * same way the executors will read it.
  */
class MockStatFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockstat:///")
}
