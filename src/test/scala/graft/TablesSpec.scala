package graft

import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("events ns->us conversion FLOORS like DuckDB's TIMESTAMP_NS cast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    // -1500 ns = 1969-12-31 23:59:59.9999985: truncation gives -1 us
    // (…999999), DuckDB floors to -2 us (…999998)
    Seq((-1500L, 1L), (1500L, 2L), (-2000L, 3L))
      .toDF("ts", "user_id").write.parquet(s"$dir/events.parquet")
    val rows = Tables.load(spark, dir, "events")
      .orderBy("user_id")
      .selectExpr("unix_micros(ts)").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(-2L, 1L, -2L))
  }
}
