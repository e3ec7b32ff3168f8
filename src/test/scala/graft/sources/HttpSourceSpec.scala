package graft.sources

import java.net.InetSocketAddress
import java.nio.file.{Files, Path => JPath}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The http(s) read path, driven end-to-end against a real HTTP server
  * (JDK built-in, loopback only — the environment has no egress, and the
  * filesystem's behavior is fully exercised by loopback: Range seeks,
  * range-less fallback, 404s, and the dialect shim's
  * `read_parquet('http://…')` — the reference's own example form.
  */
class HttpSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private var docRoot: JPath = _
  @volatile private var honorRange = true
  @volatile private var starTotal = false
  // >0: the next N requests answer 503 (transient-failure injection)
  private val failNext = new java.util.concurrent.atomic.AtomicInteger(0)
  // >0: the next N body sends stop half-way and drop the connection
  private val truncateNext = new java.util.concurrent.atomic.AtomicInteger(0)
  // >0: the next N body sends deliver ZERO bytes then drop (no progress)
  private val emptyNext = new java.util.concurrent.atomic.AtomicInteger(0)

  private def serve(ex: HttpExchange): Unit = {
    if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      ex.sendResponseHeaders(503, -1); ex.close(); return
    }
    val rel = ex.getRequestURI.getPath.stripPrefix("/")
    val f = docRoot.resolve(rel)
    if (!Files.isRegularFile(f)) {
      ex.sendResponseHeaders(404, -1); ex.close(); return
    }
    val bytes = Files.readAllBytes(f)
    val range = Option(ex.getRequestHeaders.getFirst("Range"))
      .filter(_ => honorRange)
      .flatMap { r =>
        // "bytes=a-" or "bytes=a-b"
        val m = "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r)
        m.map { g =>
          val a = g.group(1).toLong
          val b = if (g.group(2).isEmpty) bytes.length - 1L else g.group(2).toLong
          (a, math.min(b, bytes.length - 1L))
        }
      }
    def sendBody(off: Int, n: Int): Unit =
      if (emptyNext.getAndUpdate(k => math.max(0, k - 1)) > 0) {
        // declare n bytes, deliver none, drop: zero-progress failure
        try ex.close() catch { case _: java.io.IOException => }
      } else if (truncateNext.getAndUpdate(k => math.max(0, k - 1)) > 0 && n > 1) {
        // declare n bytes, deliver half, drop the TCP connection: the
        // client sees a premature EOF mid-body
        try ex.getResponseBody.write(bytes, off, n / 2)
        catch { case _: java.io.IOException => }
        try ex.close() catch { case _: java.io.IOException => }
      } else {
        ex.getResponseBody.write(bytes, off, n)
        ex.close()
      }
    range match {
      case Some((a, b)) if a < bytes.length =>
        val n = (b - a + 1).toInt
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $a-$b/${if (starTotal) "*" else bytes.length.toString}")
        ex.sendResponseHeaders(206, n.toLong)
        sendBody(a.toInt, n)
      case _ =>
        ex.sendResponseHeaders(200, bytes.length.toLong)
        sendBody(0, bytes.length)
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    docRoot = Files.createTempDirectory("graft-http-fixtures")
    // a parquet fixture with enough rows that the reader actually seeks
    val df = (1 to 500).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")
    val tmp = Files.createTempDirectory("graft-http-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("t").toString)
    val part = Files.list(tmp.resolve("t")).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, docRoot.resolve("t.parquet"))
    // a csv fixture for the non-splittable text path
    Files.write(docRoot.resolve("t.csv"),
      ("id,name\n" + (1 to 10).map(i => s"$i,row_$i").mkString("\n")).getBytes)
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", serve _)
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("spark.read.parquet over http round-trips rows (Range seeks)") {
    honorRange = true
    val df = spark.read.parquet(s"http://127.0.0.1:$port/t.parquet")
    assert(df.count() == 500)
    val r = df.filter(col("id") === 42L).head
    assert(r.getAs[String]("name") == "name_42")
    assert(r.getAs[Double]("score") == 63.0)
  }

  test("column pruning + predicate pushdown reach the http parquet scan") {
    honorRange = true
    val plan = spark.read.parquet(s"http://127.0.0.1:$port/t.parquet")
      .filter(col("id") > 400L).select("name")
      .queryExecution.executedPlan
      .toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,400)]"),
      s"pushdown missing from:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,name:string>"),
      s"pruning missing from:\n$plan")
  }

  test("a range-less server still reads correctly (skip-forward fallback)") {
    honorRange = false
    try {
      // fresh path name defeats Spark's FileStatus cache from prior tests
      Files.copy(docRoot.resolve("t.parquet"), docRoot.resolve("t2.parquet"))
      val df = spark.read.parquet(s"http://127.0.0.1:$port/t2.parquet")
      assert(df.count() == 500)
      assert(df.agg(sum("id")).head.getLong(0) == 500L * 501 / 2)
    } finally honorRange = true
  }

  test("csv over http works through the same filesystem") {
    val df = spark.read.option("header", "true")
      .csv(s"http://127.0.0.1:$port/t.csv")
    assert(df.count() == 10)
    assert(df.filter(col("id") === "7").head.getAs[String]("name") == "row_7")
  }

  test("Content-Range with unknown total (RFC 'bytes 0-0/*') surfaces as " +
      "IOException, not NumberFormatException") {
    starTotal = true
    try {
      val fs = new HttpFileSystem()
      fs.initialize(new java.net.URI(s"http://127.0.0.1:$port/"),
        spark.sparkContext.hadoopConfiguration)
      val e = intercept[java.io.IOException] {
        fs.getFileStatus(new org.apache.hadoop.fs.Path(
          s"http://127.0.0.1:$port/t.csv"))
      }
      assert(!e.isInstanceOf[java.io.FileNotFoundException])
      assert(e.getMessage.contains("Content-Range"))
    } finally starTotal = false
  }

  test("missing URL fails with a file-not-found analysis error") {
    val e = intercept[Exception] {
      spark.read.parquet(s"http://127.0.0.1:$port/absent.parquet").count()
    }
    assert(e.getMessage.toLowerCase.contains("path does not exist") ||
      e.getMessage.contains("absent.parquet"))
  }

  test("the write path is refused (read-only filesystem)") {
    val e = intercept[Exception] {
      Seq(1).toDF("x").write.mode("overwrite")
        .parquet(s"http://127.0.0.1:$port/out.parquet")
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("read-only"))))
  }

  test("a pipeline MODEL reading read_parquet('http://…') runs end-to-end " +
      "through discovery → shim → materialization") {
    honorRange = true
    graft.functions.GraftExtensions.register(spark)
    val proj = Files.createTempDirectory("graft-http-proj")
    val models = proj.resolve("models"); Files.createDirectories(models)
    Files.writeString(models.resolve("remote_src.sql"),
      s"SELECT * FROM read_parquet('http://127.0.0.1:$port/t.parquet')")
    Files.writeString(models.resolve("remote_agg.sql"),
      "SELECT count() AS n, sum(id) AS s FROM remote_src")
    Files.writeString(proj.resolve("config.yaml"), "models_dir: models\n")
    val config = graft.pipeline.PipelineConfig.load(proj.resolve("config.yaml"))
    val report = new graft.pipeline.PipelineSession(spark, config).runNodes()
    assert(report.errors.isEmpty, report.errors.map(_.render))
    val r = spark.table("remote_agg").head
    assert(r.getAs[Long]("n") == 500L)
    assert(r.getAs[Long]("s") == 500L * 501 / 2)
  }

  test("random seek/read sequences match the local file byte-for-byte — " +
      "with AND without server Range support") {
    val local = Files.readAllBytes(docRoot.resolve("t.parquet"))
    val rnd = new scala.util.Random(42)
    for (ranges <- Seq(true, false)) {
      honorRange = ranges
      try {
        val fs = new HttpFileSystem()
        fs.initialize(new java.net.URI(s"http://127.0.0.1:$port/"),
          spark.sparkContext.hadoopConfiguration)
        val in = fs.open(new org.apache.hadoop.fs.Path(
          s"http://127.0.0.1:$port/t.parquet"), 8 * 1024)
        try {
          for (_ <- 1 to 40) {
            val pos = rnd.nextInt(local.length)
            val n = math.min(1 + rnd.nextInt(4096), local.length - pos)
            val buf = new Array[Byte](n)
            in.seek(pos.toLong)
            in.readFully(buf, 0, n)
            assert(java.util.Arrays.equals(buf,
              java.util.Arrays.copyOfRange(local, pos, pos + n)),
              s"mismatch at pos=$pos n=$n ranges=$ranges")
            assert(in.getPos == pos + n)
          }
          // positioned read (PositionedReadable) leaves getPos untouched
          val buf2 = new Array[Byte](64)
          in.seek(10)
          in.readFully(1000L, buf2, 0, 64)
          assert(java.util.Arrays.equals(buf2,
            java.util.Arrays.copyOfRange(local, 1000, 1064)))
          assert(in.getPos == 10)
        } finally in.close()
      } finally honorRange = true
    }
  }

  private def fsWith(overrides: (String, String)*): HttpFileSystem = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    overrides.foreach { case (k, v) => conf.set(k, v) }
    val fs = new HttpFileSystem()
    fs.initialize(new java.net.URI(s"http://127.0.0.1:$port/"), conf)
    fs
  }

  test("a never-responding server fails within the configured read " +
      "timeout, not never (JDK default is infinite)") {
    // raw socket that accepts connections and then says nothing
    val black = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val hole = new Thread(() =>
      try while (true) black.accept() catch { case _: Exception => })
    hole.setDaemon(true); hole.start()
    try {
      val fs = fsWith(
        HttpFileSystem.NetConf.ReadTimeoutKey -> "300",
        HttpFileSystem.NetConf.ConnectTimeoutKey -> "300",
        HttpFileSystem.NetConf.RetriesKey -> "1",
        HttpFileSystem.NetConf.RetryBackoffKey -> "50")
      val t0 = System.nanoTime()
      val e = intercept[java.io.IOException] {
        fs.getFileStatus(new org.apache.hadoop.fs.Path(
          s"http://127.0.0.1:${black.getLocalPort}/t.csv"))
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(!e.isInstanceOf[java.io.FileNotFoundException])
      // 2 attempts × 300ms read timeout + 50ms backoff + slack
      assert(elapsedMs < 10000L, s"took ${elapsedMs}ms — timeout not applied")
      assert(e.getMessage.contains("attempts"), e.getMessage)
    } finally black.close()
  }

  test("a transiently-failing server (503 once) recovers via bounded retry") {
    failNext.set(1)
    val fs = fsWith()
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"http://127.0.0.1:$port/t.csv"))
    assert(st.getLen == Files.size(docRoot.resolve("t.csv")))
    assert(failNext.get() == 0, "the injected failure was consumed")
  }

  test("a mid-body connection drop reopens at pos instead of silently " +
      "truncating (ADVICE: -1 while pos < len)") {
    honorRange = true
    val local = Files.readAllBytes(docRoot.resolve("t.csv"))
    val fs = fsWith()
    val in = fs.open(new org.apache.hadoop.fs.Path(
      s"http://127.0.0.1:$port/t.csv"), 0) // no buffering: reads hit HttpStream
    try {
      truncateNext.set(1) // first body send stops half-way
      val buf = new Array[Byte](local.length)
      in.readFully(buf, 0, local.length)
      assert(java.util.Arrays.equals(buf, local),
        "recovered read must be byte-identical")
    } finally in.close()
  }

  test("a server that truncates EVERY send still converges to the full, " +
      "byte-identical result (each reconnect makes progress)") {
    honorRange = true
    val local = Files.readAllBytes(docRoot.resolve("t.csv"))
    val fs = fsWith()
    val in = fs.open(new org.apache.hadoop.fs.Path(
      s"http://127.0.0.1:$port/t.csv"), 0)
    try {
      truncateNext.set(1000) // every send stops half-way
      val buf = new Array[Byte](local.length)
      in.readFully(buf, 0, local.length)
      assert(java.util.Arrays.equals(buf, local))
    } finally { truncateNext.set(0); in.close() }
  }

  test("a zero-progress server (declares bytes, delivers none) exhausts " +
      "retries with an IOException, never a short result") {
    honorRange = true
    val fs = fsWith(
      HttpFileSystem.NetConf.RetriesKey -> "2",
      HttpFileSystem.NetConf.RetryBackoffKey -> "10")
    val in = fs.open(new org.apache.hadoop.fs.Path(
      s"http://127.0.0.1:$port/t.csv"), 0)
    try {
      emptyNext.set(1000) // every send delivers nothing
      val len = Files.size(docRoot.resolve("t.csv")).toInt
      val buf = new Array[Byte](len)
      val e = intercept[java.io.IOException] { in.readFully(buf, 0, len) }
      // either the JDK surfaces the drop as an IOException (propagated
      // after the retry budget) or as a clean -1 (our EOFException path)
      assert(e != null)
    } finally { emptyNext.set(0); in.close() }
  }

  test("read_parquet('http://…') through the dialect shim (reference " +
      "examples/basic form)") {
    honorRange = true
    graft.functions.GraftExtensions.register(spark)
    val sql = graft.pipeline.DialectShim.rewrite(
      s"SELECT count(*) AS n, sum(id) AS s FROM " +
        s"read_parquet('http://127.0.0.1:$port/t.parquet')")
    val r = spark.sql(sql).head
    assert(r.getAs[Long]("n") == 500L)
    assert(r.getAs[Long]("s") == 500L * 501 / 2)
  }
}
