package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SchemaConv
import graft.table.IceTable

/** A zero-egress stand-in for a cloud object store: the local filesystem
  * mounted under its own URI scheme, registered purely through FileIO
  * properties — the same path a real s3a/gs/abfs connector would take.
  * Paths are translated on the way in and statuses copied (with the scheme
  * restored) on the way out.
  */
class GraftIoFs extends org.apache.hadoop.fs.FileSystem {
  import java.net.URI
  import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, FSDataOutputStream, Path}
  import org.apache.hadoop.fs.permission.FsPermission
  import org.apache.hadoop.util.Progressable

  private val local = new org.apache.hadoop.fs.RawLocalFileSystem()
  private def in(p: Path) = new Path(p.toUri.getPath)
  private def out(p: Path) = new Path("graftio", null, p.toUri.getPath)
  private def fix(st: FileStatus): FileStatus = // eager copy: the raw local
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, // status loads
      st.getBlockSize, st.getModificationTime, st.getAccessTime, // permissions
      st.getPermission, st.getOwner, st.getGroup, out(st.getPath)) // lazily

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
  }
  override def getUri: URI = URI.create("graftio:///")
  override def getScheme: String = "graftio"
  override def open(f: Path, b: Int): FSDataInputStream = local.open(in(f), b)
  override def create(f: Path, perm: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    local.create(in(f), perm, overwrite, bufferSize, replication, blockSize, progress)
  override def append(f: Path, b: Int, p: Progressable): FSDataOutputStream =
    local.append(in(f), b, p)
  override def rename(src: Path, dst: Path): Boolean = local.rename(in(src), in(dst))
  override def delete(f: Path, recursive: Boolean): Boolean = local.delete(in(f), recursive)
  override def listStatus(f: Path): Array[FileStatus] = local.listStatus(in(f)).map(fix)
  override def setWorkingDirectory(d: Path): Unit = local.setWorkingDirectory(in(d))
  override def getWorkingDirectory: Path = out(local.getWorkingDirectory)
  override def mkdirs(f: Path, perm: FsPermission): Boolean = local.mkdirs(in(f), perm)
  override def getFileStatus(f: Path): FileStatus = fix(local.getFileStatus(in(f)))
}

/** Object-store configuration seam (reference `io/s3.go:42-135`,
  * `io/gcs.go:34-60`): reference property names translate onto the Hadoop
  * connector keys, and a FileSystem registered via properties carries a
  * whole catalog+table lifecycle.
  */
class FileIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fileio-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("reference property names map onto Hadoop connector keys") {
    val m = FileIO.hadoopSettings(Map(
      "s3.endpoint" -> "http://localhost:9000",
      "s3.access-key-id" -> "ak",
      "s3.secret-access-key" -> "sk",
      "s3.session-token" -> "tok",
      "s3.region" -> "us-east-1",
      "s3.force-virtual-addressing" -> "false",
      "gcs.endpoint" -> "http://localhost:4443",
      "hadoop.fs.custom.impl" -> "x.Y",
      "write.parquet.compression-codec" -> "zstd")) // unrelated → ignored
    assert(m("fs.s3a.endpoint") == "http://localhost:9000")
    assert(m("fs.s3a.access.key") == "ak")
    assert(m("fs.s3a.secret.key") == "sk")
    assert(m("fs.s3a.session.token") == "tok")
    assert(m("fs.s3a.endpoint.region") == "us-east-1")
    // force-virtual-addressing=false ↔ path-style access ON (io/s3.go:130-134)
    assert(m("fs.s3a.path.style.access") == "true")
    assert(m("fs.gs.storage.root.url") == "http://localhost:4443")
    assert(m("fs.custom.impl") == "x.Y")
    assert(!m.exists(_._1.contains("compression")))
  }

  test("configure() applies to the shared metadata-plane configuration") {
    FileIO.configure(Map("s3.endpoint" -> "http://example.test:9000"))
    assert(FileIO.conf.get("fs.s3a.endpoint") == "http://example.test:9000")
    assert(FileIO.sparkHadoopSettings.contains("fs.s3a.endpoint"))
  }

  test("ensureApplied replays captured settings into this JVM's conf") {
    // the executor-side seam: tasks replay the driver's sparkHadoopSettings
    // before resolving a FileSystem (see IceTable.writeDVShards)
    val captured = Map("fs.graft-replay.impl" -> classOf[GraftIoFs].getName)
    assert(FileIO.conf.get("fs.graft-replay.impl") == null)
    FileIO.ensureApplied(captured)
    assert(FileIO.conf.get("fs.graft-replay.impl") == classOf[GraftIoFs].getName)
    assert(FileIO.sparkHadoopSettings.get("fs.graft-replay.impl")
      .contains(classOf[GraftIoFs].getName))
    FileIO.ensureApplied(captured) // idempotent on repeat
    assert(FileIO.conf.get("fs.graft-replay.impl") == classOf[GraftIoFs].getName)
  }

  test("a property-registered scheme carries the full table lifecycle") {
    FileIO.configure(Map("hadoop.fs.graftio.impl" -> classOf[GraftIoFs].getName))
    // the data plane (Spark parquet tasks) reads the SESSION hadoop conf —
    // mirror the same settings, as a real deployment would at startup
    FileIO.sparkHadoopSettings.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    val wh = Files.createTempDirectory("graftio-wh").toString
    val catalog = new FileCatalog(s"graftio:$wh")
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(catalog, "r_io", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(t.scan(spark).count() == region.count())
    // metadata landed under the custom scheme's backing store
    assert(Files.exists(java.nio.file.Paths.get(
      s"$wh/r_io/metadata/v2.metadata.json")))
    val reloaded = IceTable.load(catalog, "r_io")
    assert(reloaded.metadata.location.startsWith("graftio:"))
  }

  /** S3A compatibility proof — RUNNABLE WHEN AVAILABLE. This container ships
    * no cloud connector (needs `hadoop-aws-3.4.2.jar` + the matching
    * `bundle-2.x.jar` AWS SDK on the classpath, versions aligned with
    * hadoop-client 3.4.2); the test self-cancels until a deployment adds
    * them, then verifies the engine's reference-named properties
    * (`s3.endpoint`, `s3.access-key-id`, ... — `io/s3.go:42-50`) configure a
    * real S3AFileSystem instance resolved through the SAME [[FileIO.conf]]
    * seam every metadata-plane component uses. The GraftIoFs lifecycle test
    * above proves the scheme-agnostic plumbing; this pins the s3a key
    * translation onto the genuine connector.
    */
  test("s3a: reference properties configure a real S3AFileSystem (cancels without hadoop-aws)") {
    val s3aPresent =
      try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
      catch { case _: ClassNotFoundException => false }
    assume(s3aPresent,
      "hadoop-aws + aws-sdk bundle jars absent (zero-egress container); " +
        "add hadoop-aws-3.4.2.jar and its matching AWS SDK bundle to run")
    FileIO.configure(Map(
      "s3.endpoint" -> "http://127.0.0.1:9000",
      "s3.access-key-id" -> "graft-test-ak",
      "s3.secret-access-key" -> "graft-test-sk",
      "s3.region" -> "us-east-1",
      "s3.force-virtual-addressing" -> "false"))
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(
      java.net.URI.create("s3a://graft-test-bucket/"), FileIO.conf)
    try {
      assert(fs.getScheme == "s3a")
      val c = fs.getConf
      assert(c.get("fs.s3a.endpoint") == "http://127.0.0.1:9000")
      assert(c.get("fs.s3a.access.key") == "graft-test-ak")
      assert(c.get("fs.s3a.path.style.access") == "true")
    } finally fs.close()
  }
}
