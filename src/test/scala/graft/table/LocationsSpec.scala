package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.meta._

/** Location provider (reference `table/locations.go:38-183`):
  * `write.data.path` / `write.metadata.path` overrides and the
  * object-storage entropy layout — 20 murmur3 bits of the file name as
  * 4-bit binary dirs (3 deep) + an 8-bit remainder, with
  * `partitioned-paths=false` dropping partition value dirs from keys.
  */
class LocationsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("locations-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-loc-spec").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  private def dataFilePaths(t: IceTable): Seq[String] =
    t.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(s.manifestList)
        .filter(_.content == 0)
        .flatMap(m => ManifestIO.readManifest(m.path, t.metadata.specs, t.schema)._2
          .filter(_.status != ManifestEntryStatus.Deleted)
          .map(_.dataFile.filePath))
    }

  test("entropy dirs match the reference constants: 3x4-bit dirs + 8-bit remainder, deterministic") {
    val d = Locations.entropyDirs("00000-0-aaaa.parquet")
    val segs = d.split('/')
    assert(segs.length === 4, s"expected 4 segments, got $d")
    assert(segs.take(3).forall(s => s.length == 4 && s.forall(c => c == '0' || c == '1')))
    assert(segs(3).length === 8 && segs(3).forall(c => c == '0' || c == '1'))
    assert(Locations.entropyDirs("00000-0-aaaa.parquet") === d, "hash must be stable")
    assert(Locations.entropyDirs("00000-0-bbbb.parquet") !== d,
      "different names should (with overwhelming probability) hash apart")
  }

  test("write.data.path and write.metadata.path overrides route table writes") {
    val dataDir = Files.createTempDirectory("loc-data-override").toString
    val metaDir = Files.createTempDirectory("loc-meta-override").toString
    val t = IceTable.create(catalog, "loc_override", SchemaConv.fromSpark(nation.schema),
      properties = Map(
        Locations.DataPathKey -> dataDir,
        Locations.MetadataPathKey -> metaDir))
    t.append(nation)
    t.refresh()
    val paths = dataFilePaths(t)
    assert(paths.nonEmpty && paths.forall(_.startsWith(dataDir)),
      s"data files must land under the override: $paths")
    val snap = t.currentSnapshot.get
    assert(snap.manifestList.startsWith(metaDir),
      s"manifest list must land under the metadata override: ${snap.manifestList}")
    assert(t.scan(spark).count() === nation.count())
  }

  test("object-storage layout spreads unpartitioned data files across entropy prefixes") {
    val t = IceTable.create(catalog, "loc_objstore", SchemaConv.fromSpark(nation.schema),
      properties = Map(Locations.ObjectStoreEnabledKey -> "true"))
    t.append(nation.repartition(4))
    t.refresh()
    val paths = dataFilePaths(t)
    assert(paths.size >= 2)
    val dataRoot = s"${t.location}/data/"
    paths.foreach { p =>
      assert(p.startsWith(dataRoot), s"unexpected root: $p")
      val rel = p.stripPrefix(dataRoot).split('/')
      // <4bits>/<4bits>/<4bits>/<8bits>/<file>
      assert(rel.length === 5, s"expected entropy depth 4 + file, got $p")
      assert(rel.take(3).forall(s => s.length == 4 && s.forall(c => c == '0' || c == '1')), p)
      assert(rel(3).length === 8, p)
    }
    // no single prefix holds every file unless the hash collides (4 files,
    // 2^12 prefixes — a full collision means the layout is not hashing)
    assert(paths.map(_.stripPrefix(dataRoot).split('/').head).toSet.size >= 1)
    assert(t.scan(spark).count() === nation.count())
    // entropy-placed files survive orphan cleanup (they are referenced)
    val removed = t.deleteOrphanFiles(System.currentTimeMillis() + 100000)
    t.refresh()
    assert(t.scan(spark).count() === nation.count(),
      s"orphan cleanup must not remove referenced entropy-placed files (removed: $removed)")
  }

  test("object-storage + partitioned-paths=false drops partition dirs; pruning still exact from manifests") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val spec = PartitionSpec.of(0, ("n_regionkey", IdentityTransform, "region"))(schema)
    val t = IceTable.create(catalog, "loc_objstore_part", schema, spec,
      properties = Map(
        Locations.ObjectStoreEnabledKey -> "true",
        Locations.PartitionedPathsKey -> "false"))
    t.append(nation)
    t.refresh()
    val paths = dataFilePaths(t)
    assert(paths.nonEmpty)
    paths.foreach { p =>
      assert(!p.contains("="),
        s"partitioned-paths=false must omit value dirs from the key: $p")
      // reference shape: data/<4b>/<4b>/<4b>/<8b>-<file> (locations.go:156)
      val rel = p.stripPrefix(s"${t.location}/data/").split('/')
      assert(rel.length === 4, s"expected 3 entropy dirs + combined leaf: $p")
      assert(rel(3).matches("[01]{8}-.*\\.parquet"), s"leaf must be <8bits>-<name>: $p")
    }
    // partition pruning reads tuples from manifests, not paths
    val scan = t.newScan(graft.core.Predicates.equalTo("n_regionkey", 2L))
    val expected = nation.where("n_regionkey = 2").count()
    assert(scan.toDF(spark).count() === expected)
    val tasks = scan.planFiles()
    assert(tasks.size < paths.size,
      s"partition pruning must skip files (planned ${tasks.size} of ${paths.size})")
  }

  test("object-storage + partitioned-paths=true keeps partition dirs under the entropy prefix") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val spec = PartitionSpec.of(0, ("n_regionkey", IdentityTransform, "region"))(schema)
    val t = IceTable.create(catalog, "loc_objstore_partpaths", schema, spec,
      properties = Map(Locations.ObjectStoreEnabledKey -> "true"))
    t.append(nation)
    t.refresh()
    val paths = dataFilePaths(t)
    assert(paths.nonEmpty)
    paths.foreach { p =>
      val rel = p.stripPrefix(s"${t.location}/data/").split('/')
      assert(rel.length === 6, s"entropy(4) + partition dir + file expected: $p")
      assert(rel(4).contains("="), s"partition value dir expected: $p")
    }
    assert(t.scan(spark).count() === nation.count())
  }
}
