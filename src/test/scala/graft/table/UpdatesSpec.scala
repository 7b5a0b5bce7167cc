package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.meta._

/** The typed update surface (reference `table/updates.go:130-560`): every
  * update type applies through one requirement-validated commit, invariants
  * are enforced (duplicate ids, sequence monotonicity, referenced
  * snapshots), and the result survives the catalog round-trip.
  */
class UpdatesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("updates-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-upd").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("schema/spec/sort-order/property updates apply as one commit and round-trip") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val t = IceTable.create(catalog, "upd_all", schema)
    val schema2 = IceSchema(schema.schemaId + 1,
      schema.fields :+ NestedField(schema.highestFieldId + 1, "extra", IceLong))
    val spec2 = PartitionSpec.of(1, ("n_regionkey", IdentityTransform, "rk"))(schema2)
    val order2 = SortOrder(1, Seq(SortField(1, IdentityTransform, true, true)))
    t.commitUpdates(
      Seq(AssertTableUUID(t.metadata.tableUuid), AssertCurrentSchemaID(schema.schemaId)),
      Seq(
        AddSchema(schema2, schema2.highestFieldId), SetCurrentSchema(-1),
        AddPartitionSpec(spec2), SetDefaultSpec(-1),
        AddSortOrder(order2), SetDefaultSortOrder(-1),
        SetProperties(Map("a" -> "1", "b" -> "2")), RemoveProperties(Seq("a")),
        UpgradeFormatVersion(2)))
    val r = IceTable.load(catalog, "upd_all")
    assert(r.schema.findByName("extra").isDefined)
    assert(r.spec.specId == 1 && r.spec.fields.head.name == "rk")
    assert(r.metadata.defaultSortOrderId == 1)
    assert(r.metadata.properties == Map("b" -> "2"))
    assert(r.metadata.formatVersion == 2)
  }

  test("snapshot updates: add, ref, remove-ref, remove; invariants enforced") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val t = IceTable.create(catalog, "upd_snap", schema)
    t.append(nation)
    val live = t.currentSnapshot.get
    // a second, manually-assembled snapshot over the same manifest list
    val snap2 = live.copy(snapshotId = live.snapshotId + 1,
      parentSnapshotId = Some(live.snapshotId),
      sequenceNumber = live.sequenceNumber + 1)
    t.commitUpdates(Seq(AssertRefSnapshotID("main", Some(live.snapshotId))),
      Seq(AddSnapshotUpdate(snap2),
        SetSnapshotRefUpdate("main", snap2.snapshotId, "branch"),
        SetSnapshotRefUpdate("audit", live.snapshotId, "tag")))
    val r = IceTable.load(catalog, "upd_snap")
    assert(r.currentSnapshot.map(_.snapshotId).contains(snap2.snapshotId))
    assert(r.metadata.refs("audit").snapshotId == live.snapshotId)
    assert(r.scan(spark).count() == nation.count()) // same manifest list reads fine

    // duplicate snapshot id and non-monotonic sequence are rejected
    assertThrows[IllegalArgumentException] {
      t.commitUpdates(Nil, Seq(AddSnapshotUpdate(snap2)))
    }
    assertThrows[IllegalArgumentException] {
      t.commitUpdates(Nil, Seq(AddSnapshotUpdate(
        snap2.copy(snapshotId = 999, sequenceNumber = snap2.sequenceNumber))))
    }
    // referenced snapshots cannot be removed; dropping the ref frees them
    assertThrows[IllegalArgumentException] {
      t.commitUpdates(Nil, Seq(RemoveSnapshots(Set(live.snapshotId))))
    }
    t.commitUpdates(Nil,
      Seq(RemoveSnapshotRefUpdate("audit"), RemoveSnapshots(Set(live.snapshotId))))
    assert(IceTable.load(catalog, "upd_snap").metadata.snapshots.map(_.snapshotId)
      == Seq(snap2.snapshotId))
  }

  test("staged create: invisible until commit; two racing creates, one winner") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val a = IceTable.stageCreate(catalog, "staged_race", schema,
      properties = Map("owner" -> "a"))
    val b = IceTable.stageCreate(catalog, "staged_race", schema,
      properties = Map("owner" -> "b"))
    // staged metadata is client-side only — the catalog knows nothing yet
    assert(!catalog.tableExists("staged_race"))
    a.updateProperties(set = Map("stage" -> "tuned"))
    val winner = a.commit()
    // the loser's AssertCreate fails as a commit conflict, not a half-create
    assertThrows[CommitConflictException](b.commit())
    val registered = catalog.load("staged_race")
    assert(registered.tableUuid == winner.metadata.tableUuid)
    assert(registered.properties.get("owner").contains("a"))
    assert(registered.properties.get("stage").contains("tuned"))
    // the winner is a fully usable table
    winner.append(nation)
    assert(winner.scan(spark).count() == nation.count())
  }

  test("requirement violation rejects the update batch before any CAS") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val t = IceTable.create(catalog, "upd_req", schema)
    assertThrows[RequirementFailedException] {
      t.commitUpdates(Seq(AssertCurrentSchemaID(schema.schemaId + 7)),
        Seq(SetProperties(Map("x" -> "y"))))
    }
    assert(IceTable.load(catalog, "upd_req").metadata.properties.get("x").isEmpty)
  }
}
