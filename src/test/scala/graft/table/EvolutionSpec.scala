package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._
import graft.streaming.Ingest

/** Schema evolution (ID-based resolution over old files), partition
  * evolution (mixed-spec planning), and streaming ingest/incremental read.
  */
class EvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("evolution-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-evo").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("schema evolution: add + rename resolve by field ID over old files") {
    val t = IceTable.create(catalog, "nation_evo",
      SchemaConv.fromSpark(nation.schema))
    t.append(nation)
    // add a column, then append data that has it
    t.updateSchema().addColumn("population", IceLong).commit()
    assert(t.schema.findByName("population").exists(_.id == 4))
    val withPop = nation.withColumn("population",
      org.apache.spark.sql.functions.col("n_nationkey").cast("long") * 1000)
    t.append(withPop)
    val all = t.scan(spark)
    assert(all.count() == nation.count() * 2)
    // old files surface null for the added column
    assert(all.where("population IS NULL").count() == nation.count())
    assert(all.where("population IS NOT NULL").count() == nation.count())

    // rename keeps the field ID → old files still serve the column
    t.updateSchema().renameColumn("n_name", "nation_name").commit()
    val renamed = t.scan(spark, selected = Some(Seq("n_nationkey", "nation_name")))
    assert(renamed.where("nation_name IS NOT NULL").count() == nation.count() * 2)

    // old snapshots still read with their pinned schema
    val firstSnap = t.metadata.snapshots.minBy(_.sequenceNumber)
    val old = t.newScan(snapshotId = Some(firstSnap.snapshotId)).toDF(spark)
    assert(old.columns.contains("n_name") && !old.columns.contains("population"))

    // drop hides the column going forward
    t.updateSchema().dropColumn("population").commit()
    assert(!t.scan(spark).columns.contains("population"))
  }

  test("partition evolution: old and new spec manifests plan together") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t = IceTable.create(catalog, "li_specevo", SchemaConv.fromSpark(li.schema))
    t.append(li.where("l_quantity <= 25"))
    t.updateSpec(("l_shipdate", YearTransform, "ship_year"))
    assert(t.spec.specId == 1 && t.spec.fields.head.fieldId == 1000)
    t.append(li.where("l_quantity > 25"))
    assert(t.scan(spark).count() == li.count())
    // the year filter prunes within new-spec files and keeps all old-spec files
    val all = t.newScan().planFiles().size
    val pruned = t.newScan(P.gtEq("l_shipdate", "2001-01-01")).planFiles().size
    assert(pruned < all)
    val cnt = t.scan(spark, P.gtEq("l_shipdate", "2001-01-01")).count()
    assert(cnt == li.where("l_shipdate >= TIMESTAMP '2001-01-01'").count())
  }

  test("strict-metrics delete across partition evolution drops files of both specs") {
    // the metadata-only delete path rewrites manifests PER ORIGIN SPEC; a
    // table that evolved its partitioning has live manifests under several
    // specs, and an aligned delete must drop fully-matched files from all
    // of them without writing a single delete row
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SchemaConv.fromSpark(orders.schema)
    val t = IceTable.create(catalog, "ord_specevo_del", schema,
      PartitionSpec.of(0, ("o_orderstatus", IdentityTransform, "status"))(schema))
    t.append(orders.where("o_orderkey % 2 = 0"))
    t.updateSpec(("o_orderstatus", IdentityTransform, "status"),
      ("o_orderkey", BucketTransform(4), "key_b"))
    t.append(orders.where("o_orderkey % 2 = 1"))
    t.refresh()
    val del = t.deleteWhere(spark, P.equalTo("o_orderstatus", "F")).get
    t.refresh()
    val list = ManifestIO.readManifestList(del.manifestList)
    assert(!list.exists(m => m.content == 1 && m.sequenceNumber == del.sequenceNumber),
      "aligned delete across specs must stay metadata-only")
    val droppedSpecs = list.filter(_.content == 0).flatMap(m =>
      ManifestIO.readManifest(m.path, t.metadata.specs, t.schema)._2
        .filter(e => e.status == ManifestEntryStatus.Deleted &&
          e.snapshotId == del.snapshotId)
        .map(_ => m.specId)).toSet
    assert(droppedSpecs == Set(0, 1),
      s"files of BOTH specs must drop, saw specs $droppedSpecs")
    val want = orders.where("o_orderstatus != 'F'").count()
    assert(t.scan(spark).count() == want)
    assert(t.scan(spark, P.equalTo("o_orderstatus", "O")).count() ==
      orders.where("o_orderstatus = 'O'").count())
    // compaction over the evolved, metadata-deleted table preserves rows
    t.compact(spark, 2)
    assert(t.scan(spark).count() == want)
  }

  test("moveBefore/moveAfter reorder columns; identifier fields are recorded") {
    val t = IceTable.create(catalog, "nation_move", SchemaConv.fromSpark(nation.schema))
    t.append(nation)
    t.updateSchema().moveBefore("n_regionkey", "n_name").commit()
    assert(t.schema.fields.map(_.name).take(3) == Seq("n_nationkey", "n_regionkey", "n_name"))
    t.updateSchema().moveAfter("n_regionkey", "n_name").commit()
    assert(t.schema.fields.map(_.name).take(3) == Seq("n_nationkey", "n_name", "n_regionkey"))
    // reorders are metadata-only: data still reads correctly by field ID
    assert(t.scan(spark).select("n_nationkey", "n_name").count() == nation.count())

    // identifier fields: must exist and be required
    val keyId = t.schema.idByName("n_nationkey")
    val required = t.schema.fields.map(f =>
      if (f.id == keyId) f.copy(required = true) else f)
    t.commitNewSchema(required, t.metadata.lastColumnId)
    t.updateSchema().setIdentifierFields("n_nationkey").commit()
    assert(t.schema.identifierFieldIds == Seq(keyId))
    // round-trips through metadata JSON
    assert(IceTable.load(catalog, "nation_move").schema.identifierFieldIds == Seq(keyId))
    assertThrows[IllegalArgumentException] {
      t.updateSchema().setIdentifierFields("n_name")
    }
  }

  test("column defaults: initial-default fills pre-existing files, write-default fills omitted columns") {
    // defaults are a v3 feature (reference checkSchemaCompatibility)
    val t = IceTable.create(catalog, "nation_defaults", SchemaConv.fromSpark(nation.schema),
      properties = Map("format-version" -> "3"))
    t.append(nation) // written BEFORE the column exists
    t.updateSchema().addColumnWithDefault("quality", IceDouble, 0.5).commit()
    // defaults survive the metadata JSON round-trip
    val reloaded = IceTable.load(catalog, "nation_defaults")
    assert(reloaded.schema.findByName("quality")
      .exists(f => f.initialDefault.contains(0.5) && f.writeDefault.contains(0.5)))
    // append WITHOUT the column → write-default fills it in the file
    t.append(nation)
    // append WITH explicit values
    t.append(nation.withColumn("quality",
      org.apache.spark.sql.functions.lit(0.9)))
    val byVal = t.scan(spark).groupBy("quality").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // first append (pre-column file) reads the initial-default, second the
    // write-default, third its explicit value
    assert(byVal == Map(0.5 -> nation.count() * 2, 0.9 -> nation.count()))
    // filters see the defaulted values (residual applies after the fill)
    assert(t.scan(spark, P.gt("quality", 0.6)).count() == nation.count())
    // the pre/post-column split is decided from manifest stats keys and the
    // hasFieldIds stamp — planning opens zero data-file footers
    val before = ParquetStats.footerReads.get()
    assert(t.scan(spark).groupBy("quality").count().collect().nonEmpty)
    assert(ParquetStats.footerReads.get() == before,
      "plan-time footer sniff detected for a stamped table with defaults")
  }

  test("v3 row lineage: _row_id assigns on append, inherits on scan, survives compaction") {
    val t = IceTable.create(catalog, "nation_lineage",
      SchemaConv.fromSpark(nation.schema),
      properties = Map("format-version" -> "3"))
    t.append(nation.where("n_nationkey < 10")
      .repartition(1).sortWithinPartitions("n_nationkey"))
    t.refresh()
    t.append(nation.where("n_nationkey >= 10")
      .repartition(1).sortWithinPartitions("n_nationkey"))
    t.refresh()
    val n1 = nation.where("n_nationkey < 10").count()
    val total = nation.count()
    def lineage(): Map[String, Long] =
      t.newScan(withRowId = true).toDF(spark)
        .select("n_nationkey", "_row_id").collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val before = lineage()
    // dense, collision-free assignment across both commits
    assert(before.size == total)
    assert(before.values.toSeq.sorted == (0L until total).toSeq)
    // the first commit's rows occupy the first range (snapshot first-row-id)
    assert(nation.where("n_nationkey < 10").collect()
      .forall(r => before(r.get(0).toString) < n1))
    assert(t.metadata.nextRowId.contains(total))
    // time travel reads lineage of the FIRST snapshot alone
    val snap1 = t.metadata.snapshots.head
    assert(snap1.firstRowId.contains(0L))
    val tt = t.newScan(snapshotId = Some(snap1.snapshotId), withRowId = true)
      .toDF(spark).select("_row_id").collect().map(_.getLong(0)).sorted
    assert(tt.toSeq == (0L until n1).toSeq)
    // manifest re-packing BEFORE any data rewrite: the original files have
    // no materialized _row_id column, so the packed Existing entries must
    // carry materialized first_row_ids — an unmaterialized repack would
    // null every _row_id (inheritance is Added-entry-only by design)
    t.rewriteManifests(targetCount = 1)
    t.refresh()
    assert(lineage() == before, "rewriteManifests changed row lineage")
    // COMPACTION: every row changes file and position; lineage must ride
    // along in the materialized _row_id column of the rewritten file
    t.compact(spark, targetFileCount = 1)
    t.refresh()
    assert(lineage() == before, "compaction changed row lineage")
    // and AGAIN through a second rewrite (materialized column round-trips)
    t.compact(spark, targetFileCount = 2)
    t.refresh()
    assert(lineage() == before, "second compaction changed row lineage")
    // plain scans are unaffected by the lineage machinery
    assert(t.scan(spark).columns.toSeq ==
      nation.columns.toSeq, "plain scan must not expose _row_id")
  }

  test("unionByName merges incoming fields: add, promote, reject narrowing") {
    val t = IceTable.create(catalog, "nation_union", SchemaConv.fromSpark(nation.schema))
    t.append(nation)
    val incoming = IceSchema(0, Seq(
      NestedField(1, "n_nationkey", IceLong),   // identical type → untouched
      NestedField(2, "score", IceDouble),       // new column → added optional
      NestedField(3, "n_name", IceString)))     // identical type → untouched
    t.updateSchema().unionByName(incoming).commit()
    val r = IceTable.load(catalog, "nation_union")
    assert(r.schema.findByName("score").exists(f => f.tpe == IceDouble && !f.required))
    // data written before the union still reads; the new column is null
    assert(r.scan(spark).where("score IS NULL").count() == nation.count())
    // appending a frame WITH the merged schema works
    t.append(nation.withColumn("score",
      org.apache.spark.sql.functions.lit(1.5)))
    assert(t.scan(spark).where("score = 1.5").count() == nation.count())
    // narrowing (string → long) is rejected
    assertThrows[IllegalArgumentException] {
      t.updateSchema().unionByName(IceSchema(0, Seq(NestedField(1, "n_name", IceLong))))
    }
  }

  test("adding a nested column mints fresh nested field IDs (no collision with existing columns)") {
    val t = IceTable.create(catalog, "nation_nested",
      SchemaConv.fromSpark(nation.schema))
    val before = t.metadata.lastColumnId
    // incoming struct deliberately carries IDs 1,2 — they collide with the
    // table's existing n_nationkey/n_name; installing them verbatim would
    // make IceSchema.byId silently overwrite and Parquet ID resolution
    // read the wrong column
    val incoming = IceStructType(Seq(
      NestedField(1, "lat", IceDouble),
      NestedField(2, "lon", IceDouble)))
    t.updateSchema()
      .addColumn("geo", incoming)
      .unionByName(IceSchema(0, Seq(
        NestedField(1, "tags", IceListType(2, IceString, elementRequired = false)))))
      .commit()
    val r = IceTable.load(catalog, "nation_nested")
    def idsOf(t: IceType): Seq[Int] = t match {
      case IceStructType(inner) => inner.flatMap(f => f.id +: idsOf(f.tpe))
      case IceListType(eid, e, _) => eid +: idsOf(e)
      case IceMapType(kid, k, vid, v, _) => Seq(kid, vid) ++ idsOf(k) ++ idsOf(v)
      case _ => Nil
    }
    val ids = r.schema.fields.flatMap(f => f.id +: idsOf(f.tpe))
    assert(ids.distinct.size == ids.size, s"duplicate field IDs: $ids")
    assert(ids.forall(id => id <= r.metadata.lastColumnId))
    // the struct's nested fields got ids ABOVE the previous lastColumnId
    val geo = r.schema.findByName("geo").get.tpe.asInstanceOf[IceStructType]
    assert(geo.fields.forall(_.id > before))
  }

  test("makeOptional on a missing column fails instead of silently no-op committing") {
    val t = IceTable.create(catalog, "nation_makeopt",
      SchemaConv.fromSpark(nation.schema))
    assertThrows[IllegalArgumentException] {
      t.updateSchema().makeOptional("n_nationkeyy")
    }
  }

  test("concurrent commits: non-conflicting changes rebase, semantic conflicts fail") {
    val t1 = IceTable.create(catalog, "nation_conc", SchemaConv.fromSpark(nation.schema))
    t1.append(nation)
    // a second stale handle
    val t2 = IceTable.load(catalog, "nation_conc")
    t1.append(nation) // t2 is now one version behind
    // stale schema change still lands: the current schema is unchanged, so
    // the requirement holds and the commit rebases over the append
    t2.updateSchema().addColumn("note", IceString).commit()
    val reloaded = IceTable.load(catalog, "nation_conc")
    assert(reloaded.schema.findByName("note").isDefined)
    assert(reloaded.metadata.snapshots.size == 2)

    // two racing schema changes: the loser fails semantically
    val t3 = IceTable.load(catalog, "nation_conc")
    reloaded.updateSchema().addColumn("a1", IceLong).commit()
    assertThrows[RequirementFailedException] {
      t3.updateSchema().addColumn("a2", IceLong).commit()
    }
    // properties carry no preconditions → always rebase
    t3.updateProperties(set = Map("owner" -> "test"))
    assert(IceTable.load(catalog, "nation_conc").metadata.properties("owner") == "test")
  }

  test("IceTable as a streaming SOURCE: snapshots become batches, checkpoint resumes") {
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(catalog, "region_src", SchemaConv.fromSpark(region.schema))
    t.append(region.where("r_regionkey < 2"))
    val ckpt = Files.createTempDirectory("src-ckpt").toString
    val outDir = Files.createTempDirectory("src-out").toString
    def run(): Unit = {
      val stream = spark.readStream
        .format("graft.streaming.IceTableSourceProvider")
        .option("warehouse", catalog.warehouse)
        .option("table", "region_src")
        .load()
      // parquet sink: supports checkpoint RECOVERY (memory sink does not)
      val q = stream.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    run()
    assert(spark.read.parquet(outDir).count() == region.where("r_regionkey < 2").count())
    t.append(region.where("r_regionkey >= 2"))
    run()
    // same checkpoint → the second run consumed ONLY the new snapshot
    val out = spark.read.parquet(outDir)
    assert(out.count() == region.count())
    assert(out.select("r_regionkey").exceptAll(region.select("r_regionkey")).isEmpty)
  }

  test("streaming exact dedup: state survives micro-batch boundaries, equals batch families") {
    import org.apache.spark.sql.functions.{col, count, lit, md5, min}
    val (res, emitted) = graft.ops.StreamingOps.streamedDedupExact(spark, sfDir)
    // without multiple batches the cross-batch state claim is vacuous
    assert(emitted.count(_ > 0) >= 2,
      s"expected >=2 micro-batches with rows, got $emitted")
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(md5(col("text").cast(org.apache.spark.sql.types.BinaryType)))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == expected, "streamed families diverge from the batch dedup")
    // UPDATE-mode deployment shape: each trigger emits only that batch's
    // CHANGED hashes, never the whole accumulated state. Complete mode
    // would re-emit ~|state| rows per trigger (the final one exactly
    // |families|); with the corpus range-sliced across batches every
    // per-batch emission must stay strictly below the total family count,
    // while all families surface at least once across batches
    assert(emitted.max < expected.size,
      s"a trigger emitted state-sized output: $emitted vs ${expected.size} families")
    assert(emitted.sum >= expected.size,
      s"not every family surfaced: $emitted vs ${expected.size}")
  }

  test("streaming dedup state runs on the RocksDB store — the 100 TB state backend") {
    // the default HDFS-backed store holds state on the JVM heap; a corpus-
    // scale hash-dedup state only fits the RocksDB provider. Same job, same
    // families — proves the operator carries no provider assumptions
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (res, emitted) = graft.ops.StreamingOps.streamedDedupExact(spark, sfDir)
      assert(emitted.count(_ > 0) >= 2)
      import org.apache.spark.sql.functions.{col, count, lit, md5, min}
      val expected = spark.read.parquet(s"$sfDir/documents.parquet")
        .groupBy(md5(col("text").cast(org.apache.spark.sql.types.BinaryType)))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, "RocksDB-backed run diverged from batch families")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sessionize under multi-batch delivery: 3 time-ranged files, maxFilesPerTrigger=1") {
    import org.apache.spark.sql.functions.col
    // self-generated NANOS fixture: this case exercises long-nanos delivery
    // through the streaming sessionizer, which the driver's events.parquet
    // no longer guarantees (its unit varies across regenerations)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(graft.NanosEventsFixture.path(spark, sfDir))
    // strict time-ranged thirds: per-user event order across batches matches
    // global timestamp order, which is what open-session state continuity
    // assumes (files are staged oldest-first via modification times)
    val Array(b1, b2) = ev.stat.approxQuantile("ts", Array(0.34, 0.67), 0.0)
    val srcDir = Files.createTempDirectory("sess-mb")
    def stage(df: org.apache.spark.sql.DataFrame, idx: Int): Unit = {
      val tmp = Files.createTempDirectory(s"sess-part$idx")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get
      val target = srcDir.resolve(f"events-$idx%02d.parquet")
      Files.move(part, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1000000000L + idx * 60000L))
    }
    stage(ev.where(col("ts") <= b1.toLong), 0)
    stage(ev.where(col("ts") > b1.toLong && col("ts") <= b2.toLong), 1)
    stage(ev.where(col("ts") > b2.toLong), 2)

    val stagedSchema = spark.read.parquet(srcDir.resolve("events-00.parquet").toString).schema
    val (res, batches) = graft.ops.StreamingOps.sessionStatsStream(
      spark, srcDir.toString, stagedSchema, "sess_multibatch", filesPerTrigger = Some(1))
    assert(batches >= 3, s"expected >=3 micro-batches, got $batches")

    ev.createOrReplaceTempView("ev_mb")
    val expected = spark.sql("""
      SELECT user_id, CAST(COUNT(DISTINCT session_idx) AS BIGINT) AS n_sessions,
        COUNT(*) AS n_events
      FROM (
        SELECT user_id,
          SUM(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM (
          SELECT user_id, event_id, ts div 1000 AS ts_us,
            lag(ts div 1000) OVER (PARTITION BY user_id ORDER BY ts div 1000, event_id) AS prev
          FROM ev_mb) t1) t2
      GROUP BY user_id""")
    assert(res.exceptAll(expected).isEmpty && expected.exceptAll(res).isEmpty)
  }

  test("IceTable streaming source paces catch-up with max-snapshots-per-trigger") {
    val nation25 = nation
    val t = IceTable.create(catalog, "nation_paced", SchemaConv.fromSpark(nation25.schema))
    t.append(nation25.where("n_nationkey < 5"))
    t.append(nation25.where("n_nationkey >= 5 and n_nationkey < 10"))
    t.append(nation25.where("n_nationkey >= 10 and n_nationkey < 15"))
    val ckpt = Files.createTempDirectory("paced-ckpt").toString
    val outDir = Files.createTempDirectory("paced-out").toString
    def run(expectRows: Long): Int = {
      val stream = spark.readStream.format("graft.streaming.IceTableSourceProvider")
        .option("warehouse", catalog.warehouse).option("table", "nation_paced")
        .option("max-snapshots-per-trigger", "1").load()
      val q = stream.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(Trigger.ProcessingTime(50)).start()
      def sunk(): Long =
        try spark.read.parquet(outDir).count() catch { case _: Exception => 0L }
      val deadline = System.currentTimeMillis() + 60000
      while (sunk() < expectRows && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop(); q.awaitTermination()
      batches
    }
    // three pending snapshots drain as (at least) three paced micro-batches
    assert(run(15) >= 3)
    assert(spark.read.parquet(outDir).count() == 15)
    // restart: the persisted pacing floor resumes after the consumed backlog
    t.append(nation25.where("n_nationkey >= 15 and n_nationkey < 20"))
    t.append(nation25.where("n_nationkey >= 20"))
    assert(run(25) >= 2)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 25) // exactly-once across the restart
    assert(out.select("n_nationkey").exceptAll(nation25.select("n_nationkey")).isEmpty)
  }

  test("IceTable streaming source drains a paced backlog under Trigger.AvailableNow") {
    val cacheBefore = graft.meta.ManifestIO.manifestCacheStats
    val t = IceTable.create(catalog, "nation_availnow", SchemaConv.fromSpark(nation.schema))
    t.append(nation.where("n_nationkey < 8"))
    t.append(nation.where("n_nationkey >= 8 and n_nationkey < 16"))
    t.append(nation.where("n_nationkey >= 16"))
    val ckpt = Files.createTempDirectory("availnow-ckpt").toString
    val stream = spark.readStream.format("graft.streaming.IceTableSourceProvider")
      .option("warehouse", catalog.warehouse).option("table", "nation_availnow")
      .option("max-snapshots-per-trigger", "1").load()
    val q = stream.writeStream.format("memory").queryName("nation_availnow_sink")
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    // the admission-control surface makes AvailableNow drain ALL pending
    // snapshots (no single-batch fallback) and terminate — in paced batches
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    assert(spark.table("nation_availnow_sink").count() == 25)
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected >=3 paced micro-batches, got $batches")
    // the per-micro-batch re-plan must be served by the immutable-manifest
    // cache, not re-decode Avro per trigger: across >=3 paced batches over
    // shared manifests the hit count must move (r16 shipped the cache but
    // never proved the streaming source's planner reaches it)
    val cacheAfter = graft.meta.ManifestIO.manifestCacheStats
    assert(cacheAfter._1 - cacheBefore._1 > 0,
      s"streaming source re-planned ${batches} micro-batches with zero manifest-cache " +
        s"hits (hits ${cacheBefore._1}->${cacheAfter._1}, misses ${cacheBefore._2}->${cacheAfter._2})")
  }

  test("streaming ingest commits one snapshot per micro-batch; incremental read sees only new rows") {
    val src = Files.createTempDirectory("stream-src").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(catalog, "region_stream",
      SchemaConv.fromSpark(region.schema))

    region.where("r_regionkey < 2").write.mode("append").parquet(src)
    val stream1 = spark.readStream.schema(region.schema).parquet(src)
    val q1 = Ingest.appendStream(stream1, t, ckpt, Trigger.AvailableNow())
    q1.awaitTermination(60000)
    t.refresh()
    val snap1 = t.currentSnapshot.get
    assert(t.scan(spark).count() == region.where("r_regionkey < 2").count())

    region.where("r_regionkey >= 2").write.mode("append").parquet(src)
    val stream2 = spark.readStream.schema(region.schema).parquet(src)
    val q2 = Ingest.appendStream(stream2, t, ckpt, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    t.refresh()
    assert(t.scan(spark).count() == region.count())
    assert(t.metadata.snapshots.size >= 2)

    val changes = Ingest.changesSince(spark, t, snap1.snapshotId)
    assert(changes.count() == region.where("r_regionkey >= 2").count())
  }

  test("incremental read over compaction: fresh consumer replays in full, mid-range replace aborts") {
    val nat = nation
    val t = IceTable.create(catalog, "nation_compact_replay",
      SchemaConv.fromSpark(nat.schema))
    t.append(nat.where("n_nationkey < 10"))
    val snap1 = t.refresh().currentSnapshot.get
    t.append(nat.where("n_nationkey >= 10"))
    t.refresh().compact(spark, 1)
    t.refresh()
    // offset-None consumer: a manifest diff from seq 0 would miss every
    // compacted row (they are Existing entries owned by the replace
    // snapshot); the initial batch must be a full scan of the until snapshot
    val replay = Ingest.changesBetween(spark, t, 0L, Long.MaxValue)
    assert(replay.count() == nat.count())
    // a genuine incremental range that spans the replace snapshot cannot be
    // represented as pure appends → abort, not partial data
    val ex = intercept[IllegalStateException] {
      Ingest.changesSince(spark, t, snap1.snapshotId).count()
    }
    assert(ex.getMessage.contains("replace"))
  }
}
