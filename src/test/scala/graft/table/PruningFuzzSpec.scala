package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._

/** Differential fuzz over the WHOLE pruning stack: random predicates
  * against random adversarial data (nulls, NaNs, pre-epoch dates,
  * supplementary-plane strings, many small files), comparing the filtered
  * scan — manifest prune + partition prune + stats prune + residual — to
  * the UNPRUNED scan filtered by an independent Spark translation of the
  * same predicate. Any divergence is either silent data loss (wrong prune)
  * or a residual bug; the fixture matrix can't cover this input space.
  * Seeded, so failures reproduce.
  *
  * NaN/Infinity LITERALS are excluded (the binder's fold/rewrite semantics
  * are pinned by CoreSpec; replicating them here would duplicate the code
  * under test) — NaN/Inf VALUES in data stay in, exercising NaN-aware
  * bounds and isNaN predicates.
  */
class PruningFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  // default seed 4242 keeps CI deterministic; GRAFT_FUZZ_SEED sweeps
  // fresh input space (failures print the seed via the env, reproducible)
  private val rnd = new scala.util.Random(
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(4242L))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pruning-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-fuzz").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---------------------------------------------------------------- data
  private def randomCodePoint(): Int = rnd.nextInt(5) match {
    case 0 | 1 => 'a' + rnd.nextInt(26)
    case 2 => 0xE000 + rnd.nextInt(64) // BMP just above surrogates
    case 3 => 0x1F600 + rnd.nextInt(64) // supplementary (emoji block)
    case 4 => '0' + rnd.nextInt(10)
  }

  private def randomString(): String = {
    val sb = new java.lang.StringBuilder
    (0 until 1 + rnd.nextInt(6)).foreach(_ => sb.appendCodePoint(randomCodePoint()))
    sb.toString
  }

  private val NRows = 400

  private def fixture: DataFrame = {
    val rows = (0 until NRows).map { k =>
      val i: Integer = if (rnd.nextInt(10) == 0) null else Int.box(rnd.nextInt(101) - 50)
      val d: java.lang.Double =
        if (rnd.nextInt(10) == 0) null
        else if (rnd.nextInt(10) == 0) Double.box(Double.NaN)
        else if (rnd.nextInt(25) == 0) Double.box(Double.PositiveInfinity)
        else Double.box(math.rint((rnd.nextDouble() - 0.5) * 2000) / 10.0)
      val s: String = if (rnd.nextInt(12) == 0) null else randomString()
      val dt: java.sql.Date =
        if (rnd.nextInt(12) == 0) null
        else new java.sql.Date((rnd.nextInt(801) - 400).toLong * 86400000L)
      Row(k.toLong, i, d, s, dt)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("i", IntegerType),
        StructField("d", DoubleType),
        StructField("s", StringType),
        StructField("dt", DateType))))
  }

  // ----------------------------------------------------------- predicates
  /** Literal pools drawn from the value domains, plus out-of-range values
    * so pruning actually fires.
    */
  private def intLit(): Int = rnd.nextInt(4) match {
    case 0 => rnd.nextInt(101) - 50
    case 1 => 60 + rnd.nextInt(40) // above every value
    case 2 => -60 - rnd.nextInt(40) // below every value
    case _ => rnd.nextInt(21) - 10
  }
  private def dblLit(): Double = math.rint((rnd.nextDouble() - 0.5) * 2400) / 10.0
  private def strLit(): String = randomString()
  private def dateLit(): String = {
    val days = rnd.nextInt(1001) - 500
    java.time.LocalDate.ofEpochDay(days.toLong).toString
  }

  private def leaf(): IcePredicate = {
    val colName = Seq("i", "d", "s", "dt")(rnd.nextInt(4))
    def lit(): Any = colName match {
      case "i" => intLit()
      case "d" => dblLit()
      case "s" => strLit()
      case "dt" => dateLit()
    }
    rnd.nextInt(12) match {
      case 0 => P.lt(colName, lit())
      case 1 => P.ltEq(colName, lit())
      case 2 => P.gt(colName, lit())
      case 3 => P.gtEq(colName, lit())
      case 4 => P.equalTo(colName, lit())
      case 5 => P.notEqualTo(colName, lit())
      case 6 => P.in(colName, Seq.fill(1 + rnd.nextInt(3))(lit()))
      case 7 => P.notIn(colName, Seq.fill(1 + rnd.nextInt(3))(lit()))
      case 8 => P.isNull(colName)
      case 9 => P.notNull(colName)
      case 10 if colName == "d" => P.isNaN("d")
      case 10 => P.notNull(colName)
      case 11 if colName == "s" =>
        val s = strLit()
        val cut = 1 + rnd.nextInt(math.max(1, s.codePointCount(0, s.length)))
        val pfx = s.substring(0, s.offsetByCodePoints(0, math.min(cut, s.codePointCount(0, s.length))))
        if (rnd.nextBoolean()) P.startsWith("s", pfx) else P.notStartsWith("s", pfx)
      case 11 => P.gt(colName, lit())
    }
  }

  private def randomPredicate(depth: Int = 0): IcePredicate =
    if (depth >= 2 || rnd.nextInt(2) == 0) leaf()
    else if (rnd.nextBoolean())
      P.and(randomPredicate(depth + 1), randomPredicate(depth + 1))
    else P.or(randomPredicate(depth + 1), randomPredicate(depth + 1))

  /** Independent Spark translation of the predicate — the reference side of
    * the differential. Deliberately written against Spark's public Column
    * API rather than reusing the engine's residual translator.
    */
  private def sparkFilter(p: IcePredicate): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, isnan, lit => slit}
    def litFor(name: String, v: Any): org.apache.spark.sql.Column = name match {
      case "dt" => slit(v.toString).cast(DateType)
      case _ => slit(v)
    }
    p match {
      case AlwaysTrue => slit(true)
      case AlwaysFalse => slit(false)
      case And(l, r) => sparkFilter(l) && sparkFilter(r)
      case Or(l, r) => sparkFilter(l) || sparkFilter(r)
      case Not(c) => !sparkFilter(c)
      case Pred(op, name, lits) =>
        val c = col(name)
        op match {
          case Op.IsNull => c.isNull
          case Op.NotNull => c.isNotNull
          case Op.IsNan => isnan(c)
          case Op.NotNan => !isnan(c)
          case Op.Lt => c < litFor(name, lits.head)
          case Op.LtEq => c <= litFor(name, lits.head)
          case Op.Gt => c > litFor(name, lits.head)
          case Op.GtEq => c >= litFor(name, lits.head)
          case Op.Eq => c === litFor(name, lits.head)
          case Op.NotEq => c =!= litFor(name, lits.head)
          case Op.StartsWith => c.startsWith(lits.head.toString)
          case Op.NotStartsWith => c.isNotNull && !c.startsWith(lits.head.toString)
          case Op.In => lits.map(v => c === litFor(name, v)).reduce(_ || _)
          case Op.NotIn => lits.map(v => c =!= litFor(name, v)).reduce(_ && _)
        }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
  }

  private def matchedKeys(df: DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  private def fuzz(t: IceTable, rounds: Int): Unit = {
    val unpruned = t.scan(spark)
    (0 until rounds).foreach { r =>
      val p = randomPredicate()
      val got = matchedKeys(t.scan(spark, p))
      val want = matchedKeys(unpruned.where(sparkFilter(p)))
      assert(got == want,
        s"round $r: predicate $p diverged — missing=${(want -- got).toSeq.sorted.take(10)} " +
          s"extra=${(got -- want).toSeq.sorted.take(10)} (of want=${want.size}, got=${got.size})")
    }
  }

  test("unpartitioned: 80 random predicates match the unpruned scan exactly") {
    val df = fixture
    val t = IceTable.create(catalog, "fuzz_plain", SchemaConv.fromSpark(df.schema))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    t.append(df)
    assert(t.newScan().planFiles().size > 10, "fuzz needs many small files")
    fuzz(t, 80)
  }

  test("delete fuzz: sequential random deletes keep scans exact, compaction preserves them") {
    val df = fixture
    val t = IceTable.create(catalog, "fuzz_del", SchemaConv.fromSpark(df.schema))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    t.append(df)
    // reference state: the base frame re-read from the table's own files so
    // both sides see identical values, then key sets maintained driver-side
    val base = t.scan(spark).cache()
    var live: Set[Long] = matchedKeys(base)
    assert(live.size == NRows)
    (0 until 10).foreach { r =>
      // conjunctions only: disjunctive trees at this domain size empty the
      // table in a few rounds, leaving nothing for later rounds to compose
      val p = P.and(leaf(), leaf())
      // alternate parquet positional deletes and v3 deletion vectors —
      // both must compose with every prior round's deletes
      if (r % 2 == 0) t.deleteWhere(spark, p) else t.deleteWhereDV(spark, p)
      live = live -- matchedKeys(base.where(sparkFilter(p)))
      assert(matchedKeys(t.scan(spark)) == live, s"round $r: full scan diverged after $p")
      val q = randomPredicate()
      assert(matchedKeys(t.scan(spark, q)) ==
        live.intersect(matchedKeys(base.where(sparkFilter(q)))),
        s"round $r: filtered scan diverged for $q after deleting $p")
    }
    assert(live.nonEmpty && live.size < NRows, "fuzz should delete some but not all rows")
    // compaction rewrites data files and drops the delete files — the live
    // set must be untouched
    t.compact(spark, targetFileCount = 4)
    assert(matchedKeys(t.scan(spark)) == live, "compaction changed the live set")
    base.unpersist()
  }

  test("delete fuzz: strict-match whole-file drops compose with positional deletes") {
    // partition-aligned predicates must-match every file of their partition
    // (identity bounds collapse), so they exercise deleteWhere's
    // metadata-only drop path, interleaved with partial positional/DV
    // rounds. Also regression-pins the GlobalDeletes spec-id fix: delete
    // manifests on a PARTITIONED table used to be written with spec id 0
    // and were unreadable.
    val df = fixture.selectExpr("*", "k % 7 AS pc")
    val schema = SchemaConv.fromSpark(df.schema)
    val t = IceTable.create(catalog, "fuzz_drop", schema,
      PartitionSpec.of(0, ("pc", IdentityTransform, "pc"))(schema))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    t.append(df)
    val base = t.scan(spark).cache()
    var live = matchedKeys(base)
    var metadataOnlyDrops = 0
    (0 until 8).foreach { r =>
      val p =
        if (r % 2 == 0) P.equalTo("pc", Seq(1L, 3L, 5L, 0L)(r / 2))
        else P.and(leaf(), leaf())
      val snap = if (r % 4 < 2) t.deleteWhere(spark, p) else t.deleteWhereDV(spark, p)
      if (r % 2 == 0) snap.foreach { s =>
        // aligned rounds must not write a single delete row
        val lst = ManifestIO.readManifestList(s.manifestList)
        assert(!lst.exists(m => m.content == 1 && m.sequenceNumber == s.sequenceNumber),
          s"round $r: aligned delete $p wrote delete files")
        metadataOnlyDrops += 1
      }
      live = live -- matchedKeys(base.where(sparkFilter(p)))
      assert(matchedKeys(t.scan(spark)) == live, s"round $r: full scan diverged after $p")
      val q = randomPredicate()
      assert(matchedKeys(t.scan(spark, q)) ==
        live.intersect(matchedKeys(base.where(sparkFilter(q)))),
        s"round $r: filtered scan diverged for $q after deleting $p")
    }
    assert(metadataOnlyDrops >= 3, "fuzz must exercise the metadata-only path")
    assert(live.nonEmpty && live.size < NRows)
    t.compact(spark, targetFileCount = 4)
    assert(matchedKeys(t.scan(spark)) == live, "compaction changed the live set")
    base.unpersist()
  }

  test("foreign directory registered via addFiles: 60 random predicates match exactly") {
    // the sf1 table shape: a multi-file spark-written DIRECTORY (no iceberg
    // field ids) registered wholesale, then fuzzed — single-file vs
    // directory handling keeps producing real bugs
    val dir = Files.createTempDirectory("graft-fuzz-dir").toString + "/tbl"
    fixture.repartition(8).write.parquet(dir)
    val t = IceTable.create(catalog, "fuzz_foreign",
      SchemaConv.fromSpark(spark.read.parquet(dir).schema))
    t.addFiles(Seq(dir))
    assert(t.newScan().planFiles().size == 8)
    fuzz(t, 60)
  }

  test("partition evolution: specs change mid-history, 60 random predicates match exactly") {
    // three spec epochs in one table — unpartitioned, bucket(i,4), then
    // truncate(s,2)+month(dt) — so every fuzzed predicate plans manifests
    // under THREE different specs at once: each epoch's files must prune
    // through its own spec's projection and no other's
    val df = fixture
    val schema = SchemaConv.fromSpark(df.schema)
    val t = IceTable.create(catalog, "fuzz_specevo", schema)
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    t.append(df.where("k % 3 = 0"))
    t.refresh()
    t.updateSpec(("i", BucketTransform(4), "i_bucket"))
    t.refresh()
    t.append(df.where("k % 3 = 1"))
    t.refresh()
    t.updateSpec(("s", TruncateTransform(2), "s_trunc"),
      ("dt", MonthTransform, "dt_month"))
    t.refresh()
    t.append(df.where("k % 3 = 2"))
    t.refresh()
    assert(t.metadata.specs.size == 3)
    fuzz(t, 60)
  }

  test("partitioned bucket(i,4) + truncate(s,2): 80 random predicates match exactly") {
    val df = fixture
    val schema = SchemaConv.fromSpark(df.schema)
    val t = IceTable.create(catalog, "fuzz_part", schema,
      PartitionSpec.of(0,
        ("i", BucketTransform(4), "i_bucket"),
        ("s", TruncateTransform(2), "s_trunc"))(schema))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    t.append(df)
    assert(t.newScan().planFiles().size > 10, "fuzz needs many small files")
    fuzz(t, 80)
  }
}
