package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Events-schema robustness: the driver has regenerated `events.parquet`
  * with different `ts` physical types across rounds (TIMESTAMP(NANOS) → the
  * nanos-as-long legacy read; TIMESTAMP(MICROS) → a plain timestamp read).
  * `QueryDef.t` must normalize BOTH to the identical frame, so a testdata
  * regeneration can never again silently break the events query family
  * (r9: six queries threw DATATYPE_MISMATCH for a whole round).
  */
class EventsSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("events-schema-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // dir whose events.parquet is the self-generated TIMESTAMP(NANOS) copy
  private def nsDir: String =
    new java.io.File(graft.NanosEventsFixture.path(spark, sfDir)).getParent

  test("QueryDef.t yields the identical frame for nanos-long and µs-timestamp events") {
    val driver = QueryDef.t(spark, sfDir, "events")
    val nanos = QueryDef.t(spark, nsDir, "events")
    // both normalize to session-tz TIMESTAMP — the type q_sessionize's
    // unix_micros and the streaming watermarks require
    assert(driver.schema("ts").dataType == TimestampType)
    assert(nanos.schema("ts").dataType == TimestampType)
    assert(driver.schema.fieldNames.sameElements(nanos.schema.fieldNames))
    val n = driver.count()
    assert(n > 0 && n == nanos.count())
    assert(driver.exceptAll(nanos).isEmpty && nanos.exceptAll(driver).isEmpty)
  }

  test("an events query family member runs identically against both units") {
    val fn = graft.SparkEntry.queries("q_sessionize")
    val a = fn(spark, sfDir)
    val b = fn(spark, nsDir)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
