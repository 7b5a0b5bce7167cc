package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench must never convert an exception into a timing: r9's six
  * silently-broken queries surfaced as plausible 0.06-0.08 s "successes"
  * because the old harness caught everything and timed the failure path.
  * [[Bench.timed]] is the single point every measured run flows through.
  */
final class BenchReportingSpec extends AnyFunSuite {

  test("a deliberately-broken query surfaces as a failure, not a timing") {
    val boom = new RuntimeException("DATATYPE_MISMATCH: deliberately broken")
    Bench.timed(throw boom) match {
      case Left(e) => assert(e eq boom)
      case Right(sec) => fail(s"broken query was reported as a $sec s timing")
    }
  }

  test("a succeeding query yields a positive wall-clock timing") {
    Bench.timed { Thread.sleep(5) } match {
      case Right(sec) => assert(sec >= 0.005)
      case Left(e) => fail(s"unexpected failure: $e")
    }
  }

  test("prevTimings parses the quote-escaped tail of a driver bench artifact") {
    val artifact =
      """{
        |  "n": 9,
        |  "rc": 0,
        |  "sf": 0.1,
        |  "tail": "{\"metric\":\"total\",\"queries\":{\"q1_pricing_summary\":0.5,\"ice_dv_scan\":13.8},\"sf\":\"sf0.1\",\"value\":158.01}"
        |}""".stripMargin
    val prev = Bench.prevTimings(artifact)
    assert(prev == Map("q1_pricing_summary" -> 0.5, "ice_dv_scan" -> 13.8))
  }
}
