package graft.data

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Source health surface: probe ladder healthy → degraded →
  * unreachable with consecutive-failure escalation and reset on
  * recovery (reference HealthStatus,
  * /root/reference/packages/core/spheraform_core/models/geoserver.py:36-114).
  */
class SourceHealthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("healthy probe records rows and resets failures") {
    val state = SparkTestSession.tmpDir("graft_health1")
    val r = SourceHealth.probe(spark, "gen:50", state, nowMs = 1000L)
    assert(r.status == "healthy" && r.rows == 50 &&
      r.consecutiveFailures == 0 && r.lastSuccessMs == 1000L)
    // persisted and readable back
    assert(SourceHealth.read(spark, "gen:50", state).contains(r))
  }

  test("failures escalate degraded → unreachable; recovery resets") {
    val state = SparkTestSession.tmpDir("graft_health2")
    val missing = s"${SparkTestSession.tmpDir("graft_health_missing")}/nope"
    val r1 = SourceHealth.probe(spark, missing, state, nowMs = 1L)
    assert(r1.status == "degraded" && r1.consecutiveFailures == 1 &&
      r1.message.nonEmpty)
    val r2 = SourceHealth.probe(spark, missing, state, nowMs = 2L)
    assert(r2.status == "degraded" && r2.consecutiveFailures == 2)
    val r3 = SourceHealth.probe(spark, missing, state, nowMs = 3L)
    assert(r3.status == "unreachable" && r3.consecutiveFailures == 3)
    assert(r3.lastSuccessMs == 0L)

    // the source comes back: write real pages at that path, re-probe
    PagesGen.pages(spark, 20L).write.parquet(missing)
    val r4 = SourceHealth.probe(spark, missing, state, nowMs = 4L)
    assert(r4.status == "healthy" && r4.consecutiveFailures == 0 &&
      r4.rows == 20 && r4.lastSuccessMs == 4L)
  }

  test("wrong-schema source is a failure, not a crash") {
    import spark.implicits._
    val state = SparkTestSession.tmpDir("graft_health3")
    val bad = s"${SparkTestSession.tmpDir("graft_health_bad")}/t"
    Seq((1, "x")).toDF("a", "b").write.parquet(bad)
    val r = SourceHealth.probe(spark, bad, state, nowMs = 9L)
    assert(r.status == "degraded" && r.message.contains("schema missing"))
  }
}
