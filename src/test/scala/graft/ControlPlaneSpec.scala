package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import graft.control.ControlPlane
import graft.control.ControlPlane._

class ControlPlaneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val day = Date.valueOf("2024-12-08")
  private def entry(id: Long, status: String, ts: Long = 0L) =
    RunLogEntry(id, 1, "data_1.csv", day, status, 200, 16,
      new Timestamp(ts))

  test("state machine: legal path RUNNING→ES→RUNNING→LS→RUNNING→LWS" +
       "→RUNNING→LDM") {
    import Status._
    val path = Seq(Running -> ExtractSuccess, ExtractSuccess -> Running,
      Running -> LoadedStaging, LoadedStaging -> Running,
      Running -> LoadedWarehouse, LoadedWarehouse -> Running,
      Running -> LoadedMart)
    path.foreach { case (a, b) => assert(transition(a, b).isRight) }
    assert(transition(ExtractSuccess, LoadedWarehouse).isLeft)
    // LDM is terminal: the mart is the last scheduled stage of the day
    assert(transition(LoadedMart, Running).isLeft)
    assert(transition(LoadedMart, ExtractFailure).isLeft)
    assert(transition(Running, "NOPE").isLeft)
  }

  test("guards gate each stage on the prior stage's status") {
    val log0 = emptyLog(spark)
    assert(canExtract(log0, 1, day))
    assert(!readyForStaging(log0, 1, day))

    val logRunning = upsert(log0, entry(1, Status.Running, 1))
    assert(!canExtract(logRunning, 1, day))

    val logEs = upsert(logRunning, entry(2, Status.ExtractSuccess, 2))
    assert(!canExtract(logEs, 1, day))
    assert(readyForStaging(logEs, 1, day))
    assert(!readyForDw(logEs, 1, day))

    val logLs = upsert(logEs, entry(3, Status.LoadedStaging, 3))
    assert(readyForDw(logLs, 1, day))
    assert(!readyForMart(logLs, 1, day), "mart needs LWS, not LS")
    // other config/day unaffected
    assert(canExtract(logLs, 2, day))
    assert(canExtract(logLs, 1, Date.valueOf("2024-12-09")))

    val logLws = upsert(logLs, entry(4, Status.LoadedWarehouse, 4))
    assert(readyForMart(logLws, 1, day))
    assert(!canExtract(logLws, 1, day), "LWS day must not re-extract")

    val logLdm = upsert(logLws, entry(5, Status.LoadedMart, 5))
    assert(!canExtract(logLdm, 1, day), "LDM day must not re-extract")
    assert(!readyForMart(logLdm, 1, day),
      "LDM replaced the LWS row - the mart does not rebuild")
  }

  test("upsert keeps latest status per (config, day)") {
    val log = Seq(entry(1, Status.Running, 1), entry(2, Status.ExtractSuccess, 2))
      .foldLeft(emptyLog(spark))(upsert)
    assert(log.count() === 1)
    assert(log.head().getAs[String]("status") === Status.ExtractSuccess)
  }

  test("retry retries then succeeds; exhaustion rethrows") {
    var calls = 0
    val v = retry(3, 0L) { () =>
      calls += 1
      if (calls < 3) sys.error("transient") else 42
    }
    assert(v === 42 && calls === 3)
    intercept[RuntimeException] {
      retry(2, 0L)(() => sys.error("always"))
    }
  }

  test("alerter collects failure notifications, no secrets involved") {
    val a = new CollectingAlerter
    intercept[RuntimeException] {
      ControlPlane.retry(1, 0L) { () =>
        try sys.error("boom")
        catch {
          case e: Throwable =>
            a.alert("stage failed", e.getMessage); throw e
        }
      }
    }
    assert(a.sent.nonEmpty && a.sent.head._1 === "stage failed")
  }
}
