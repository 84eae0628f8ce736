package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Scd2

/** ScalaCheck properties (SURVEY §5.4): across random multi-day histories
  *  - exactly one open version per key ever seen;
  *  - closed versions have dt_last_update < sentinel;
  *  - total row count = 1 + (number of observed changes) per key;
  *  - re-merging any day's snapshot is idempotent.
  */
class Scd2PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val keys = ('a' to 'f').map(_.toString)

  /** A day's snapshot: subset of keys with small attribute domains (so
    * changes and no-ops both occur often).
    */
  private val genDay: Gen[Map[String, (Int, String)]] = for {
    present <- Gen.someOf(keys)
    vals <- Gen.sequence[List[(String, (Int, String))], (String, (Int, String))](
      present.map(k => for {
        p <- Gen.choose(1, 3)
        b <- Gen.oneOf("x", "y")
      } yield k -> (p, b)))
  } yield vals.toMap

  private def toDf(m: Map[String, (Int, String)]): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (k, (p, b)) => (k, p, b) }
      .toDF("natural_key", "price", "brand")
  }

  private def day(i: Int) = Date.valueOf(f"2024-01-${i + 1}%02d")

  test("SCD2 invariants hold for arbitrary 4-day histories") {
    val prop = Prop.forAll(Gen.listOfN(4, genDay)) { days =>
      val nonEmpty = days.filter(_.nonEmpty)
      nonEmpty.isEmpty || {
        var dim = toDf(nonEmpty.head)
          .withColumn("dt_load_to_dw", lit(day(0)))
          .withColumn("dt_last_update", lit(Scd2.Sentinel))
        nonEmpty.tail.zipWithIndex.foreach { case (snap, i) =>
          dim = Scd2.merge(dim, toDf(snap), "natural_key",
            Seq("price", "brand"), day(i + 1)).cache()
        }
        val rows = dim.collect().map(r => (r.getString(0), r.getInt(1),
          r.getString(2), r.getDate(3), r.getDate(4)))

        // expected versions per key from the history itself
        val expectedVersions = keys.map { k =>
          val seen = nonEmpty.flatMap(_.get(k))
          val changes = seen.zip(seen.drop(1)).count { case (a, b) => a != b }
          k -> (if (seen.isEmpty) 0 else 1 + changes)
        }.toMap

        val byKey = rows.groupBy(_._1)
        val versionsOk = expectedVersions.forall { case (k, n) =>
          byKey.get(k).map(_.length).getOrElse(0) == n
        }
        val oneOpen = byKey.values.forall(
          _.count(_._5 == Scd2.Sentinel) == 1)
        val closedBeforeSentinel = rows.filter(_._5 != Scd2.Sentinel)
          .forall(r => r._5.before(Scd2.Sentinel))
        versionsOk && oneOpen && closedBeforeSentinel
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
