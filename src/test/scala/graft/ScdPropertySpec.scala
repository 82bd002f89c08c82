package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScdPipeline

/** Property-based SCD2 invariants under random update-batch sequences
  * (SURVEY §5.2.3): after any sync chain —
  *   1. exactly one is_current row per business key present in the table;
  *   2. end_date IS NOT NULL ⟺ is_current = false;
  *   3. re-syncing the final batch is a no-op;
  *   4. scd_id values are unique.
  */
class ScdPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scd-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val batchGen: Gen[List[(Int, String)]] = for {
    n <- Gen.choose(0, 8)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 5)
      v <- Gen.oneOf("a", "b", "c", null)
    } yield (k, v))
  } yield rows.distinctBy(_._1) // one row per key within a batch

  private def toDf(batch: List[(Int, String)]): DataFrame = {
    import spark.implicits._
    batch.toDF("k", "v")
  }

  test("SCD2 invariants hold for random batch sequences") {
    // scalatestplus isn't in the offline cache; drive Gen with fixed seeds
    // (deterministic across rounds) instead of forAll.
    val cases = (1 to 12).flatMap(i =>
      Gen.listOfN(3, batchGen)(Gen.Parameters.default, Seed(42L + i)))
    assert(cases.size == 12)
    cases.foreach { batches =>
      val first = toDf(batches.headOption.getOrElse(Nil))
      var target = ScdPipeline.emptyTarget(first)
      var t = 0
      batches.foreach { b =>
        t += 1
        val (next, _) = ScdPipeline.sync(target, toDf(b), Seq("k"),
          now = Timestamp.valueOf(f"2024-01-0$t%d 00:00:00"))
        target = next.cache()
        target.count() // materialize so the chain doesn't recompute
      }
      // 1: exactly one current row per key that is present at all
      assert(target.filter(col("is_current"))
        .groupBy("k").count().filter(col("count") =!= 1).count() == 0)
      // 2: end_date iff closed
      assert(target.filter(col("is_current") && col("end_date").isNotNull).count() == 0)
      assert(target.filter(!col("is_current") && col("end_date").isNull).count() == 0)
      // 4: scd_id DENSE — exactly 1..n (the reference's PG sequence shape)
      val n = target.count()
      assert(target.select("scd_id").distinct().count() == n)
      val mm = target.agg(min("scd_id"), max("scd_id")).head
      if (n > 0) assert(mm.getLong(0) == 1L && mm.getLong(1) == n,
        s"scd_id not dense: min=${mm.getLong(0)} max=${mm.getLong(1)} n=$n")
      // 3: re-sync of the last batch is a no-op
      batches.lastOption.foreach { last =>
        val (again, s) = ScdPipeline.sync(target, toDf(last), Seq("k"),
          now = Timestamp.valueOf("2024-02-01 00:00:00"))
        assert(s.closedChanged == 0 && s.insertedNew == 0)
        assert(again.count() == target.count())
      }
    }
  }
}
