package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDml, DeltaLog, DeltaMaintenance, DeltaWrite}

/** Model-based property test: a random interleaving of every Delta
  * operation (append / overwrite / UPDATE / DELETE / OPTIMIZE /
  * checkpoint / VACUUM / time-travel reads) must keep the log-replayed
  * table equal to a trivial in-memory model after every step. This is
  * the strongest correctness statement the source can make: no
  * operation order corrupts the snapshot, and maintenance operations
  * are invisible to readers. */
class DeltaPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-delta-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("random op sequences never diverge from the model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L) // fixed seed: deterministic
    val t = Files.createTempDirectory("graft-delta-prop").resolve("t").toString

    var model = Map.empty[Int, Double] // id -> v (ids unique by invariant)
    var nextId = 0
    def freshBatch(n: Int): Seq[(Int, Double)] = {
      val b = (0 until n).map(i => (nextId + i, (nextId + i) * 1.5))
      nextId += n
      b
    }
    // version -> model at that version (for time-travel checks)
    var history = Map.empty[Long, Map[Int, Double]]

    DeltaWrite.write(freshBatch(3).toDF("id", "v"), t)
    model = Map(0 -> 0.0, 1 -> 1.5, 2 -> 3.0)
    history += (0L -> model)

    def check(): Unit = {
      val got = DeltaLog.read(spark, t).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == model, s"divergence: got=$got model=$model")
    }
    check()

    (1 to 30).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // append
          val b = freshBatch(1 + rnd.nextInt(3))
          val v = DeltaWrite.write(b.toDF("id", "v"), t, SaveMode.Append)
          model ++= b.toMap
          history += (v -> model)
        case 1 => // overwrite
          val b = freshBatch(2)
          val v = DeltaWrite.write(b.toDF("id", "v"), t, SaveMode.Overwrite)
          model = b.toMap
          history += (v -> model)
        case 2 => // delete a random residue class
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          val res = DeltaDml.delete(spark, t, pmod(col("id"), lit(k)) === r)
          val expect = model.filter { case (id, _) => ((id % k) + k) % k == r }
          assert(res.affectedRows == expect.size)
          model --= expect.keys
          if (res.rewrittenFiles > 0)
            history += (DeltaLog.latestVersion(spark, t) -> model)
        case 3 => // update a random residue class
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          DeltaDml.update(spark, t, pmod(col("id"), lit(k)) === r,
            Seq("v" -> (col("v") + 100)))
          model = model.map { case (id, v) =>
            id -> (if (((id % k) + k) % k == r) v + 100 else v)
          }
          history += (DeltaLog.latestVersion(spark, t) -> model)
        case 4 => // compact everything (tiny files)
          DeltaMaintenance.compact(spark, t, smallFileBytes = 32 * 1024 * 1024)
        case 5 => // checkpoint
          DeltaWrite.checkpoint(spark, t)
        case 6 => // vacuum: kills time travel for pre-vacuum versions
          DeltaMaintenance.vacuum(spark, t, retainMs = 0L)
          history = Map.empty
      }
      check()
      // spot-check one retained historical version per step
      if (history.nonEmpty) {
        val (hv, hm) = history.toSeq(rnd.nextInt(history.size))
        val got = DeltaLog.read(spark, t, Some(hv)).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        assert(got == hm, s"time travel v$hv diverged: got=$got model=$hm")
      }
    }
  }
}
