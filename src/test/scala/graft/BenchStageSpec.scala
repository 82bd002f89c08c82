package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BenchStage fidelity: the multi-row-group restage must be a pure
  * LAYOUT change — same rows, same schema, per table — and must reuse
  * the staged copy across calls (content-stamped marker) so repeated
  * bench runs never pay staging twice. The bench numbers mean nothing
  * if the staged fixture drifts from the driver's. */
class BenchStageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-benchstage-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("staging preserves every table's rows and schema; reuses the " +
    "stamped copy; splits data tables into multiple files") {
    val src = "/root/testdata/sf0.001"
    val staged = BenchStage.stage(spark, src, files = 4)
    assert(staged != src)
    Tables.names.foreach { t =>
      val raw = Tables.load(spark, src, t)
      val st = Tables.load(spark, staged, t)
      assert(st.schema == raw.schema, s"$t: schema drifted")
      assert(st.count() == raw.count(), s"$t: row count drifted")
      // full content equality, not just counts (ts normalization makes
      // events comparable through the same Tables.load path)
      assert(st.exceptAll(raw).isEmpty && raw.exceptAll(st).isEmpty,
        s"$t: staged rows differ from source")
    }
    // lineitem is comfortably above one file's worth — it must be split
    val liFiles = new java.io.File(s"$staged/lineitem.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(liFiles == 4, s"expected 4 part files, got $liFiles")
    // second call must REUSE (marker mtime unchanged)
    val marker = new java.io.File(s"$staged/_staged_ok")
    val m0 = marker.lastModified()
    assert(BenchStage.stage(spark, src, files = 4) == staged)
    assert(marker.lastModified() == m0, "restaged despite valid stamp")
    // a different split factor invalidates the stamp and restages
    assert(BenchStage.stage(spark, src, files = 2) == staged)
    val li2 = new java.io.File(s"$staged/lineitem.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(li2 == 2, s"files=2 restage expected 2 parts, got $li2")
  }
}
