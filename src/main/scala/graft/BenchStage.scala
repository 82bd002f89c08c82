package graft

import org.apache.spark.sql.SparkSession

/** Multi-row-group restaging of the driver's single-file fixtures
  * (VERDICT r7 item 5).
  *
  * The driver's `/root/testdata/sf*` tables are ONE parquet file with ONE
  * row group each, and both Spark and DuckDB parallelize scans at
  * row-group granularity — so every scan-side stage (the shingle/cosine
  * map work that dominates the heavy corpus queries) runs single-threaded
  * on the raw fixture, measuring per-row CPU instead of the plan. No real
  * table at the 100 TB design point is one row group; the bench should
  * not be either. This stages each table into an N-file directory under
  * /tmp once per source-fixture state (content-stamped marker, so
  * repeated bench runs reuse it), and BOTH engines read the same staged
  * layout: `Tables.load` reads a `<t>.parquet` directory transparently,
  * and `duck_bench.py` globs it. Timing windows never include staging.
  *
  * Physical types are preserved (RAW `spark.read.parquet`, no ts
  * normalization), with one guard: a legacy nanos-typed `events.ts`
  * surfaces as INT64 only under the nanosAsLong conf and would lose its
  * logical type on rewrite, so that one form is byte-copied instead of
  * rewritten. `region`/`nation` (5/25 rows) are byte-copied — splitting
  * a broadcast dim buys nothing.
  *
  * Disable with SPARK_GRAFT_STAGE=0 (Bench reads the raw dir directly).
  */
object BenchStage {

  private val CopyOnly = Set("region", "nation")

  def stage(spark: SparkSession, sfDir: String, files: Int = 8): String = {
    val base = new java.io.File(sfDir)
    require(base.isDirectory, s"not a fixture dir: $sfDir")
    val tag = base.getAbsolutePath.replaceAll("[^A-Za-z0-9.]+", "_")
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir", "/tmp"), s"graft_stage$tag")
    val marker = new java.io.File(out, "_staged_ok")
    val want = stamp(base, files)
    if (marker.isFile &&
      java.nio.file.Files.readString(marker.toPath).trim == want)
      return out.getAbsolutePath
    if (out.exists()) delete(out)
    out.mkdirs()
    // events under legacy nanos reads as INT64 — see Scaladoc
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val src = new java.io.File(base, s"$t.parquet")
      val dst = new java.io.File(out, s"$t.parquet")
      val raw = spark.read.parquet(src.getAbsolutePath)
      val nanosTs = t == "events" &&
        raw.schema("ts").dataType == org.apache.spark.sql.types.LongType
      if (CopyOnly(t) || nanosTs)
        java.nio.file.Files.copy(src.toPath, dst.toPath)
      else
        raw.repartition(files).write.mode("overwrite")
          .parquet(dst.getAbsolutePath)
    }
    java.nio.file.Files.writeString(marker.toPath, want + "\n")
    out.getAbsolutePath
  }

  /** Source-state stamp: any driver regeneration of the fixture (or a
    * changed split factor) invalidates the staged copy. */
  private def stamp(d: java.io.File, files: Int): String =
    s"files=$files;" + d.listFiles().filter(_.isFile).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(";")

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(); ()
  }
}
