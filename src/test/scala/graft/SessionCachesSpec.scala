package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The tracked-persist registry (ADVICE r9): graft-internal persists
  * die at a release() boundary while USER `CACHE TABLE` pins survive —
  * the property a blanket clearCache cannot provide, and the reason the
  * pre-r10 REPL accumulated query-internal caches for the session's
  * lifetime. */
class SessionCachesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sessioncaches-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("corpus-query internal persists are tracked and release() drops " +
    "them; a user CACHE TABLE pin survives the release") {
    spark.catalog.clearCache()
    SessionCaches.release(spark) // drain anything a prior test left
    assert(SessionCaches.outstanding(spark) == 0)

    // the user's own pin — must NOT be dropped by release()
    Tables.load(spark, sf, "nation").createOrReplaceTempView("sc_user_pin")
    spark.sql("CACHE TABLE sc_user_pin")
    assert(spark.catalog.isCached("sc_user_pin"))

    // a query whose operator persists internal frames (q115's
    // distinctive-terms word rollup; q126's former posting persist left
    // with the r14 in-row BM25 rework) — consume it, then the
    // REPL-shaped release
    val df = SparkEntry.queries("q115_distinctive_terms")(spark, sf)
    assert(df.collect().nonEmpty)
    assert(SessionCaches.outstanding(spark) > 0,
      "the query's internal persists should be registered")

    SessionCaches.release(spark)
    assert(SessionCaches.outstanding(spark) == 0)
    // registry entries are gone from the cache; the user pin is intact
    assert(spark.catalog.isCached("sc_user_pin"))
    spark.sql("UNCACHE TABLE sc_user_pin")
  }

  test("release() is idempotent and unpersist-after-clearCache is safe") {
    val df = SparkEntry.queries("q115_distinctive_terms")(spark, sf)
    assert(df.collect().nonEmpty)
    assert(SessionCaches.outstanding(spark) > 0)
    spark.catalog.clearCache() // the Verify/Bench path clears first ...
    SessionCaches.release(spark) // ... then the drain is a set of no-ops
    SessionCaches.release(spark) // and a second release finds nothing
    assert(SessionCaches.outstanding(spark) == 0)
  }
}
