package graft

import org.apache.spark.sql.SparkSession

/** Scaling-exponent probe: times named corpus queries on TWO data dirs
  * (same generator, different size — see scripts/gen_scale_data.py) and
  * prints each query's runtime ratio and fitted exponent
  * `log(tB/tA) / log(scale)`. A query whose cost grows ~linearly in the
  * data shows exponent <= ~1 (fixed per-job overhead biases it BELOW 1
  * at these sizes); an exponent pushing 2 is a hidden quadratic — the
  * thing this main exists to catch before a real cluster would.
  *
  * Usage (sbt): runMain graft.ScaleCheck <dirA> <dirB> <scale> <q1,q2,...>
  * Timing: per (query, dir), best of 2 back-to-back materializations
  * through the noop sink (same methodology as [[Bench]]).
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleCheck <dirA> <dirB> <scale> <q1,q2,...>")
    val Array(dirA, dirB, scaleStr, qlist) = args.take(4)
    val scale = scaleStr.toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalecheck")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = qlist.split(",").toSeq.map { q =>
      SparkEntry.queries.keys.find(_.startsWith(q)).getOrElse(
        sys.error(s"no corpus query starts with '$q'"))
    }.sorted

    // SPARK_GRAFT_SCALE_COLD=1 (r15): drop the per-dir metadata caches
    // (BM25 stats / decont panel / rrf pre-products) before EVERY rep,
    // so the measured wall includes the stats first-build — the cold
    // number is the one that scales with the corpus; the default warm
    // path amortizes it across a session by design.
    val cold = sys.env.getOrElse("SPARK_GRAFT_SCALE_COLD", "0") == "1"
    def once(name: String, dir: String): Double = {
      if (cold) {
        graft.operators.TextAnalysis.clearStampedCaches()
        graft.operators.Similarity.clearStampedCaches()
      }
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    def best(name: String, dir: String): Double =
      math.min(once(name, dir), once(name, dir))

    // warmup (codegen + parquet footer caches): the FIRST query the
    // probe dir can actually feed — stopping at a failing names.head
    // would leave the JVM cold and bias the first measured tA upward
    // (deflating that query's exponent, the metric this main exists for)
    names.iterator
      .map(n => try { once(n, dirA); true } catch { case _: Exception => false })
      .find(identity)

    // A query the probe dirs can't feed (missing table, corpus-specific
    // fixture) is reported and skipped, so one sweep can name every
    // query without pre-filtering by input dependency.
    val rows = names.flatMap { n =>
      try {
        val tA = best(n, dirA)
        val tB = best(n, dirB)
        val exp = math.log(tB / tA) / math.log(scale)
        println(f"$n%-28s ${tA}%8.2fs -> ${tB}%8.2fs  ratio ${tB / tA}%6.2f  exp $exp%5.2f")
        Some((n, tA, tB, exp))
      } catch {
        case e: Exception =>
          println(s"$n  SKIP (${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString})")
          None
      }
    }
    val qs = rows.map { case (n, tA, tB, e) =>
      "\"" + n.takeWhile(_ != '_') + "\":{\"tA\":" + (math.rint(tA * 1000) / 1000) +
        ",\"tB\":" + (math.rint(tB * 1000) / 1000) +
        ",\"exp\":" + (math.rint(e * 100) / 100) + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale-exponents","scale":$scale,"queries":$qs}""")
    spark.stop()
  }
}
