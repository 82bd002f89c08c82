package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.SessionCaches.TrackedPersist

/** A 2-attribute point in a skyline computation: minimize `price`,
  * maximize `size` (names follow the flagship part-table query; the
  * operator itself is generic over any min/max attribute pair mapped
  * into this shape). */
final case class SkyPoint(key: Long, price: Double, size: Int)

/** Skyline (Pareto-optimal set) operator — SURVEY §7.2's "papers unmined"
  * row, after the partition-local skyline + merge strategy of
  * "Integration of Skyline Queries into Spark SQL" (EDBT 2023): no
  * quadratic dominance join anywhere.
  *
  * A point p is DOMINATED iff some q is no worse in both attributes and
  * strictly better in at least one. The skyline is the non-dominated set.
  *
  * Scale design: dominance is transitive, so the global skyline equals
  * the skyline of the union of per-partition skylines. Phase 1 is a
  * narrow `mapPartitions` sweep (sort the partition by (price asc,
  * size desc), keep points that raise the running max size — O(n log n)
  * per partition, no shuffle) that prunes each partition down to ~its
  * skyline. Phase 2 runs the same sweep once over the union of the tiny
  * candidate sets. The only shuffle in the plan moves candidate points —
  * at 100 TB the full table is swept in place and only Pareto survivors
  * travel.
  *
  * Tie semantics (checked by the sweep): coordinate-duplicate points do
  * not dominate each other — all copies of a skyline coordinate survive,
  * matching the NOT EXISTS dominance oracle exactly.
  */
object Skyline {

  /** One 2D dominance sweep over an in-memory partition. Sorted by
    * (price asc, size desc, key), a point survives iff it raises the
    * running max size, or exactly duplicates the (price, size) of the
    * point that set it (coordinate duplicates: mutual non-dominance). */
  private[operators] def sweep(it: Iterator[SkyPoint]): Iterator[SkyPoint] = {
    val sorted = it.toArray
    java.util.Arrays.sort(sorted, Ordering.by((p: SkyPoint) => (p.price, -p.size, p.key)))
    val out = scala.collection.mutable.ArrayBuffer[SkyPoint]()
    var maxSize = Int.MinValue
    var maxPrice = Double.NaN
    sorted.foreach { p =>
      if (p.size > maxSize) { maxSize = p.size; maxPrice = p.price; out += p }
      else if (p.size == maxSize && p.price == maxPrice) out += p
    }
    out.iterator
  }

  /** Distributed skyline: local sweep per partition, then a global
    * merge over the pruned candidates — ADAPTIVE in the candidate count
    * (VERDICT r8 item 5):
    *
    *   - candidates ≤ `mergeBound` (default 2²⁰ ≈ 20 MB of SkyPoints —
    *     the q81 edge-gate discipline): one single-partition sweep.
    *     This is the common case; real skylines are tiny.
    *   - candidates > mergeBound (fully anti-correlated data, where the
    *     skyline itself is O(n) and NO merge can shrink it): the final
    *     task must not be O(n), so the merge goes distributed. Range-
    *     partition candidates by price — equal prices land in ONE
    *     partition (RangePartitioner boundary ties), so every point in
    *     an EARLIER partition has STRICTLY smaller price, and dominance
    *     against earlier partitions collapses to one scalar: p survives
    *     its prefix iff p.size > max(size) over all earlier partitions
    *     (strictly-cheaper q with q.size ≥ p.size dominates; the
    *     coordinate-duplicate tie rule only exists WITHIN a partition,
    *     where the sweep already applies it). Per-partition maxes are
    *     one Int each — the collect is bounded by the partition count,
    *     a documented metadata-scale exception — broadcast back as an
    *     exclusive prefix-max array.
    *
    * The candidate frame is persisted because the adaptive branch needs
    * its count; callers running many queries clear caches between them
    * (SparkEntry.queries contract). */
  def skyline2d(points: Dataset[SkyPoint],
      mergeBound: Long = 1L << 20): Dataset[SkyPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    val cands = points.mapPartitions(sweep).persistTracked() // narrow: prunes in place
    val n = cands.count()
    if (n <= mergeBound) {
      // candidate set is |skyline| × partitions — metadata-scale; one
      // single-partition sweep finishes it (the plan's only shuffle)
      cands.repartition(1).mapPartitions(sweep)
    } else {
      // ~mergeBound/8 rows per final task, bounded partition count
      val parts = math.min(2048L, 8L * ((n - 1) / mergeBound + 1)).toInt
      val rr = cands.repartitionByRange(parts, col("price")).as[SkyPoint].rdd
      // per-partition max size BEFORE sweeping (same max — the sweep
      // keeps every partition's max-size point); collect is `parts` Ints
      val maxes = rr.mapPartitionsWithIndex { (i, it) =>
        var m = Int.MinValue
        it.foreach(p => if (p.size > m) m = p.size)
        Iterator.single((i, m))
      }.collect().toMap
      val prefix = Array.fill(parts)(Int.MinValue)
      var run = Int.MinValue
      var i = 0
      while (i < parts) {
        prefix(i) = run
        run = math.max(run, maxes.getOrElse(i, Int.MinValue))
        i += 1
      }
      val bc = spark.sparkContext.broadcast(prefix)
      // reuses the range shuffle files from the maxes pass (same RDD
      // lineage — the map stage is skipped on the second action)
      spark.createDataset(rr.mapPartitionsWithIndex { (i, it) =>
        val cut = bc.value(i)
        sweep(it).filter(p => p.size > cut)
      })
    }
  }

  val all: Seq[GraftQuery] = Seq(

    // Pareto frontier of parts: cheapest price vs largest size.
    GraftQuery("q88_skyline",
      (s, d) => {
        import s.implicits._
        val pts = Tables.load(s, d, "part")
          .select(col("p_partkey").cast("long").as("key"),
            col("p_retailprice").as("price"), col("p_size").as("size"))
          .as[SkyPoint]
        skyline2d(pts)
          .toDF("p_partkey", "p_retailprice", "p_size")
          .orderBy("p_partkey")
      },
      Some("SELECT p_partkey, p_retailprice, p_size FROM part p " +
        "WHERE NOT EXISTS (SELECT 1 FROM part q " +
        "WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size " +
        "AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)) " +
        "ORDER BY p_partkey"))
  )
}
