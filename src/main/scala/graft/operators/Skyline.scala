package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** Distributed skyline: local sweep per partition, then one global
    * sweep over the pruned candidates. */
  def skyline2d(points: Dataset[SkyPoint]): Dataset[SkyPoint] = {
    import points.sparkSession.implicits._
    val local = points.mapPartitions(sweep) // narrow: prunes in place
    // The candidate set is |skyline| × partitions — metadata-scale; one
    // single-partition sweep finishes it (this is the plan's ONLY shuffle).
    local.repartition(1).mapPartitions(sweep)
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
