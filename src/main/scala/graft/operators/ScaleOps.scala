package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques that only matter beyond one machine, implemented and
  * tested at toy scale so they are drop-in at 100 TB:
  *
  *   - salted joins: a skewed fact key (one customer with 30% of all
  *     orders) turns one shuffle partition into the whole job's critical
  *     path; salting splinters each hot key into `salt` sub-keys and
  *     explodes the dimension side to match. AQE's skew-join handles
  *     sort-merge cases adaptively; explicit salting is the portable form
  *     that also covers aggregations.
  *   - salted aggregation: two-phase groupBy (key+salt, then key) so no
  *     single reducer sees a hot key's entire group.
  *   - bucketed co-located joins: pre-bucketing both tables on the join
  *     key at write time makes every subsequent join on that key
  *     shuffle-free (SortMergeJoin with no Exchange) — the right layout
  *     for repeatedly-joined 100 TB fact tables.
  */
object ScaleOps {

  /** Inner equi-join with the left (fact) side salted `salt` ways.
    * Correctness is unconditional; use when `leftKey` is skewed. */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation: partial aggregate on (key, salt), final on
    * key. `aggs` maps output column name → (partialAgg, finalAgg) pairs
    * expressed over the value column, e.g. count → (count, sum). */
  def saltedCountByKey(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))

  /** Bloom-prefiltered join (a portable runtime filter): build a compact
    * bloom filter over the dimension side's join keys, ship it into the
    * fact scan as a literal, and drop fact rows that cannot possibly
    * join BEFORE the fact side's shuffle. At 100 TB this is the
    * difference between shuffling the whole fact table and shuffling
    * its join-selective fraction — the same idea as Spark's own
    * InjectRuntimeFilter, but explicit, so it applies even where the
    * optimizer declines. False positives only pass extra rows into the
    * join (which still runs); never wrong, only less pruned.
    *
    * The membership probe is the codegen `BloomFilterMightContain`
    * expression over the serialized filter — no UDF boundary in the
    * fact's hot path. Long-typed keys (the filter stores longs). */
  def bloomPrefilteredJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedDimRows: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Literal}
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val bf = dim.stat.bloomFilter(dimKey, expectedDimRows, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val might = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Cast(UnresolvedAttribute(factKey), LongType)))
    fact.filter(might).join(dim, fact(factKey) === dim(dimKey))
  }

  /** Write both sides bucketed on the join key; returns the table names.
    * Subsequent joins between them on that key plan with zero Exchange. */
  def writeBucketed(
      spark: SparkSession,
      left: DataFrame, leftName: String, leftKey: String,
      right: DataFrame, rightName: String, rightKey: String,
      buckets: Int): Unit = {
    def write(df: DataFrame, name: String, key: String): Unit = {
      // Clear both the catalog entry and any orphaned location — CTAS
      // refuses to reuse a leftover directory from a dropped table.
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet").saveAsTable(name)
    }
    write(left, leftName, leftKey)
    write(right, rightName, rightKey)
  }
}
