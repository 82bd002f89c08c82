package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** Distributed JDBC upsert sink — the reference's actual SCD target
  * (delta_to_postgres_scd.py:242-261 batches
  * `INSERT … ON CONFLICT (key) DO UPDATE SET col = EXCLUDED.col`).
  *
  * The environment ships no JDBC driver jar, so the writer is built
  * against a pluggable [[UpsertConnectionFactory]]: the production
  * implementation ([[JdbcConnectionFactory]]) goes through
  * `java.sql.DriverManager` (JDK API — compiles without any driver; the
  * driver jar is an executor-classpath concern), and tests plug an
  * in-memory fake so the full foreachPartition path executes.
  *
  * Scale shape: pure `foreachPartition` — every executor opens its own
  * connection and streams its partition in `batchSize` groups; nothing
  * is collected to the driver, and rows-written is reported through an
  * accumulator. Partition count (and therefore connection count) is the
  * caller's `repartition` decision, exactly like the reference's pool
  * sizing.
  */
object JdbcUpsertSink {

  trait UpsertConnection {
    /** Execute one prepared upsert statement for a batch of parameter
      * rows (each row's values in statement-placeholder order). */
    def executeBatch(sql: String, batch: Seq[Seq[Any]]): Unit
    def close(): Unit
  }

  trait UpsertConnectionFactory extends Serializable {
    def connect(): UpsertConnection
  }

  /** Real JDBC factory. Driver registration is the standard
    * `DriverManager` service lookup; url/properties as in the reference
    * config (delta_to_postgres_scd.py:37-44). */
  final class JdbcConnectionFactory(url: String, props: Map[String, String])
      extends UpsertConnectionFactory {
    override def connect(): UpsertConnection = new UpsertConnection {
      private val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      private val conn = java.sql.DriverManager.getConnection(url, p)
      override def executeBatch(sql: String, batch: Seq[Seq[Any]]): Unit = {
        val ps = conn.prepareStatement(sql)
        try {
          batch.foreach { row =>
            row.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
            ps.addBatch()
          }
          ps.executeBatch()
        } finally ps.close()
      }
      override def close(): Unit = conn.close()
    }
  }

  /** PostgreSQL upsert statement for `cols` keyed on `keys` — the exact
    * dialect form the reference emits (delta_to_postgres_scd.py:242-252). */
  def postgresUpsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains), s"keys $keys must be in $cols")
    val nonKeys = cols.filterNot(keys.contains)
    val updates =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.mkString(", ")}) $updates"
  }

  /** Upsert `df` into `table` keyed on `keys`. Returns rows written. */
  def write(df: DataFrame, factory: UpsertConnectionFactory, table: String,
      keys: Seq[String], batchSize: Int = 500): Long = {
    val cols = df.columns.toSeq
    val sql = postgresUpsertSql(table, cols, keys)
    val written = df.sparkSession.sparkContext.longAccumulator("graft.upserted")
    df.foreachPartition { it: Iterator[Row] =>
      if (it.hasNext) {
        val conn = factory.connect()
        try it.grouped(batchSize).foreach { g =>
          conn.executeBatch(sql, g.map(r => cols.indices.map(r.get)))
          written.add(g.size)
        } finally conn.close()
      }
    }
    written.value
  }
}
