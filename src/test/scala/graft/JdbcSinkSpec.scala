package graft

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScdPipeline
import graft.sources.JdbcUpsertSink
import graft.sources.JdbcUpsertSink.{UpsertConnection, UpsertConnectionFactory}

/** The JDBC upsert path with an in-memory fake connection: the statement
  * text is asserted against the reference's ON CONFLICT form, and the
  * full foreachPartition batching path runs (no driver jar in env). */
object FakeDb {
  // (table, key values) -> full row; shared across local "executors".
  val store: TrieMap[(String, Seq[Any]), Seq[Any]] = TrieMap.empty
  val batches = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Applies postgres ON CONFLICT semantics structurally: the fake is
    * constructed with the same (table, cols, keys) the writer was, so it
    * does not parse SQL — the SQL text itself is covered by its own test. */
  final class Factory(table: String, cols: Seq[String], keys: Seq[String])
      extends UpsertConnectionFactory {
    private val keyIdx = keys.map(cols.indexOf)
    override def connect(): UpsertConnection = new UpsertConnection {
      override def executeBatch(sql: String, batch: Seq[Seq[Any]]): Long = {
        require(sql == JdbcUpsertSink.postgresUpsertSql(table, cols, keys),
          "writer must emit the statement it declared")
        batches.incrementAndGet()
        batch.foreach(row => store.put((table, keyIdx.map(row)), row))
        batch.size.toLong // every row acked, like postgres ON CONFLICT
      }
      override def close(): Unit = ()
    }
  }
}

/** Fault-injecting fake for the delivery-semantics property test: every
  * executeBatch applies its rows ATOMICALLY (batch = one statement, the
  * contract the real sink gets from JDBC batching in a transaction),
  * then the configured statement COMMITS-BUT-THROWS exactly once — the
  * worst-case interleaving, where the failure lands after the commit. */
object FlakyDb {
  val store: TrieMap[(String, Seq[Any]), Seq[Any]] = TrieMap.empty
  private val statements = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var failAfter = Int.MaxValue
  private val failed = new java.util.concurrent.atomic.AtomicBoolean(false)

  def reset(failAfterStatements: Int): Unit = {
    store.clear(); statements.set(0); failed.set(false)
    failAfter = failAfterStatements
  }

  final class Factory(table: String, cols: Seq[String], keys: Seq[String])
      extends UpsertConnectionFactory {
    private val keyIdx = keys.map(cols.indexOf)
    override def connect(): UpsertConnection = new UpsertConnection {
      override def executeBatch(sql: String, batch: Seq[Seq[Any]]): Long = {
        // atomic apply: whole batch lands before any failure is raised
        batch.foreach(row => store.put((table, keyIdx.map(row)), row))
        if (statements.incrementAndGet() >= failAfter &&
          failed.compareAndSet(false, true))
          throw new RuntimeException("injected post-commit connection loss")
        batch.size.toLong
      }
      override def close(): Unit = ()
    }
  }
}

class JdbcSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jdbc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("postgres upsert statement matches the reference dialect form") {
    assert(JdbcUpsertSink.postgresUpsertSql("dim_c", Seq("id", "name", "v"), Seq("id")) ==
      "INSERT INTO dim_c (id, name, v) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, v = EXCLUDED.v")
    assert(JdbcUpsertSink.postgresUpsertSql("k", Seq("a", "b"), Seq("a", "b")) ==
      "INSERT INTO k (a, b) VALUES (?, ?) ON CONFLICT (a, b) DO NOTHING")
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.postgresUpsertSql("t", Seq("a"), Seq("missing"))
    }
  }

  test("write inserts then upserts through foreachPartition batches") {
    import spark.implicits._
    FakeDb.store.clear(); FakeDb.batches.set(0)
    val cols = Seq("id", "name")
    val factory = new FakeDb.Factory("t1", cols, Seq("id"))
    val n1 = JdbcUpsertSink.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").repartition(3),
      factory, "t1", Seq("id"), batchSize = 2)
    assert(n1 == 3)
    assert(FakeDb.store.size == 3)
    // conflict path: same keys, new values
    val n2 = JdbcUpsertSink.write(
      Seq((2L, "B!"), (4L, "d")).toDF("id", "name"), factory, "t1", Seq("id"))
    assert(n2 == 2)
    assert(FakeDb.store.size == 4)
    assert(FakeDb.store(("t1", Seq(2L))) == Seq(2L, "B!"))
    assert(FakeDb.store(("t1", Seq(1L))) == Seq(1L, "a"))
  }

  test("ScdPipeline snapshot emits to the sink (reference SCD target path)") {
    import spark.implicits._
    FakeDb.store.clear()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-02-01 00:00:00")
    val b0 = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val (snap0, _) = ScdPipeline.sync(
      ScdPipeline.emptyTarget(b0), b0, Seq("id"), now = t0)
    val cols = snap0.columns.toSeq
    val factory = new FakeDb.Factory("scd_t", cols, Seq("scd_id"))
    JdbcUpsertSink.write(snap0, factory, "scd_t", Seq("scd_id"))
    assert(FakeDb.store.size == 2)

    val b1 = Seq((1L, "x2"), (3L, "z")).toDF("id", "v") // 1 changes, 3 is new
    val (snap1, sum1) = ScdPipeline.sync(snap0, b1, Seq("id"), now = t1)
    JdbcUpsertSink.write(snap1, factory, "scd_t", Seq("scd_id"))
    assert(sum1.closedChanged == 1 && sum1.insertedNew == 2)
    // closed v1 of id=1, current v2 of id=1, current id=2, current id=3
    assert(FakeDb.store.size == 4)
    val idIdx = cols.indexOf("id"); val curIdx = cols.indexOf("is_current")
    val currentIds = FakeDb.store.values
      .filter(r => r(curIdx) == true).map(r => r(idIdx)).toSet
    assert(currentIds == Set(1L, 2L, 3L))
  }

  test("property: upsert effect is exactly-once per key under partition " +
    "replay (crash AFTER a batch committed) and under concurrent writers " +
    "— seeded interleavings") {
    import spark.implicits._
    val cols = Seq("id", "name")
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed)
      val n = 10 + rnd.nextInt(50)
      val batchSize = 1 + rnd.nextInt(6)
      val parts = 1 + rnd.nextInt(4)

      // -- replay interleaving: the fake commits `failAfter` statements,
      // then dies once. write() fails; the caller's retry (Spark's own
      // task replay in production — same re-execution, wider blast
      // radius here) must converge on the clean-run state even though
      // some batches had already committed.
      FlakyDb.reset(failAfterStatements = 1 + rnd.nextInt(1 + n / batchSize))
      val table = s"t_replay_$seed"
      val rows = (0 until n).map(i => (i.toLong, s"s$seed-v$i"))
      val df = rows.toDF("id", "name").repartition(parts)
      val factory = new FlakyDb.Factory(table, cols, Seq("id"))
      intercept[org.apache.spark.SparkException] {
        JdbcUpsertSink.write(df, factory, table, Seq("id"), batchSize)
      } // some batches committed before the crash; some partitions may not
      val n2 = JdbcUpsertSink.write(df, factory, table, Seq("id"), batchSize)
      assert(n2 == n)
      assert(FlakyDb.store.size == n)
      rows.foreach { case (id, v) =>
        assert(FlakyDb.store((table, Seq(id))) == Seq(id, v),
          s"replayed state diverged at key $id")
      }

      // -- concurrent writers on overlapping key ranges: per-key puts
      // are atomic, so every key must end as EXACTLY one writer's full
      // row (no torn rows mixing w1's and w2's values).
      FlakyDb.reset(failAfterStatements = Int.MaxValue)
      val ct = s"t_conc_$seed"
      val overlap = rnd.nextInt(n)
      val w1 = (0 until n).map(i => (i.toLong, s"w1-$i"))
      val w2 = (overlap until overlap + n).map(i => (i.toLong, s"w2-$i"))
      val f2 = new FlakyDb.Factory(ct, cols, Seq("id"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fut = Seq(w1, w2).zipWithIndex.map { case (rs, i) =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = JdbcUpsertSink.write(
              rs.toDF("id", "name").repartition(parts), f2, ct,
              Seq("id"), batchSize)
          })
        }
        assert(fut.map(_.get()).sum == 2L * n)
      } finally pool.shutdown()
      val keys = (w1.map(_._1) ++ w2.map(_._1)).distinct
      assert(FlakyDb.store.size == keys.size)
      keys.foreach { id =>
        val got = FlakyDb.store((ct, Seq(id)))
        val legal = Seq(w1, w2).flatMap(_.find(_._1 == id))
          .map { case (k, v) => Seq[Any](k, v) }
        assert(legal.contains(got), s"key $id holds a torn/foreign row: $got")
      }
    }
  }

  // ---- live-connection tests: embedded Derby (the one JDBC engine the
  // Spark distribution ships) through the REAL JdbcConnectionFactory /
  // DriverManager path — statement flow, batch flush, and upsert
  // semantics on a live java.sql.Connection, not the in-memory fake.
  // Dialect-gated: Derby has no ON CONFLICT, so the sink's MERGE form
  // drives it; the postgres text stays covered by the fake above.

  private val derbyUrl = "jdbc:derby:memory:graftdb;create=true"

  private def derbyQuery[A](q: String)(f: java.sql.ResultSet => A): A = {
    val c = java.sql.DriverManager.getConnection(derbyUrl)
    try { val rs = c.createStatement().executeQuery(q); f(rs) }
    finally c.close()
  }

  // Observed once (r8, full-suite run under concurrent box load): the
  // final SELECT saw only batch 2's rows while n1 == 3 had passed —
  // i.e. batch 1 was acknowledged but not visible. The sink now counts
  // DATABASE-ACKED update counts (not input rows), so a recurrence
  // fails at the n1 assertion with the precise shortfall instead of
  // a downstream row diff. Not reproducible in isolation (6/6 green).
  test("live Derby: insert-then-upsert through the real DriverManager " +
    "factory and MERGE dialect") {
    import spark.implicits._
    val c0 = java.sql.DriverManager.getConnection(derbyUrl)
    try c0.createStatement().executeUpdate(
      "CREATE TABLE dim_live (id BIGINT PRIMARY KEY, name VARCHAR(64))")
    finally c0.close()

    val factory = new JdbcUpsertSink.JdbcConnectionFactory(derbyUrl, Map.empty)
    val n1 = JdbcUpsertSink.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").repartition(2),
      factory, "dim_live", Seq("id"), batchSize = 2,
      dialect = JdbcUpsertSink.DerbyMergeDialect)
    assert(n1 == 3)
    // conflict path: id=2 updates in place, id=4 inserts
    val n2 = JdbcUpsertSink.write(
      Seq((2L, "B!"), (4L, "d")).toDF("id", "name"), factory, "dim_live",
      Seq("id"), dialect = JdbcUpsertSink.DerbyMergeDialect)
    assert(n2 == 2)
    val rows = derbyQuery("SELECT id, name FROM dim_live ORDER BY id") { rs =>
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getString(2))).toList
    }
    assert(rows == List((1L, "a"), (2L, "B!"), (3L, "c"), (4L, "d")))
  }

  test("live Derby: rollback discards an uncommitted upsert batch " +
    "(reference commit/rollback flow, query_sync_table.py:102-129)") {
    val c = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      c.createStatement().executeUpdate(
        "CREATE TABLE dim_tx (id BIGINT PRIMARY KEY, name VARCHAR(64))")
      c.setAutoCommit(false)
      val cols = Seq("id", "name"); val keys = Seq("id")
      val sql = JdbcUpsertSink.DerbyMergeDialect.sql("dim_tx", cols, keys)
      val ps = c.prepareStatement(sql)
      Seq(Seq[Any](1L, "x"), Seq[Any](2L, "y")).foreach { row =>
        JdbcUpsertSink.DerbyMergeDialect.params(row, cols, keys)
          .zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
        ps.addBatch()
      }
      ps.executeBatch()
      c.rollback()
      c.setAutoCommit(true)
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM dim_tx")
      rs.next()
      assert(rs.getLong(1) == 0L, "rolled-back batch must not persist")
      // and the same statement commits when asked to
      c.setAutoCommit(false)
      JdbcUpsertSink.DerbyMergeDialect.params(Seq[Any](7L, "kept"), cols, keys)
        .zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
      ps.addBatch(); ps.executeBatch(); c.commit()
      val rs2 = c.createStatement().executeQuery(
        "SELECT id, name FROM dim_tx")
      rs2.next()
      assert((rs2.getLong(1), rs2.getString(2)) == ((7L, "kept")))
      c.commit() // close() refuses while a (read) transaction is open
    } finally c.close()
  }
}
