package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AbttScoreStream

/** The streaming all-but-the-top scorer must reproduce q183 row-for-row
  * on the training corpus (integer grid ⇒ exact equality, not
  * tolerance), stay stateless across micro-batches, and degrade to
  * dot = 0 / residual = self on an empty model. */
class AbttScoreStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-abtt-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming scores across micro-batches equal the batch operator, " +
    "which equals q183; zero stateful operators") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val model = AbttScoreStream.model(spark, sf)
    assert(model.nonEmpty && model.exists(_ != 0L))

    // truth: the oracled corpus entry itself
    val want = SparkEntry.queries("q183_abtt_transform")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val got = AbttScoreStream.scored(vecs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "batch operator diverges from q183")

    // stream the same corpus in two micro-batches
    val dir = Files.createTempDirectory("graft_abtt_stream")
    Seq(0, 1).foreach { p =>
      val part = dir.resolve(s"part$p")
      vecs.filter(pmod(col("vec_id"), lit(2)) === p)
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      Files.move(
        Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"b$p.parquet"))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = AbttScoreStream.scored(stream, model)
      .writeStream.outputMode("append")
      .format("memory").queryName("abtt_out").start()
    q.processAllAvailable() // legal: stateless, no timeout re-triggers
    val streamed = spark.table("abtt_out")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val stateOps = q.recentProgress.map(_.stateOperators.length).sum
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert(stateOps == 0,
      s"abtt scoring must be stateless, saw $stateOps state operators")
    assert(streamed == want, "streaming scores diverge from batch")
  }

  test("empty model: dot = 0 and the residual is the vector itself") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(0.5f, -0.25f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = AbttScoreStream.scored(vecs, Seq.empty)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def g(x: Double) = graft.functions.GridGram.toGrid(x)
    assert(rows(1L) == (0L, g(0.5) * g(0.5) + g(-0.25) * g(-0.25)))
    assert(rows(2L) == (0L, g(1.0) * g(1.0)))
  }
}
