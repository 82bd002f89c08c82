package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the BPE replace-chain segmentation (q184/q185/
  * BpeEncodeStream): [[graft.operators.TextAnalysis.bpeSeg]] applied to
  * random words with random merge lists must equal an INDEPENDENT
  * direct implementation of Sennrich's greedy apply — merges in learned
  * order, each replacing leftmost non-overlapping occurrences. The
  * replace-chain form rides Spark's `replace` (UTF8String semantics);
  * this spec is the guard that those semantics never drift from the
  * reference algorithm (overlaps, repeated merges, merges built on
  * merged symbols, unicode letters). */
class BpePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bpe-property-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Direct Sennrich greedy apply: word → chars, then per merge (a,b)
    * in order, one leftmost-first non-overlapping pass. */
  private def reference(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("bpeSeg/bpeSyms equal the direct greedy apply on 300 random " +
    "(word, merges) cases — overlaps, merged-symbol merges, unicode") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val alphabets = Seq("ab", "abc", "aé", "xyz")
    val cases = (1 to 300).map { _ =>
      val ab = alphabets(rnd.nextInt(alphabets.length))
      val word = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ab(rnd.nextInt(ab.length))).mkString
      // grow merges the way training does: each merge's sides are
      // symbols producible by the previous merges (chars + prior pairs)
      var symbols = ab.map(_.toString).toVector
      val merges = (1 to rnd.nextInt(4)).map { _ =>
        val a = symbols(rnd.nextInt(symbols.length))
        val b = symbols(rnd.nextInt(symbols.length))
        symbols :+= (a + b)
        (a, b)
      }
      (word, merges)
    }
    // group by merge list so each distinct list is ONE Spark plan
    cases.groupBy(_._2).foreach { case (merges, group) =>
      val words = group.map(_._1)
      val got = words.toDF("word")
        .select(col("word"), graft.operators.TextAnalysis
          .bpeSyms(graft.operators.TextAnalysis
            .bpeSeg(col("word"), merges)).as("syms"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      words.foreach { w =>
        val want = reference(w, merges)
        assert(got(w) == want,
          s"word '$w' merges $merges: got ${got(w)}, want $want")
      }
    }
  }
}
