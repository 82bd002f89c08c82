package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed Mission node (load_memgraph.py:82-95 property set). */
final case class MissionNode(
    id: String, mission_number: String, title: String, comments: Seq[String])

/** One IS_PARENT_TO edge. */
final case class MissionEdge(src: String, dst: String)

final case class GraphStats(nodes: Long, edges: Long)

/** Property-graph loader: parses the reference's Cypher block shape
  * (cypher_queries_clean.json — 3,443 blocks of exactly three statements:
  * MERGE parent node + SET props, MERGE child node + SET props, MERGE
  * parent-[:IS_PARENT_TO]->child) into node/edge DataFrames.
  *
  * Cypher MERGE idempotency becomes set semantics (SURVEY A28):
  * re-running a load MUST change nothing, so nodes dedup by id with
  * last-writer-wins on the highest block index (a deterministic tiebreak —
  * the reference replays statements in file order), and edges dedup on
  * (src, dst). Parsing is per-block imperative string work, i.e. genuine
  * `flatMap` territory (ingestion, not the query hot path); everything
  * downstream is DataFrame ops.
  */
object GraphPipeline {

  // Unanchored patterns: the reference's edge statement packs three MERGEs
  // onto one line (`MERGE (parent:Mission {id:'x'}) MERGE (child:…) MERGE
  // (parent)-[:IS_PARENT_TO]->(child)`, cypher_queries_clean.json), and id
  // colons appear both with and without a following space. A node's SET
  // clause extends until the next MERGE on the same line (lookahead).
  private val NodeRe =
    ("""MERGE \((\w+):Mission \{id:\s*'([^'\\]*(?:\\.[^'\\]*)*)'\}\)""" +
      """(?: SET (.*?))?(?=\s*MERGE |\s*$)""").r
  private val EdgeRe =
    """MERGE \((\w+)\)-\[:(\w+)\]->\((\w+)\)""".r
  // Property values: a quoted string or a quoted-string list (quotes may
  // contain escaped apostrophes and, inside lists, ']' characters).
  private val PropRe =
    ("""\w+\.(\w+) = ('([^'\\]*(?:\\.[^'\\]*)*)'""" +
      """|\[\s*(?:'[^'\\]*(?:\\.[^'\\]*)*'(?:\s*,\s*'[^'\\]*(?:\\.[^'\\]*)*')*)?\s*\])""").r
  private val StrRe = """'([^'\\]*(?:\\.[^'\\]*)*)'""".r

  private def unescape(s: String): String = s.replace("\\'", "'")

  /** Parse one block's statements into (vars→nodes, edges). Propless
    * re-MERGEs of an already-seen variable (the edge line's node mentions)
    * must not clobber parsed properties; a later SET replays over earlier
    * state, like sequential Cypher execution. */
  def parseBlock(block: String): (Seq[(String, MissionNode)], Seq[(String, String)]) = {
    val nodes = scala.collection.mutable.LinkedHashMap[String, MissionNode]()
    val edges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    block.split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
      NodeRe.findAllMatchIn(line).foreach { nm =>
        val (v, id, propsOrNull) = (nm.group(1), nm.group(2), nm.group(3))
        var number = ""; var title = ""; var comments = Seq.empty[String]
        Option(propsOrNull).foreach { props =>
          PropRe.findAllMatchIn(props).foreach { m =>
            val (key, raw) = (m.group(1), m.group(2))
            key match {
              case "mission_number" => number = unescape(m.group(3))
              case "title" => title = unescape(m.group(3))
              case "comments" =>
                comments = StrRe.findAllMatchIn(raw).map(x => unescape(x.group(1))).toSeq
              case _ => ()
            }
          }
        }
        val parsed = MissionNode(unescape(id), number, title, comments)
        // A propless re-MERGE of a known var (edge line) keeps its props;
        // a MERGE with SET replays over earlier state, like Cypher.
        if (propsOrNull != null || !nodes.contains(v)) nodes(v) = parsed
      }
      EdgeRe.findAllMatchIn(line).foreach(m => edges += m.group(1) -> m.group(3))
    }
    (nodes.toSeq, edges.toSeq)
  }

  /** A30: ingest the reference's JSON shape (array of {"cypher": block})
    * via spark.read.json, then parse/dedup as in load. */
  def loadFromJson(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    load(spark, spark.read.option("multiLine", "true").json(path)
      .select("cypher").as[String])
  }

  /** A30: ingest the reference's CSV shape — header `cypher_json`, each
    * cell a JSON string `{"cypher": <block>}` with escaped quotes
    * (load_memgraph.py:17-26) — then parse/dedup as in load. */
  def loadFromCsv(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val blocks = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
      .select(get_json_object(col("cypher_json"), "$.cypher").as("cypher"))
      .filter(col("cypher").isNotNull)
      .as[String]
    load(spark, blocks)
  }

  /** Blocks → (nodes, edges) DataFrames with MERGE/dedup semantics. */
  def load(spark: SparkSession, blocks: Dataset[String]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val indexed = blocks.rdd.zipWithIndex.toDF("block", "block_idx")
    val parsed = indexed.as[(String, Long)].flatMap { case (b, idx) =>
      val (ns, es) = parseBlock(b)
      val vars = ns.toMap
      val nodeRows = ns.map { case (_, n) => (idx, n, Option.empty[MissionEdge]) }
      val edgeRows = es.flatMap { case (sv, dv) =>
        for (s <- vars.get(sv); d <- vars.get(dv))
          yield (idx, null.asInstanceOf[MissionNode], Option(MissionEdge(s.id, d.id)))
      }
      nodeRows ++ edgeRows
    }.toDF("block_idx", "node", "edge")

    // Last-writer-wins by block order ≡ replaying MERGE+SET sequentially.
    val nodes = parsed.filter(col("node").isNotNull)
      .select(col("block_idx"), col("node.*"))
      .groupBy("id")
      .agg(
        max_by(struct(col("mission_number"), col("title"), col("comments")),
          col("block_idx")).as("p"))
      .select(col("id"), col("p.mission_number"), col("p.title"), col("p.comments"))

    val edges = parsed.filter(col("edge").isNotNull)
      .select(col("edge.src").as("src"), col("edge.dst").as("dst"))
      .dropDuplicates("src", "dst")

    (nodes, edges)
  }

  /** q134: the A28/A30 ingest surface as an ORACLED corpus query. A
    * cypher_queries_clean.json-shaped block per order — the reference's
    * exact 3-statement MERGE shape with string-array comments
    * (load_memgraph.py:46-95) — is synthesized from customer×orders,
    * round-tripped through the REAL parser ([[parseBlock]]) and
    * MERGE-dedup [[load]], then verified with the A29 double equi-join;
    * every output number is arithmetic DuckDB reproduces straight from
    * the tables, so the whole parse→dedup→join pipeline is
    * hash-checked at the reference corpus's scale (the %4 slice ≈ 3.7k
    * blocks at sf0.01, matching its 3,443). Apostrophe escaping is exercised by the
    * parser specs; this synthetic text carries none.
    *
    * Scale shape: block synthesis is a narrow projection; parsing is a
    * per-block flatMap (ingest, not the query path); node dedup is one
    * id-keyed aggregate; the verification join shuffles on node id.
    * Nothing collects to the driver. */
  private def graphLoadQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = graft.Tables.load(s, d, "customer")
    val ords = graft.Tables.load(s, d, "orders")
    // Sized to the reference corpus's shape: the o_orderkey % 4 slice
    // gives ~3.7k blocks at the verify SF (the reference file has
    // 3,443) and keeps bench cost proportional to the ingest the
    // reference actually performs, while the parse/dedup/join machinery
    // still sees every statement form at every SF.
    val blocks = ords.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(concat(
        lit("MERGE (parent:Mission {id:'C"), col("c_custkey"),
        lit("'}) SET parent.mission_number = '"), col("c_custkey"),
        lit("', parent.title = 'Customer "), col("c_name"),
        lit("', parent.comments = []\n"),
        lit("MERGE (child:Mission {id:'O"), col("o_orderkey"),
        lit("'}) SET child.mission_number = '"), col("o_orderkey"),
        lit("', child.title = '"), col("o_orderpriority"),
        lit("', child.comments = ["),
        array_join(transform(split(col("o_orderpriority"), "-"),
          w => concat(lit("'"), w, lit("'"))), ", "),
        lit("]\n"),
        lit("MERGE (parent:Mission {id:'C"), col("c_custkey"),
        lit("'}) MERGE (child:Mission {id:'O"), col("o_orderkey"),
        lit("'}) MERGE (parent)-[:IS_PARENT_TO]->(child)")).as("cypher"))
    val (nodes, edges) = load(s, blocks.as[String])
    edges
      .join(nodes.select(col("id").as("src"),
        col("title").as("parent_title")), "src")
      .join(nodes.select(col("id").as("dst"),
        col("title").as("child_title"),
        col("mission_number").as("child_number"),
        col("comments").as("child_comments")), "dst")
      .groupBy("src", "parent_title")
      .agg(count(lit(1)).as("n_children"),
        countDistinct("child_title").as("n_prio"),
        sum(size(col("child_comments"))).cast("long").as("comment_items"),
        sum(col("child_number").cast("long")).cast("long").as("orderkey_sum"))
      .orderBy("src")
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q134_graph_load", graphLoadQuery,
      Some("SELECT 'C' || c_custkey AS src, " +
        "'Customer ' || c_name AS parent_title, " +
        "COUNT(*) AS n_children, " +
        "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio, " +
        "CAST(SUM(len(string_split(o_orderpriority, '-'))) AS BIGINT) AS comment_items, " +
        "CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE o_orderkey % 4 = 0 " +
        "GROUP BY 1, 2 ORDER BY src")))

  /** The reference's verification queries (load_memgraph.py:78-95): node
    * count, edge count, and the sample double equi-join (A29). */
  def verify(nodes: DataFrame, edges: DataFrame): (GraphStats, DataFrame) = {
    val sample = edges
      .join(nodes.select(col("id").as("src"), col("title").as("parent_title")), "src")
      .join(nodes.select(col("id").as("dst"), col("title").as("child_title")), "dst")
      .select("src", "parent_title", "dst", "child_title")
      .orderBy("src", "dst")
      .limit(5)
    (GraphStats(nodes.count(), edges.count()), sample)
  }
}
