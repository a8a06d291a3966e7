package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relationship graphs derived from the corpus
  * (SURVEY.md §2 block M). Complements the C6 connected-components
  * machinery (Dedup.scala) with score-propagation algorithms; the
  * iteration count is fixed and small, so each pass is an unrolled
  * join + aggregate Catalyst can plan — no driver-side loop state
  * beyond plan construction, no collect anywhere.
  */
object GraphOps {

  // ---------------------------------------------------------------- M1
  /** PageRank (damping 0.85, 3 fixed iterations) over the supplier
    * co-supply graph: suppliers are adjacent when they ship the same
    * part. Edge generation never self-joins the fact table: per-part
    * supplier sets aggregate ONCE (bounded arrays), the a<b pair
    * stream is emitted map-side (the A32 device), and the symmetric
    * closure is a union of projections. Each iteration is one
    * edges⋈scores join (both sides keyed on the node id) + one dst
    * aggregate; scores round to 10 dp per iteration so both engines
    * iterate on identical IEEE inputs, and the published score rounds
    * to 6 dp. Dangling nodes cannot occur (undirected edges ⇒ every
    * node has degree ≥ 1); isolated suppliers (never co-supplying)
    * are out of scope by definition of the graph.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    val und = parts
      .select(explode(expr(
        """flatten(transform(ss, (x, i) ->
          |  transform(slice(ss, i + 2, size(ss) - i - 1),
          |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("src"), col("p.b").as("dst"))
      .distinct()
    val edges = und.union(und.select(col("dst").as("src"),
      col("src").as("dst"))).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    val tot = deg.agg(count(lit(1)).as("n"))
    var r = deg.crossJoin(broadcast(tot))
      .select(col("src").as("node"), round(lit(1.0) / col("n"), 10).as("pr"))
    for (_ <- 1 to 3) {
      r = edges
        .join(r, edges("src") === r("node"))
        .join(deg, "src")
        .select(col("dst"), (col("pr") / col("degree")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(tot))
        .select(col("dst").as("node"),
          round(lit(0.15) / col("n") + lit(0.85) * col("s"), 10).as("pr"))
    }
    r.join(deg, r("node") === deg("src"))
      .select(col("node").as("s_suppkey"), col("degree"),
        round(col("pr"), 6).as("pagerank"))
  }

  val qPagerankSql: String =
    """WITH e0 AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
      |und AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
      |  FROM e0 a JOIN e0 b ON a.pk = b.pk AND a.sk < b.sk),
      |edges AS (SELECT src, dst FROM und
      |  UNION ALL SELECT dst, src FROM und),
      |deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY 1),
      |tot AS (SELECT count(*) AS n FROM deg),
      |r0 AS (SELECT node, round(CAST(1.0 AS DOUBLE) / n, 10) AS pr FROM deg, tot),
      |r1 AS (SELECT e.dst AS node,
      |    round((SELECT CAST(0.15 AS DOUBLE) / n FROM tot)
      |      + CAST(0.85 AS DOUBLE) * sum(r.pr / d.degree), 10) AS pr
      |  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.node
      |  GROUP BY e.dst),
      |r2 AS (SELECT e.dst AS node,
      |    round((SELECT CAST(0.15 AS DOUBLE) / n FROM tot)
      |      + CAST(0.85 AS DOUBLE) * sum(r.pr / d.degree), 10) AS pr
      |  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.node
      |  GROUP BY e.dst),
      |r3 AS (SELECT e.dst AS node,
      |    round((SELECT CAST(0.15 AS DOUBLE) / n FROM tot)
      |      + CAST(0.85 AS DOUBLE) * sum(r.pr / d.degree), 10) AS pr
      |  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.node
      |  GROUP BY e.dst)
      |SELECT r3.node AS s_suppkey, deg.degree, round(r3.pr, 6) AS pagerank
      |FROM r3 JOIN deg ON r3.node = deg.node""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _))

  def oracle: Map[String, String] = Map(
    "q_pagerank" -> qPagerankSql)
}
