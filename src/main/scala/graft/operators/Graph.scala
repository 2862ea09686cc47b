package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl corpora (host-level PageRank — the
  * classic crawl-frontier / quality prior over the host link graph).
  *
  * All arithmetic is INTEGER (rank mass in units of scale^-1, integer
  * division for both the damping and the per-edge contribution), so
  * the result is bit-determined: BIGINT sums are exact and
  * order-independent where floating-point PageRank would differ
  * between engines (and between partitionings) in the last ulp. That
  * is what lets a plain-SQL oracle replay every iteration exactly —
  * and what makes a 100 TB run resumable/comparable across retries.
  *
  * Scale shape: each iteration is one equi-join (edges x ranks,
  * hash-partitioned on the source id) + one hash aggregation (sum of
  * contributions per destination, partials map-side). Hot destinations
  * (the web's power-law in-degree) skew only the ordinary hash-agg
  * way, which partial aggregation already flattens; `localCheckpoint`
  * per iteration truncates the lineage so the plan does not double
  * per round (the q25/DBSCAN pattern).
  */
object Graph {

  /** Host-level link-graph edges extracted straight from the HTML
    * payloads: one (src_host, dst_host, n_links) row per ordered host
    * pair, counting every absolute-href anchor (duplicates are real
    * parallel edges and weight the graph). The feeder for pageRankInt
    * — corpus in, host graph out, one scan + one hash aggregation.
    * Relative links are excluded (base-url resolution is a separate
    * concern); host extraction shares TextOps.urlHost so edges key
    * exactly like the rest of the crawl pipeline.
    */
  def linkEdges(pages: DataFrame, htmlCol: String, urlCol: String): DataFrame =
    pages
      .select(TextOps.urlHost(col(urlCol)).as("src_host"),
        explode(TextOps.extractLinks(col(htmlCol))).as("__href"))
      .where(TextOps.isAbsoluteUrl(col("__href")))
      .select(col("src_host"), TextOps.urlHost(col("__href")).as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Anchor-text index: the terms other pages use when LINKING to a
    * host — the classic off-page relevance signal (anchor text
    * describes the target better than the target describes itself).
    * One pass extracts (href, anchor-text) pairs positionally (two
    * group extractions of the same RE2 pattern zip by occurrence
    * index), absolute hrefs only, anchor text tokenized with the
    * corpus tokenizer; one hash aggregation of (dst_host, term)
    * counts. Feeds BM25-style ranking keyed on the TARGET.
    */
  def anchorTermIndex(pages: DataFrame, htmlCol: String): DataFrame = {
    val s0 = col(htmlCol).cast("string")
    val pat = "<a[^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"
    val toks = (c: org.apache.spark.sql.Column) =>
      filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)
    pages
      .withColumn("__h", regexp_extract_all(s0, lit(pat), lit(1)))
      .withColumn("__t", regexp_extract_all(s0, lit(pat), lit(2)))
      .select(explode(arrays_zip(col("__h"), col("__t"))).as("__z"))
      .select(col("__z.__h").as("href"), col("__z.__t").as("atext"))
      .where(TextOps.isAbsoluteUrl(col("href")))
      .select(TextOps.urlHost(col("href")).as("dst_host"),
        explode(toks(col("atext"))).as("term"))
      .groupBy(col("dst_host"), col("term"))
      .agg(count(lit(1)).as("n"))
  }

  /** Integer PageRank over a directed edge list.
    *
    * Semantics (replayed verbatim by the SQL oracle):
    *   - edges are DISTINCT (a,b) pairs, self-loops dropped;
    *   - nodes = every id incident to a surviving edge;
    *   - r_0(v) = scale DIV n;
    *   - contribution of u along each out-edge = r_t(u) DIV outdeg(u);
    *   - r_{t+1}(v) = (15 * (scale DIV n)) DIV 100
    *                  + (85 * sum_incoming(v)) DIV 100.
    * Dangling nodes simply lose their mass (the standard simplification
    * when ranks are compared, not summed to 1).
    *
    * @return (id, rank) with rank in units of 1/scale, after `iters`
    *         synchronous iterations
    */
  def pageRankInt(edges: DataFrame, aCol: String, bCol: String,
                  iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(false) // lazy: n = nodes.count() materializes it
    val nodes = e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    val r0 = scale / n
    val base = (15L * r0) / 100L
    // out-degree is FUSED into the rank table once, so each iteration
    // is one join instead of two (r5 re-joined the static deg table
    // every round). Dangling nodes carry deg 0 but never match an
    // out-edge in the contribution join, so the placeholder is inert.
    val deg = e.groupBy(col("a")).agg(count(lit(1)).as("__deg"))
    val nodesDeg = nodes
      .join(deg.withColumnRenamed("a", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__deg"), lit(0L)).as("__deg"))
      // eager: every iteration's stages consume nodesDeg; a lazy
      // materialization would race across them
      .localCheckpoint()

    var r = nodesDeg.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val inc = e.join(r.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), expr("r DIV __deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      r = nodesDeg.join(inc, Seq("id"), "left")
        .select(col("id"), col("__deg"),
          (lit(base) + expr("(85 * coalesce(__s, 0L)) DIV 100")).as("r"))
        // LAZY: truncates the logical plan per iteration (the reason
        // the checkpoint exists) without a materialization job each —
        // the consumer's single action computes the chain once, each
        // link persisting as it is computed
        .localCheckpoint(false)
    }
    r.select(col("id"), col("r").as("rank"))
  }
}
