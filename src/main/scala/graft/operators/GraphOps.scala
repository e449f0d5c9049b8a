package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star rounds
  * (the MapReduce CC algorithm of Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC 2014): each round is two
  * groupBy-min + join passes over the EDGE set, and the edge set
  * contracts toward one star per component rooted at the component's
  * minimum node in O(log² n) rounds — independent of component
  * DIAMETER. That is the property plain min-label propagation lacks: a
  * duplicate-chain of depth d (doc A ~ B ~ C ~ … — transitive near-dup
  * chains are real in versioned/boilerplate corpora) needs d
  * propagation rounds but only ~log d star rounds, so this is the
  * escalation path q59 takes when its propagation cap trips instead of
  * failing the query.
  *
  * Scale shape: state is always the edge list (never adjacency lists,
  * never collected); every round shuffles edges once per star pass on
  * the center key with map-side partial min; distinct() keeps the set
  * contracting; localCheckpoint truncates the per-round lineage like
  * q59's propagation loop does.
  */
object GraphOps {

  /** (node, cluster) for every node in `edges`, cluster = min node id of
    * the component. `edges` is any (src, dst) pair list (direction and
    * duplicates irrelevant; self-loops ignored). Throws if the edge set
    * has not reached star fixpoint within `maxRounds` (2·log² n rounds
    * is the paper's bound — 60 covers any graph that fits on hardware).
    */
  def starComponents(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()

    // canonical undirected edge set: a < b, no self-loops, no dups
    var cur = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()

    // fixpoint detection: (count, xxhash64 checksum) of the canonical
    // set — one tiny aggregate per round, no edge-set except() pass.
    // A checksum collision would need 2^-64 luck on non-adversarial
    // data; the alternative is an extra edges-sized anti-join per round.
    // The hash sum accumulates as decimal(38,0): a long sum of 64-bit
    // hashes overflows (an ERROR under ANSI mode, silent wrap otherwise).
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)), sum(xxhash64(col("a"), col("b"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }

    // one star pass: center u over both edge directions, m = min of the
    // closed neighborhood; LARGE connects strictly-larger neighbors to
    // m, SMALL connects smaller neighbors AND u itself to m. Emitted
    // pairs are canonical by construction (m <= u and m <= every v).
    def pass(es: DataFrame, large: Boolean): DataFrame = {
      val nbrs = es.select(col("a").as("u"), col("b").as("v"))
        .union(es.select(col("b").as("u"), col("a").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("m"))
      val withM = nbrs.join(mins, Seq("u"))
      val out =
        if (large) withM.filter(col("v") > col("u"))
          .select(col("m").as("a"), col("v").as("b"))
        else withM.filter(col("v") < col("u"))
          .select(col("m").as("a"), col("v").as("b"))
          .union(mins.select(col("m").as("a"), col("u").as("b")))
      out.filter(col("a") =!= col("b")).distinct()
    }

    var prev = sig(cur)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = pass(pass(cur, large = true), large = false).localCheckpoint()
      val s = sig(next)
      converged = s == prev
      prev = s
      cur = next
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"large-star/small-star did not reach star fixpoint in $round rounds")

    // fixpoint = disjoint stars rooted at each component's min node:
    // every leaf b carries exactly one (root a, b) edge; roots (and any
    // node isolated by self-loop-only input) label themselves.
    nodes.join(cur.select(col("b").as("node"), col("a").as("cluster")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster"), col("node")).as("cluster"))
  }
}
