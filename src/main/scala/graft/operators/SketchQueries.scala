package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-accelerated and clustering operators: bloom-filter semi-join
  * reduction, Misra-Gries heavy hitters with exact confirmation,
  * exponential time-decay scoring, and the Lloyd assignment step of
  * k-means over the embedding corpus. The reference (a file converter,
  * `/root/reference/pq2json/src/converter.rs`) has none of these; each is
  * the Spark-first shape of a pattern a 100 TB training-data pipeline
  * leans on: make the big side of the computation cheap (pre-filter,
  * sketch, broadcast) and keep the exact pass small.
  */
object SketchQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- bloom-filter semi-join reduction. Spark's own runtime-filter
    // rule (InjectRuntimeFilter) builds exactly this plan shape when it
    // fires; writing it explicitly makes the reduction unconditional and
    // testable. The build side aggregates the selective dim keys into ONE
    // bloom binary (partial agg per partition, tiny merge); the probe is
    // a scalar subquery, so the fact scan filters rows BEFORE the exact
    // semi-join — at 100 TB the fact-side shuffle shrinks by the dim
    // selectivity (here ~1/5) for the cost of shipping a ~50 KB bloom to
    // each task. The trailing IN removes bloom false positives, so the
    // result is exactly the semi-join and stays oracle-checkable.
    "q91_bloom_semijoin" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "orders").createOrReplaceTempView("orders_q91")
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q91")
      s.sql(
        """WITH bf AS (
          |  SELECT graft_bloom_agg(xxhash64(o_orderkey), 50000L, 400000L) AS b
          |  FROM orders_q91 WHERE o_orderpriority = '1-URGENT')
          |SELECT l_returnflag, COUNT(*) AS n,
          |       round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 2)
          |         AS sum_qty
          |FROM lineitem_q91
          |WHERE graft_might_contain((SELECT b FROM bf), xxhash64(l_orderkey))
          |  AND l_orderkey IN (SELECT o_orderkey FROM orders_q91
          |                     WHERE o_orderpriority = '1-URGENT')
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // --- heavy hitters: Misra-Gries sketch pass -> exact confirmation
    // pass. The sketch ([[graft.functions.FrequentItems]]) guarantees its
    // candidate set CONTAINS every token above the N/k threshold, so the
    // second pass only has to count candidate tokens: the broadcast
    // candidate join filters map-side, and the confirming groupBy
    // shuffles O(candidates), never O(distinct tokens). That two-pass
    // shape is the point at 100 TB — an exact global token groupBy
    // shuffles the whole vocabulary; this shuffles ≤2k sketch rows per
    // partition plus the candidate counts. Output is exact (sketch only
    // proposes; counts come from the data), hence hash-oracled.
    "q92_heavy_hitters" -> ((s, dir) => {
      // k ties the sketch's containment guarantee (> N/k survives) to the
      // confirmation threshold (cnt * k > N) — they must move together
      val k = 100
      val mg = udaf(new graft.functions.FrequentItems.MisraGries(k),
        org.apache.spark.sql.Encoders.STRING)
      val toks = Tables.documents(s, dir)
        .select(explode(expr(LlmQueries.toksSql)).as("token"))
      // sketch and stream length ride ONE corpus pass (same aggregation)
      val cand = toks.agg(mg(col("token")).as("cand"),
          count(lit(1)).as("n_total"))
        .select(explode(map_keys(col("cand"))).as("token"), col("n_total"))
      toks.join(broadcast(cand), Seq("token"))
        .groupBy(col("token"), col("n_total")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(k.toLong) > col("n_total"))
        .select(col("token"), col("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
    }),

    // --- exponential time-decay engagement score: recent events count
    // more, half-life-style weight exp(-age/7d) anchored at the corpus
    // max timestamp (deterministic — no wall clock in the query). One
    // scan, one partial-aggregated groupBy(user); the single-row anchor
    // rides a broadcast nest-loop join, so nothing about the shape
    // changes at 100 TB. Integer micros arithmetic until the one final
    // division keeps both engines' inputs to exp() bit-identical.
    "q93_time_decay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val anchor = ev.agg(max(unix_micros(col("ts"))).as("amax"))
      ev.crossJoin(anchor)
        .withColumn("w",
          exp((col("amax") - unix_micros(col("ts"))).cast("double") /
            lit(-604800000000.0)))
        .groupBy(col("user_id"))
        // exact DECIMAL(38,6) intermediate: order-insensitive double sum
        // (see RelationalQueries scaladoc float-portability rule)
        .agg(round(sum((col("value") * col("w"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .cast("double"), 4).as("score"),
          count(lit(1)).as("n_events"))
        .orderBy(col("score").desc, col("user_id").asc)
        .limit(100)
    }),

    // --- top-k per group WITHOUT a window sort: the bounded-heap TopK
    // Aggregator ([[graft.functions.TopKAggregator]]) keeps ≤ k pairs per
    // partial buffer, so no partition ever sorts a full group — the
    // shuffle carries O(groups × k). row_number().over(window) does the
    // same job by sorting every group's rows; at 100 TB that sort (and
    // its spill) is the cost this operator deletes. posexplode turns the
    // per-group array back into ranked rows; the window form is the
    // oracle, so the two formulations are proven equivalent.
    "q107_topk_per_group" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator.TopK(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderstatus"), posexplode(col("top")))
        .select(col("o_orderstatus"), (col("pos") + 1).cast("long").as("rnk"),
          col("col._1").as("o_totalprice"), col("col._2").as("o_orderkey"))
        .orderBy(col("o_orderstatus"), col("rnk"))
    }),

    // --- mergeable distinct-count rollup (Datasketches HLL): one sketch
    // per group, then the corpus-wide distinct from UNIONING the sketches
    // — never rescanning the data. This re-aggregatability is what q45's
    // approx_count_distinct can't do and what a 100 TB reporting stack
    // needs: daily/per-source sketches persist, and any ad-hoc rollup
    // (week, region, ALL) is a union of kilobyte sketches. Estimates are
    // checked against exact counts in-query (the q45 contract pattern),
    // so the output is deterministic and hash-oracled.
    "q97_hll_rollup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sk = ev.groupBy(col("event_type")).agg(
        hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_users"))
      val per = sk.select(col("event_type"), col("exact_users"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_users"))
          .cast("double") / col("exact_users") <= lit(0.05)).as("hll_ok"))
      val total = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(ev.agg(countDistinct(col("user_id")).as("exact_users")))
        .select(lit("ALL").as("event_type"), col("exact_users"),
          (abs(col("est") - col("exact_users")).cast("double") /
            col("exact_users") <= lit(0.05)).as("hll_ok"))
      per.union(total).orderBy(col("event_type"))
    }),

    // --- k-means Lloyd assignment step over the embedding corpus:
    // centroids = the vec_id < 8 vectors (deterministic seed, the
    // k-means|| stand-in), every vector assigned to its nearest centroid
    // by squared L2. The centroid table broadcasts; the corpus is
    // scanned once and never exchanged until the k-row final agg — the
    // same shape as q37/q46, and the building block the full iterative
    // k-means (re-estimate centroids with the q46 Centroid UDAF, loop)
    // composes from. d2 = <v,v> - 2<v,c> + <c,c> keeps the float ops
    // identical to the oracle's list_dot_product formulation.
    "q94_kmeans_assign" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // codegen'd VecDot, bit-identical to the HOF fold it replaced
      val dot = "vec_dot(%s, %s)"
      val e = LlmQueries.vecTable(s, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("v").as("c"))
      // nearest-centroid argmin as a partial-agged min(struct(d2, cid))
      // — the q127 shape: one row per vector leaves the map side, so
      // the n x k pair stream from the broadcast cross join is never
      // hash-exchanged (a row_number window keyed by vec_id would
      // shuffle all n x k rows to discard k-1 of every k). (d2, cid)
      // is unique per vector, so the tie-break (cid asc) is exact.
      e.crossJoin(broadcast(cents))
        .withColumn("d2",
          expr(dot.format("v", "v")) - lit(2.0) * expr(dot.format("v", "c")) +
            expr(dot.format("c", "c")))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("m.cid").as("cid"), col("m.d2").as("d2"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"),
          // decimal-exact sum / count instead of avg(double): accumulation
          // order can't move the hash (float-portability rule)
          round((sum(sqrt(greatest(col("d2"), lit(0.0)))
              .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
              .cast("double") / count(lit(1))), 4).as("mean_dist"))
        .orderBy(col("cid"))
    }),

    // --- a FULL k-means Lloyd iteration: q94's assignment step plus the
    // centroid re-estimation it feeds — assign every vector to its
    // nearest seed (broadcast cross join, argmin as the partial-agged
    // min(struct), vector payload riding along), then recompute each
    // cluster's centroid with the CentroidFixed UDAF. The re-estimation
    // is the step that makes k-means trainable at 100 TB, and its scale
    // property is exactly CentroidFixed's: fixed-point component sums
    // partial-aggregate map-side, so the only exchange after assignment
    // carries k x partitions small buffers — never vectors. Per-cluster
    // `shift` (seed -> new centroid L2) is the convergence metric the
    // training loop stops on; every float op after the bit-deterministic
    // centroid is a fixed sequence the oracle replays (the q46
    // convention), which is what lets a clustering ITERATION be
    // hash-gated cross-engine rather than rows-only.
    "q138_kmeans_lloyd" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val dot = "vec_dot(%s, %s)"
      val e = LlmQueries.vecTable(s, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val seeds = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("v").as("c"))
      // (d2, cid) is unique per vector, so the struct comparison never
      // reaches the v payload (same argument as q46's cell assignment)
      val assigned = e.crossJoin(broadcast(seeds))
        .withColumn("d2",
          expr(dot.format("v", "v")) - lit(2.0) * expr(dot.format("v", "c")) +
            expr(dot.format("c", "c")))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"), col("v"))).as("m"))
        .select(col("m.cid").as("cid"), col("m.v").as("v"))
      val centroid = udaf(new graft.functions.VectorAggregators.CentroidFixed(64))
      assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), centroid(col("v")).as("nc"))
        .join(broadcast(seeds), Seq("cid"))
        .withColumn("dv", expr("zip_with(nc, c, (a, b) -> a - b)"))
        .select(col("cid"), col("n"),
          round(expr("sqrt(vec_dot(dv, dv))"), 6).as("shift"),
          round(expr("sqrt(vec_dot(nc, nc))"), 6).as("new_norm"))
        .orderBy(col("cid"))
    }),

    // --- deterministic k-means seeding (farthest-first traversal, the
    // derandomized k-means++ variant): anchor at vec_id 0, then 4 rounds
    // of "pick the vector farthest from every seed chosen so far". This
    // is the missing first act of the q94/q138 training loop — seeds that
    // cover the space instead of 8 arbitrary vectors. Scale shape per
    // round: the running (vec_id, v, dmin) state localCheckpoints (so
    // round r never recomputes rounds < r — the q114 convention), the
    // argmax is the q127 partial-agg max(struct) (ONE row leaves the map
    // side; a global sort/limit would range-exchange the corpus), and the
    // picked seed re-enters as a broadcast 1-row cross join. k sequential
    // linear scans, zero corpus exchanges, which is exactly how
    // farthest-first behaves on a 1000-executor cluster. Float parity:
    // d2 keeps q94's op sequence, the running min is least() in both
    // engines, radius = round(sqrt(dmin), 6) only at output.
    "q141_kmeans_seed" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val dot = "vec_dot(%s, %s)"
      def d2(v: String, c: String) =
        expr(dot.format(v, v)) - lit(2.0) * expr(dot.format(v, c)) +
          expr(dot.format(c, c))
      val e = LlmQueries.vecTable(s, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val anchor = e.filter(col("vec_id") === 0).select(col("v").as("c"))
      var state = e.crossJoin(broadcast(anchor))
        .withColumn("dmin", d2("v", "c"))
        .select(col("vec_id"), col("v"), col("dmin"))
        .localCheckpoint()
      var out: DataFrame = null
      for (r <- 1 to 4) {
        // argmax dmin, tie toward the smaller vec_id: max(struct(dmin,
        // -vec_id)) — (dmin, -vec_id) is unique, the v payload rides
        val pick = state
          .agg(max(struct(col("dmin"), (-col("vec_id")).as("nid"),
            col("v"))).as("m"))
          .select(lit(r).as("round"), (-col("m.nid")).as("seed_id"),
            // greatest(.,0): d2's float cancellation can go slightly
            // negative for a vector ~identical to a seed — DuckDB
            // errors on sqrt(negative) where Spark returns NaN (the
            // q94 guard, r14 review; oracle mirrored)
            round(sqrt(greatest(col("m.dmin"), lit(0.0))), 6).as("radius"),
            col("m.v").as("c"))
          .localCheckpoint()
        out = if (out == null) pick.drop("c")
              else out.unionByName(pick.drop("c"))
        if (r < 4) state = state.crossJoin(broadcast(pick.select(col("c"))))
          .withColumn("dmin", least(col("dmin"), d2("v", "c")))
          .select(col("vec_id"), col("v"), col("dmin"))
          .localCheckpoint()
      }
      out.orderBy(col("round"))
    }),

    // --- embedding-space class-separability audit: the centroid cosine
    // confusion matrix a pipeline inspects before trusting labels (or
    // cluster assignments) for curriculum/mixing decisions — label pairs
    // whose centroids nearly coincide are candidates for merging, and a
    // label whose centroid sits close to another's explains classifier
    // confusion. Scale shape: ONE corpus scan into per-label
    // CentroidFixed partial aggs (bit-deterministic fixed-point sums, so
    // the matrix is hash-gateable), then the pairwise cosine runs on the
    // labels x labels table — k² rows where k is the label count, never
    // corpus-sized. The broadcast self-join of the tiny centroid table
    // is the k-means-scale analogue of q134's source-pair sketch matrix.
    "q143_centroid_confusion" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = LlmQueries.vecTable(s, dir)
        .select(col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val centroid = udaf(new graft.functions.VectorAggregators.CentroidFixed(64))
      val cents = e.groupBy(col("label")).agg(centroid(col("v")).as("c"))
        .withColumn("nrm", expr("sqrt(vec_dot(c, c))"))
        .localCheckpoint() // probe AND broadcast sides both read it —
                           // unmaterialized, the corpus centroid agg
                           // ran twice (r14 review; the q231 pattern)
      val a = cents.select(col("label").as("label_a"), col("c").as("ca"),
        col("nrm").as("na"))
      val b = cents.select(col("label").as("label_b"), col("c").as("cb"),
        col("nrm").as("nb"))
      a.join(broadcast(b), col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(expr("vec_dot(ca, cb)") / (col("na") * col("nb")), 6)
            .as("cos_sim"))
        .orderBy(col("label_a"), col("label_b"))
    }),

    // --- embedding centroid drift: the vector-space sibling of q136's
    // language-mix drift — per label, the L1 distance between the
    // centroids of two content-hash snapshot halves (the monitoring
    // query that catches an embedding-model version skew or a poisoned
    // ingest batch before it trains). NO float rounding anywhere:
    // per-dim sums are the CentroidFixed fixed-point integers (floor
    // (x·2^32), exact DECIMAL/HUGEINT sums), and the half-vs-half
    // difference clears denominators — |se/(2^32·ne) - so/(2^32·no)|
    // becomes |se·no - so·ne| over 2^32·ne·no — so the ONLY division
    // is the final half-up onto the 1e-6 grid. Scale shape: dims
    // explode map-side into a partial-agged (label, half, dim) sum
    // whose exchange is labels x 2 x 64 rows at ANY corpus size; the
    // halves join and the per-label reduce touch only that table.
    "q156_centroid_drift" -> ((s, dir) => {
      val e = LlmQueries.vecTable(s, dir)
        .select(col("label"),
          expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 2)," +
            " 16, 10) AS INT) % 2").as("half"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
            " * 4294967296.0) AS DECIMAL(38,0)))").as("fx"))
      val sums = e.select(col("label"), col("half"),
          posexplode(col("fx")).as(Seq("d", "x")))
        .groupBy(col("label"), col("half"), col("d"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .localCheckpoint() // both half-filters below read it — the
                           // unmaterialized form ran the corpus
                           // posexplode+agg twice (r14 review)
      val ev = sums.filter(col("half") === 0).select(col("label"), col("d"),
        col("sx").as("se"), col("n").as("ne"))
      val od = sums.filter(col("half") === 1).select(col("label"), col("d"),
        col("sx").as("so"), col("n").as("no"))
      ev.join(od, Seq("label", "d"))
        .withColumn("num", abs(col("se") * col("no") - col("so") * col("ne")))
        .groupBy(col("label"))
        .agg(max(col("ne")).as("n_even"), max(col("no")).as("n_odd"),
          sum(col("num")).as("numsum"))
        // the 2^32·n_even·n_odd terms cast to DECIMAL before
        // multiplying: pure-BIGINT they wrapped at ~32k vectors per
        // half per label (r14 review; the oracle is HUGEINT)
        .withColumn("drift_micro", expr(
          "(2 * numsum * 1000000 + 4294967296 * CAST(n_even AS DECIMAL(38,0)) * n_odd)" +
            " DIV (2 * 4294967296 * CAST(n_even AS DECIMAL(38,0)) * n_odd)"))
        .select(col("label"), col("n_even"), col("n_odd"),
          (col("drift_micro").cast("double") / 1000000.0).as("drift_l1"))
        .orderBy(col("label"))
    }),

    // --- embedding diversity without the pair explosion (q202): mean
    // pairwise dot product per label, EXACTLY, in one scan — the
    // mode-collapse / near-duplicate-cluster detector (a label whose
    // vectors all point the same way has mean pair dot ≈ mean self
    // dot). The algebraic identity Σ_{i≠j} vi·vj = ‖Σvi‖² − Σ‖vi‖²
    // turns the O(n²) pairwise sum into per-dimension sums: fixed-
    // point components (floor(x·2^20), exact DECIMAL sums — the q156
    // discipline) aggregate to (label, dim) rows carrying Σfx and
    // Σfx², then S² = Σ_d (Σfx)² and Q = Σ_d Σfx² close the identity.
    // Exchange: labels × 64 rows at ANY corpus size. The pair mean is
    // SIGNED: the half-up grid division runs on |num| with the sign
    // reapplied (Spark DIV truncates; DuckDB // is version-dependent
    // on negatives, 1.0.0 truncates, others floor — the signed
    // rule from the verify notes, applied identically in the oracle).
    "q202_embedding_diversity" -> ((s, dir) => {
      val e = LlmQueries.vecTable(s, dir)
        .filter(col("embedding").isNotNull) // same rule as q231
        .select(col("label"), posexplode(expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
            " * 1048576.0) AS DECIMAL(38,0)))")))
        .toDF("label", "dim", "fx")
      e.groupBy(col("label"), col("dim"))
        .agg(sum(col("fx")).as("sd"), sum(expr("fx * fx")).as("qd"),
          count(lit(1)).as("nv"))
        .groupBy(col("label"))
        .agg(sum(expr("sd * sd")).as("s2"), sum(col("qd")).as("q"),
          max(col("nv")).as("n"))
        .withColumn("self_micro", expr(
          "(2 * q * 1000000 + CAST(n AS DECIMAL(38,0)) * 1099511627776) DIV " +
            "(2 * CAST(n AS DECIMAL(38,0)) * 1099511627776)"))
        .withColumn("pnum", expr("s2 - q"))
        .withColumn("pden", expr(
          "CAST(n AS DECIMAL(38,0)) * (n - 1) * 1099511627776"))
        .withColumn("pair_micro", expr(
          "IF(n < 2, CAST(0 AS BIGINT), CAST(" +
            "IF(pnum < 0, -1, 1) * " +
            "((2 * abs(pnum) * 1000000 + pden) DIV (2 * pden)) " +
            "AS BIGINT))"))
        .select(col("label"), col("n").cast("long").as("n_vecs"),
          (col("self_micro").cast("double") / 1000000.0)
            .as("mean_self_dot"),
          (col("pair_micro").cast("double") / 1000000.0)
            .as("mean_pair_dot"))
        .orderBy(col("label"))
    }),

    // --- embedding health audit (q224): the vector QA pass that runs
    // BEFORE any ANN index build — null vectors, NaN elements, ragged
    // dimensions, zero-norm rows (all of which silently poison cosine
    // math downstream) plus the norm² distribution, per label. One
    // map-side pass: every per-vector statistic (dim, NaN scan, fixed-
    // point norm² on the q202 2^20 grid — exact DECIMAL, order-free) is
    // a row-local array fold, and the only exchange is the labels-
    // bounded aggregate. Norms are reported as norm² on the 1e-6 grid
    // (no sqrt — engine-exact beats prettier units).
    "q224_embedding_health" -> ((s, dir) =>
      embeddingHealth(LlmQueries.vecTable(s, dir))),

    // --- class-separation audit (q231): the Fisher discriminant ratio
    // per embedding dimension — between-class scatter over within-class
    // scatter, the LDA-style separability readout that tells you whether
    // labels are even recoverable from the embedding space BEFORE
    // training a probe (and which dimensions carry the signal; pairs
    // with q224's health audit and q143's centroid confusion). Exact to
    // the last bit: vectors quantize once to the 2^16 grid, per-(label,
    // dim) moments (n, Σx, Σx²) are integer partial aggs whose exchange
    // is bounded by labels × dims — never the corpus — and both
    // scatters clear denominators per class: within_c = (n_c·ΣQ − S²)/
    // n_c, between_c = (S·N − T·n_c)²/(n_c·N²), each half-up-divided
    // per class THEN summed (integer sums are order-free, so the
    // per-class rounding is deterministic under any partitioning).
    // fisher = between/within on the 1e-6 grid. DECIMAL(38,0)
    // everywhere a product of two corpus-scale integers appears.
    "q231_class_separation" -> ((s, dir) =>
      // explicit NULL-row filter, mirrored by the oracle's WHERE: the
      // engine dropped NULL embeddings only incidentally (posexplode
      // of transform(NULL) emits nothing) while the oracle's CROSS
      // JOIN counted them (r14 review; latent — testdata is clean)
      classSeparation(LlmQueries.vecTable(s, dir)
        .filter(col("embedding").isNotNull)
        .select(col("label"), expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0D) AS BIGINT))")
          .as("f")))
        .orderBy(col("dim"))),

    // --- int8 scalar-quantization audit (q234): the SQ8 compression
    // every large ANN deployment applies before indexing (FAISS
    // IVF-SQ8) — per-dimension affine codes c = round((x−min)·255/
    // range) — evaluated BEFORE committing the index: per-dim range,
    // the worst and mean reconstruction error, and the analytic bound
    // max_err <= range/510 + 1/2 the spec certifies. Exact end-to-end:
    // vectors quantize once to the 2^16 grid, per-dim min/max is a
    // 64-row partial-agged exchange, codes/dequant/error are map-side
    // integer half-up divisions against the broadcast 64-row stats,
    // and the error rollup is dim-bounded. Two corpus passes, both
    // map-side-combined — nothing scales super-linearly.
    "q234_sq8_audit" -> ((s, dir) =>
      sq8Audit(LlmQueries.vecTable(s, dir)
        .filter(col("embedding").isNotNull) // same rule as q231
        .select(expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0D) AS BIGINT))")
          .as("f")))
        .orderBy(col("dim")))
  )

  /** q234's engine over an (f: array&lt;bigint&gt;) quantized frame —
    * factored so the spec can plant closed-form ranges (constant dim
    * -> all codes 0, zero error; a planted line -> exact code/error
    * table; every dim obeys max_err <= range DIV 510 + 1). Returns one
    * row per 1-based dim: (dim, n_vecs, mn, mx, max_err,
    * mean_err_milli as double mean_err). */
  private[graft] def sq8Audit(quantized: DataFrame): DataFrame = {
    val el = quantized
      .select(posexplode(col("f")).as(Seq("i", "x")))
    val stats = el.groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
        count(lit(1)).as("n"))
    el.join(broadcast(stats), Seq("i"))
      // code = half-up((x-mn)*255/range); range 0 -> code 0. Operands
      // non-negative (x >= mn), so DIV (truncate) == // (floor).
      .withColumn("r", col("mx") - col("mn"))
      .withColumn("c", expr(
        "IF(r = 0, 0L, (2 * (x - mn) * 255 + r) DIV (2 * r))"))
      .withColumn("dq", expr(
        "mn + IF(r = 0, 0L, (2 * c * r + 255) DIV (2 * 255))"))
      .withColumn("err", abs(col("x") - col("dq")))
      .groupBy(col("i"))
      .agg(first(col("mn")).as("mn"), first(col("mx")).as("mx"),
        first(col("n")).as("n"), max(col("err")).as("max_err"),
        sum(col("err")).as("serr"))
      .withColumn("mean_err_milli", expr(
        "(2 * serr * 1000 + n) DIV (2 * n)"))
      .select((col("i") + 1).cast("long").as("dim"),
        col("n").cast("long").as("n_vecs"), col("mn"), col("mx"),
        col("max_err").cast("long").as("max_err"),
        (col("mean_err_milli").cast("double") / 1e3).as("mean_err"))
  }

  /** q231's engine over a (label, f: array&lt;bigint&gt;) quantized frame —
    * factored so the spec can plant closed-form geometries (two
    * point-mass classes -> within = 0; identically-distributed classes
    * -> between = 0). Returns one row per dimension (1-based):
    * (dim, within, between, fisher_ppm as double fisher). */
  private[graft] def classSeparation(quantized: DataFrame): DataFrame = {
    val mom = quantized
      .select(col("label"), posexplode(col("f")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(count(lit(1)).as("nc"),
        sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"))
      .localCheckpoint() // labels × dims rows; feeds two rollups
    val tot = mom.groupBy(col("i"))
      .agg(sum(col("nc")).cast("long").as("nn"), sum(col("s")).as("t"))
    mom.join(broadcast(tot), Seq("i"))
      // per-class scatter terms, denominators cleared, half-up per class
      .withColumn("w_c", expr(
        "(2 * (CAST(nc AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s) + nc) " +
          "DIV (2 * CAST(nc AS DECIMAL(38,0)))"))
      .withColumn("bnum", expr(
        "(CAST(s AS DECIMAL(38,0)) * nn - CAST(t AS DECIMAL(38,0)) * nc)"))
      .withColumn("b_c", expr(
        "(2 * bnum * bnum + CAST(nc AS DECIMAL(38,0)) * nn * nn) " +
          "DIV (2 * CAST(nc AS DECIMAL(38,0)) * nn * nn)"))
      .groupBy(col("i"))
      .agg(sum(col("w_c")).as("within_d"), sum(col("b_c")).as("between_d"))
      .withColumn("fisher_ppm", expr(
        "IF(within_d = 0, CAST(NULL AS BIGINT), " +
          "CAST((2 * between_d * 1000000 + within_d) DIV (2 * within_d) AS BIGINT))"))
      .select((col("i") + 1).cast("long").as("dim"),
        col("within_d").cast("long").as("within"),
        col("between_d").cast("long").as("between"),
        (col("fisher_ppm").cast("double") / 1e6).as("fisher"))
  }

  /** q224's engine over any (label, embedding array<float>) frame —
    * factored so the spec can plant null / NaN / zero-norm vectors and
    * prove each counter fires. */
  private[graft] def embeddingHealth(emb: DataFrame): DataFrame = {
      val e = emb
        .withColumn("dim",
          when(col("embedding").isNull, lit(-1)).otherwise(size(col("embedding"))))
        .withColumn("has_nan", coalesce(
          expr("exists(embedding, x -> isnan(CAST(x AS DOUBLE)))"), lit(false)))
        .withColumn("q2", when(col("embedding").isNull || col("has_nan"),
          lit(null)).otherwise(expr(
            "aggregate(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
              " * 1048576.0) AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))," +
              " (acc, v) -> acc + v * v)")))
      e.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("embedding").isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan"),
          min(when(col("dim") >= 0, col("dim"))).as("dim_min"),
          max(col("dim")).as("dim_max"),
          sum(when(col("q2") === 0, 1L).otherwise(0L)).as("n_zero_norm"),
          min(col("q2")).as("min_q2"), sum(col("q2")).as("sum_q2"))
        // 2^40 fixed-point scale back to the 1e-6 grid: min and mean
        .withColumn("min_norm2", expr(
          "CAST((2 * min_q2 * 1000000 + 1099511627776) DIV " +
            "(2 * CAST(1099511627776 AS DECIMAL(38,0))) AS BIGINT)")
          .cast("double") / 1e6)
        .withColumn("mean_norm2", expr(
          "CAST((2 * sum_q2 * 1000000 + CAST(n_vecs AS DECIMAL(38,0)) * 1099511627776) DIV " +
            "(2 * CAST(n_vecs AS DECIMAL(38,0)) * 1099511627776) AS BIGINT)")
          .cast("double") / 1e6)
        .select(col("label"), col("n_vecs"), col("n_null"), col("n_nan"),
          col("dim_min"), col("dim_max"), col("n_zero_norm"),
          col("min_norm2"), col("mean_norm2"))
        .orderBy(col("label"))
  }

  def oracles: Map[String, String] = Map(
    "q91_bloom_semijoin" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 2)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q92_heavy_hitters" ->
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |t AS (SELECT COUNT(*) AS n_total FROM tk),
        |c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY token)
        |SELECT token, cnt FROM c, t WHERE cnt * 100 > n_total
        |ORDER BY cnt DESC, token ASC""".stripMargin,
    "q93_time_decay" ->
      """WITH a AS (SELECT MAX(epoch_us(ts)) AS amax FROM events)
        |SELECT user_id,
        |  round(CAST(SUM(CAST(value * exp(CAST(a.amax - epoch_us(ts) AS DOUBLE)
        |        / -604800000000.0) AS DECIMAL(38,6))) AS DOUBLE), 4) AS score,
        |  COUNT(*) AS n_events
        |FROM events, a
        |GROUP BY user_id
        |ORDER BY score DESC, user_id ASC LIMIT 100""".stripMargin,
    "q107_topk_per_group" ->
      """WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |FROM orders)
        |SELECT o_orderstatus, rnk, o_totalprice, o_orderkey
        |FROM r WHERE rnk <= 3 ORDER BY o_orderstatus, rnk""".stripMargin,
    "q97_hll_rollup" ->
      """WITH p AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |           FROM events GROUP BY event_type),
        |t AS (SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS exact_users
        |      FROM events)
        |SELECT event_type, exact_users, TRUE AS hll_ok FROM p
        |UNION ALL SELECT event_type, exact_users, TRUE AS hll_ok FROM t
        |ORDER BY event_type""".stripMargin,
    "q94_kmeans_assign" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.cid,
        |        list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)
        |          + list_dot_product(c.c, c.c) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |        ORDER BY d2 ASC, cid ASC) AS rnk FROM d)
        |SELECT cid, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(sqrt(greatest(d2, 0)) AS DECIMAL(38,6))) AS DOUBLE)
        |    / COUNT(*), 4) AS mean_dist
        |FROM a WHERE rnk = 1 GROUP BY cid ORDER BY cid""".stripMargin,
    // q94's assignment CTEs + the q46 fixed-point centroid replication:
    // new centroids are exact integer sums of floor(x * 2^32), so both
    // engines compute bit-identical vectors; shift/new_norm replay the
    // engine's float op sequence (elementwise diff, then the same
    // index-order dot-product fold).
    "q138_kmeans_lloyd" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.cid, e.v,
        |        list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)
        |          + list_dot_product(c.c, c.c) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |        ORDER BY d2 ASC, cid ASC) AS rnk FROM d),
        |asg AS (SELECT vec_id, cid, v FROM a WHERE rnk = 1),
        |idx AS (SELECT unnest(range(1, 65)) AS i),
        |comp AS (SELECT cid, i, CAST(floor(v[i] * 4294967296.0) AS BIGINT) AS fx
        |         FROM asg CROSS JOIN idx),
        |cent AS (SELECT cid, i, sum(fx) AS sm, count(*) AS n
        |         FROM comp GROUP BY cid, i),
        |m AS (SELECT cid, MAX(n) AS n,
        |        list(CAST(sm AS DOUBLE) / 4294967296.0 / n ORDER BY i) AS ncv
        |      FROM cent GROUP BY cid),
        |j AS (SELECT m.cid, m.n, m.ncv,
        |        list_transform(range(1, 65), i -> m.ncv[i] - c.c[i]) AS dv
        |      FROM m JOIN c USING (cid))
        |SELECT cid, n,
        |  round(sqrt(list_dot_product(dv, dv)), 6) AS shift,
        |  round(sqrt(list_dot_product(ncv, ncv)), 6) AS new_norm
        |FROM j ORDER BY cid""".stripMargin,
    // The engine's per-round loop unrolled: state s_r carries the running
    // min distance to seeds 0..r-1, pick p_r is the ORDER BY dmin DESC,
    // vec_id ASC LIMIT 1 formulation of the engine's max(struct) argmax,
    // least() and the d2 op sequence match component-for-component.
    "q141_kmeans_seed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c0 AS (SELECT v AS c FROM e WHERE vec_id = 0),
        |s1 AS (SELECT e.vec_id, e.v,
        |         list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c0.c)
        |           + list_dot_product(c0.c, c0.c) AS dmin
        |       FROM e CROSS JOIN c0),
        |p1 AS (SELECT vec_id, v, dmin FROM s1
        |       ORDER BY dmin DESC, vec_id ASC LIMIT 1),
        |s2 AS (SELECT s1.vec_id, s1.v, least(s1.dmin,
        |         list_dot_product(s1.v, s1.v) - 2 * list_dot_product(s1.v, p1.v)
        |           + list_dot_product(p1.v, p1.v)) AS dmin
        |       FROM s1 CROSS JOIN p1),
        |p2 AS (SELECT vec_id, v, dmin FROM s2
        |       ORDER BY dmin DESC, vec_id ASC LIMIT 1),
        |s3 AS (SELECT s2.vec_id, s2.v, least(s2.dmin,
        |         list_dot_product(s2.v, s2.v) - 2 * list_dot_product(s2.v, p2.v)
        |           + list_dot_product(p2.v, p2.v)) AS dmin
        |       FROM s2 CROSS JOIN p2),
        |p3 AS (SELECT vec_id, v, dmin FROM s3
        |       ORDER BY dmin DESC, vec_id ASC LIMIT 1),
        |s4 AS (SELECT s3.vec_id, s3.v, least(s3.dmin,
        |         list_dot_product(s3.v, s3.v) - 2 * list_dot_product(s3.v, p3.v)
        |           + list_dot_product(p3.v, p3.v)) AS dmin
        |       FROM s3 CROSS JOIN p3),
        |p4 AS (SELECT vec_id, v, dmin FROM s4
        |       ORDER BY dmin DESC, vec_id ASC LIMIT 1)
        |SELECT 1 AS round, vec_id AS seed_id, round(sqrt(greatest(dmin, 0)), 6) AS radius
        |FROM p1
        |UNION ALL SELECT 2, vec_id, round(sqrt(greatest(dmin, 0)), 6) FROM p2
        |UNION ALL SELECT 3, vec_id, round(sqrt(greatest(dmin, 0)), 6) FROM p3
        |UNION ALL SELECT 4, vec_id, round(sqrt(greatest(dmin, 0)), 6) FROM p4
        |ORDER BY round""".stripMargin,
    // q46's fixed-point centroid replication, then the same pairwise
    // cosine op sequence the engine runs on the tiny centroid table
    "q143_centroid_confusion" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |idx AS (SELECT unnest(range(1, 65)) AS i),
        |comp AS (SELECT label, i, CAST(floor(v[i] * 4294967296.0) AS BIGINT) AS fx
        |         FROM e CROSS JOIN idx),
        |cent AS (SELECT label, i, sum(fx) AS s, count(*) AS n
        |         FROM comp GROUP BY label, i),
        |cells AS (SELECT label,
        |            list(CAST(s AS DOUBLE) / 4294967296.0 / n ORDER BY i) AS c
        |          FROM cent GROUP BY label),
        |w AS (SELECT label, c, sqrt(list_dot_product(c, c)) AS nrm FROM cells)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  round(list_dot_product(a.c, b.c) / (a.nrm * b.nrm), 6) AS cos_sim
        |FROM w a JOIN w b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,
    "q156_centroid_drift" ->
      """WITH e AS (
        |  SELECT label,
        |    CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) AS INT)
        |      % 2 AS half,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |idx AS (SELECT unnest(range(1, 65)) AS i),
        |comp AS (SELECT label, half, i,
        |           CAST(floor(v[i] * 4294967296.0) AS HUGEINT) AS fx
        |         FROM e CROSS JOIN idx),
        |sums AS (SELECT label, half, i, sum(fx) AS sx, count(*) AS n
        |         FROM comp GROUP BY 1, 2, 3),
        |j AS (SELECT s0.label, s0.i, s0.sx AS se, s0.n AS ne,
        |        s1.sx AS so, s1.n AS "no"
        |      FROM sums s0 JOIN sums s1
        |        ON s0.label = s1.label AND s0.i = s1.i
        |       AND s0.half = 0 AND s1.half = 1),
        |agg AS (SELECT label, max(ne) AS n_even, max("no") AS n_odd,
        |          sum(abs(se * "no" - so * ne)) AS numsum
        |        FROM j GROUP BY 1)
        |SELECT label, n_even, n_odd,
        |  CAST((2 * numsum * 1000000 + 4294967296 * n_even * n_odd)
        |    // (2 * 4294967296::HUGEINT * n_even * n_odd) AS BIGINT)
        |    / 1000000.0 AS drift_l1
        |FROM agg ORDER BY label""".stripMargin,

    // Same identity over the same fixed-point grid; signed half-up on
    // abs(num) with the sign reapplied (// is version-dependent on
    // negatives, DIV truncates —
    // only the abs form agrees on negative half-grid values).
    "q202_embedding_diversity" ->
      """WITH fx AS (
        |  SELECT embeddings.label, r.i AS dim,
        |    CAST(floor(CAST(embeddings.embedding[r.i + 1] AS DOUBLE)
        |      * 1048576.0) AS HUGEINT) AS fx
        |  FROM embeddings CROSS JOIN range(64) r(i)
        |  WHERE embeddings.embedding IS NOT NULL),
        |dims AS (SELECT label, dim, SUM(fx) AS sd, SUM(fx * fx) AS qd,
        |    COUNT(*) AS nv
        |  FROM fx GROUP BY 1, 2),
        |agg AS (SELECT label, SUM(sd * sd) AS s2, SUM(qd) AS q,
        |    MAX(nv) AS n
        |  FROM dims GROUP BY 1)
        |SELECT label, CAST(n AS BIGINT) AS n_vecs,
        |  CAST(CAST((2 * q * 1000000 + n * 1099511627776)
        |    // (2 * n * 1099511627776::HUGEINT) AS BIGINT) AS DOUBLE)
        |    / 1000000.0 AS mean_self_dot,
        |  CAST(CASE WHEN n < 2 THEN 0 ELSE
        |    (CASE WHEN s2 - q < 0 THEN -1 ELSE 1 END) *
        |    ((2 * abs(s2 - q) * 1000000 +
        |      n::HUGEINT * (n - 1) * 1099511627776)
        |     // (2 * n::HUGEINT * (n - 1) * 1099511627776)) END
        |    AS DOUBLE) / 1000000.0 AS mean_pair_dot
        |FROM agg ORDER BY label""".stripMargin,

    "q224_embedding_health" ->
      """WITH v AS (
        |  SELECT label,
        |    CASE WHEN embedding IS NULL THEN -1
        |         ELSE len(embedding) END AS dim,
        |    COALESCE(len(list_filter(embedding,
        |      x -> isnan(CAST(x AS DOUBLE)))) > 0, FALSE) AS has_nan,
        |    embedding
        |  FROM embeddings),
        |q AS (
        |  SELECT label, dim, has_nan,
        |    CASE WHEN embedding IS NULL OR has_nan THEN NULL
        |      ELSE list_sum(list_transform(
        |        list_transform(embedding, x ->
        |          CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS HUGEINT)),
        |        f -> f * f)) END AS q2
        |  FROM v),
        |a AS (
        |  SELECT label, COUNT(*) AS n_vecs,
        |    CAST(SUM(CASE WHEN dim = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_null,
        |    CAST(SUM(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_nan,
        |    MIN(CASE WHEN dim >= 0 THEN dim END) AS dim_min,
        |    MAX(dim) AS dim_max,
        |    CAST(SUM(CASE WHEN q2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero_norm,
        |    MIN(q2) AS min_q2, SUM(q2) AS sum_q2
        |  FROM q GROUP BY 1)
        |SELECT label, n_vecs, n_null, n_nan,
        |  CAST(dim_min AS INT) AS dim_min, CAST(dim_max AS INT) AS dim_max,
        |  n_zero_norm,
        |  CAST(CAST((2 * min_q2 * 1000000 + 1099511627776) //
        |    (2 * 1099511627776::HUGEINT) AS BIGINT) AS DOUBLE) / 1000000.0
        |    AS min_norm2,
        |  CAST(CAST((2 * sum_q2 * 1000000 + n_vecs * 1099511627776) //
        |    (2 * n_vecs::HUGEINT * 1099511627776) AS BIGINT) AS DOUBLE)
        |    / 1000000.0 AS mean_norm2
        |FROM a ORDER BY label""".stripMargin,

    // Per-(label, dim) integer moments, denominators cleared per class,
    // the same per-class half-up rounding, HUGEINT throughout.
    "q231_class_separation" ->
      """WITH e AS (SELECT label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 65536.0) AS BIGINT)) AS f
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |mom AS (SELECT label, t.i AS i, COUNT(*) AS nc,
        |    CAST(SUM(e.f[t.i]) AS HUGEINT) AS s,
        |    SUM(e.f[t.i]::HUGEINT * e.f[t.i]) AS q
        |  FROM e, range(1, 65) t(i) GROUP BY label, t.i),
        |tot AS (SELECT i, CAST(SUM(nc) AS BIGINT) AS nn, SUM(s) AS t
        |  FROM mom GROUP BY i),
        |terms AS (SELECT m.i,
        |    (2 * (m.nc::HUGEINT * m.q - m.s * m.s) + m.nc) //
        |      (2 * m.nc::HUGEINT) AS w_c,
        |    (2 * (m.s * tt.nn - tt.t * m.nc) * (m.s * tt.nn - tt.t * m.nc)
        |      + m.nc::HUGEINT * tt.nn * tt.nn) //
        |      (2 * m.nc::HUGEINT * tt.nn * tt.nn) AS b_c
        |  FROM mom m JOIN tot tt ON m.i = tt.i),
        |agg AS (SELECT i, SUM(w_c) AS within_d, SUM(b_c) AS between_d
        |  FROM terms GROUP BY i)
        |SELECT CAST(i AS BIGINT) AS dim,
        |  CAST(within_d AS BIGINT) AS within,
        |  CAST(between_d AS BIGINT) AS between,
        |  CASE WHEN within_d = 0 THEN NULL
        |    ELSE CAST(CAST((2 * between_d * 1000000 + within_d) //
        |      (2 * within_d) AS BIGINT) AS DOUBLE) / 1000000.0 END
        |    AS fisher
        |FROM agg ORDER BY dim""".stripMargin,

    // Same 2^16 grid, per-dim min/max/range, the two half-up integer
    // divisions (code then dequant), error rollup per dim.
    "q234_sq8_audit" ->
      """WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 65536.0) AS BIGINT)) AS f
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |el AS (SELECT t.i AS i, e.f[t.i] AS x FROM e, range(1, 65) t(i)),
        |st AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n
        |  FROM el GROUP BY i),
        |c AS (SELECT el.i, el.x, st.mn, st.mx, st.n,
        |    st.mx - st.mn AS r,
        |    CASE WHEN st.mx = st.mn THEN 0
        |      ELSE (2 * (el.x - st.mn) * 255 + (st.mx - st.mn)) //
        |        (2 * (st.mx - st.mn)) END AS cd
        |  FROM el JOIN st USING (i)),
        |d AS (SELECT i, x, mn, mx, n,
        |    mn + CASE WHEN r = 0 THEN 0
        |      ELSE (2 * cd * r + 255) // (2 * 255) END AS dq
        |  FROM c),
        |a AS (SELECT i, MIN(mn) AS mn, MIN(mx) AS mx, MIN(n) AS n,
        |    MAX(abs(x - dq)) AS max_err, SUM(abs(x - dq)) AS serr
        |  FROM d GROUP BY i)
        |SELECT CAST(i AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_vecs,
        |  mn, mx, CAST(max_err AS BIGINT) AS max_err,
        |  CAST(CAST((2 * serr::HUGEINT * 1000 + n) //
        |    (2 * n::HUGEINT) AS BIGINT) AS DOUBLE) / 1000.0 AS mean_err
        |FROM a ORDER BY dim""".stripMargin
  )
}
