package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StageMemo

/** The shared-stage memo contract (round 11): the q34 pair-graph stage
  * materializes ONCE per (context, dir) and every later consumer reuses
  * the SAME frame — the documented exemption from the bench's per-query
  * cold-cache protocol. A wrong memo key would either alias scale
  * factors (correctness) or silently rebuild per query (the r10 ~80 s
  * regression class).
  */
class StageMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("stagememo-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("same (dir, stage) returns the SAME frame; build runs once") {
    StageMemo.reset()
    var builds = 0
    def get() = StageMemo(spark, "/tmp/dirA", "s1") {
      builds += 1
      spark.range(0, 10).toDF("id").localCheckpoint()
    }
    val a = get()
    val b = get()
    assert(builds == 1, "second consumer must reuse, not rebuild")
    assert(a eq b, "memo must hand back the identical materialized frame")
    assert(a.count() == 10)
  }

  test("a different dir or stage never aliases") {
    StageMemo.reset()
    val a = StageMemo(spark, "/tmp/dirA", "s1") {
      spark.range(0, 1).toDF("id").localCheckpoint()
    }
    val b = StageMemo(spark, "/tmp/dirB", "s1") {
      spark.range(0, 2).toDF("id").localCheckpoint()
    }
    val c = StageMemo(spark, "/tmp/dirA", "s2") {
      spark.range(0, 3).toDF("id").localCheckpoint()
    }
    assert(a.count() == 1 && b.count() == 2 && c.count() == 3)
    assert(StageMemo.size == 3)
  }

  test("nested stage builds do not deadlock or throw (the computeIfAbsent reentrancy class)") {
    // Real stages NEST: pair_clusters builds on the ngram_pairs memo,
    // incr_admission on delta_sets + shingle_index, sem_members on
    // sem_cells. The original computeIfAbsent implementation threw
    // java.lang.IllegalStateException("Recursive update") on exactly
    // this shape; the double-checked reentrant-lock path must build
    // both stages, once each.
    StageMemo.reset()
    var inner, outer = 0
    val got = StageMemo(spark, "/tmp/dirN", "outer") {
      outer += 1
      val base = StageMemo(spark, "/tmp/dirN", "inner") {
        inner += 1
        spark.range(0, 4).toDF("id").localCheckpoint()
      }
      base.filter(org.apache.spark.sql.functions.col("id") < 2).localCheckpoint()
    }
    assert(got.count() == 2)
    assert(outer == 1 && inner == 1)
    assert(StageMemo.size == 2)
    // and the inner stage is independently reusable afterwards
    val again = StageMemo(spark, "/tmp/dirN", "inner") {
      inner += 1
      spark.range(0, 99).toDF("id").localCheckpoint()
    }
    assert(again.count() == 4 && inner == 1)
  }

  test("build times are EXCLUSIVE of nested builds — nothing double-counted in the bench's stage pricing") {
    // Bench prices each artifact once by summing these; if a parent's
    // time included its nested child's, the chain would be charged
    // twice (the r11 verdict's pricing finding, inverted).
    StageMemo.reset()
    StageMemo.resetBuildTimes()
    StageMemo(spark, "/tmp/dirT", "outerT") {
      val in = StageMemo(spark, "/tmp/dirT", "innerT") {
        Thread.sleep(300)
        spark.range(0, 4).toDF("id").localCheckpoint()
      }
      Thread.sleep(50)
      in.localCheckpoint()
    }
    val bt = StageMemo.buildTimes.toMap
    assert(bt.keySet == Set("outerT", "innerT"))
    assert(bt("innerT") >= 0.3, s"inner build time ${bt("innerT")} must include its own sleep")
    assert(bt("outerT") < 0.3, s"outer exclusive time ${bt("outerT")} must EXCLUDE the nested 300 ms build")
    assert(bt("outerT") >= 0.05)
    // memo reads never add build time
    StageMemo(spark, "/tmp/dirT", "innerT") { fail("memo hit expected"); null }
    assert(StageMemo.buildTimes.toMap == bt)
    StageMemo.resetBuildTimes()
    assert(StageMemo.buildTimes.isEmpty)
  }

  test("a FAILED build pops its timing frame and is never priced; the parent stays exclusive") {
    // ADVICE r12: without try/finally a throwing build leaked its stack
    // frame for the process lifetime, and a parent that caught a nested
    // failure was charged the failed child's wall time as its own
    // exclusive cost. The failed child must (a) not appear in
    // buildTimes (nothing produced to price), (b) still propagate its
    // wall time to the parent's child-sum, and (c) leave the stack
    // balanced so later builds time correctly.
    StageMemo.reset()
    StageMemo.resetBuildTimes()
    StageMemo(spark, "/tmp/dirF", "parentF") {
      try {
        StageMemo(spark, "/tmp/dirF", "childF") {
          Thread.sleep(200)
          throw new RuntimeException("planted build failure")
        }
      } catch { case _: RuntimeException => () } // parent continues
      Thread.sleep(50)
      spark.range(0, 2).toDF("id").localCheckpoint()
    }
    val bt = StageMemo.buildTimes.toMap
    assert(!bt.contains("childF"), s"failed build must not be priced: $bt")
    assert(bt("parentF") < 0.2,
      s"parent exclusive time ${bt("parentF")} must EXCLUDE the failed child's 200 ms")
    assert(bt("parentF") >= 0.05)
    // the failed key stays unmemoized — a retry rebuilds (and the stack
    // is balanced: this top-level build times normally)
    var retried = 0
    StageMemo(spark, "/tmp/dirF", "childF") {
      retried += 1; spark.range(0, 1).toDF("id").localCheckpoint()
    }
    assert(retried == 1, "failed build must not poison the memo")
    assert(StageMemo.buildTimes.toMap.contains("childF"))
    StageMemo.resetBuildTimes()
  }

  test("release(dir) evicts exactly that dir's stages") {
    StageMemo.reset()
    StageMemo(spark, "/tmp/dirR1", "s1") { spark.range(0, 1).toDF("id").localCheckpoint() }
    StageMemo(spark, "/tmp/dirR2", "s1") { spark.range(0, 2).toDF("id").localCheckpoint() }
    StageMemo.release("/tmp/dirR1")
    assert(StageMemo.size == 1)
    var rebuilt = 0
    StageMemo(spark, "/tmp/dirR1", "s1") {
      rebuilt += 1; spark.range(0, 1).toDF("id").localCheckpoint()
    }
    assert(rebuilt == 1, "released entry must rebuild")
    StageMemo(spark, "/tmp/dirR2", "s1") { fail("dirR2 must survive the release"); null }
  }

  test("release(dir) and reset() fire registered companion-cache hooks") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val dereg = StageMemo.onRelease(d => { seen += d; () })
    try {
      StageMemo.release("/tmp/dirHook")
      assert(seen.toList == List("/tmp/dirHook"),
        "a release must reach every registered companion cache")
      // reset() must evict companions too — "" means everything (the
      // r14 review's reset-gap finding)
      StageMemo.reset()
      assert(seen.toList == List("/tmp/dirHook", ""),
        "reset must fire hooks with the clear-everything sentinel")
    } finally dereg()
    StageMemo.release("/tmp/dirHook2")
    assert(seen.size == 2, "a deregistered hook must not fire again")
  }

  test("planted-offset guard FIRES on an oversized corpus, and release(dir) evicts its cached max (ADVICE r13)") {
    // r13 verdict item 7: the require() message documented the guard;
    // this drives it. A corpus whose max doc_id reaches the planted
    // offset must fail loudly at query build time — and after the dir's
    // documents table is REWRITTEN, release(dir) must force the guard
    // to re-read the max instead of validating against the stale cache.
    import graft.operators.CorpusQueries
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-offset").toString
    try {
      // small corpus: guard passes (and caches max=5)
      Seq(5L).toDF("doc_id").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      CorpusQueries.assertPlantedOffset(sp, dir, 20000L)
      // rewrite the SAME dir with an oversized corpus: the stale cached
      // max keeps the guard green (the documented hazard) ...
      Seq(5L, 20001L).toDF("doc_id").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      CorpusQueries.assertPlantedOffset(sp, dir, 20000L)
      // ... until release(dir) evicts it — then the guard must fire
      StageMemo.release(dir)
      val e = intercept[IllegalArgumentException] {
        CorpusQueries.assertPlantedOffset(sp, dir, 20000L)
      }
      assert(e.getMessage.contains("aliases real doc_ids"), e.getMessage)
    } finally {
      StageMemo.release(dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("no memo entry retains exploded corpus-row multiples: shingle_index is grouped df-capped postings") {
    // r11 verdict item 2: the exploded (key, doc) posting rows were the
    // one corpus-row-multiple retention — the first memory ceiling at a
    // larger local sf. The stored artifact is now (h, array<doc>) with
    // rows = distinct cold keys and every array bounded by the df cap.
    StageMemo.reset()
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("q249_incremental_components")(spark, dir).count()
    val idx = StageMemo(spark, dir, "shingle_index") {
      fail("shingle_index must already be memoized by q249"); null
    }
    assert(idx.columns.toSet == Set("h", "docs"))
    assert(idx.schema("docs").dataType.typeName == "array",
      "postings must be grouped to arrays, not exploded rows")
    import org.apache.spark.sql.functions.{countDistinct, max, size => asize}
    val row = idx.agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      countDistinct(org.apache.spark.sql.functions.col("h")),
      max(asize(org.apache.spark.sql.functions.col("docs")))).head()
    assert(row.getLong(0) == row.getLong(1), "exactly one row per distinct key")
    assert(row.getInt(2) <= 256, "every posting array bounded by the df cap")
  }

  test("bm25_postings rows are BLOCKED: no term stores one unbounded array") {
    // A stop word's posting is corpus-sized at scale; the stored
    // artifact blocks by doc-id stride so every row is bounded by
    // construction (the row-size analogue of the shingle df cap).
    StageMemo.reset()
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("q251_bm25")(spark, dir).count()
    val post = StageMemo(spark, dir, "bm25_postings") {
      fail("bm25_postings must already be memoized by q251"); null
    }
    assert(post.columns.toSet == Set("w", "blk", "posting"))
    import org.apache.spark.sql.functions.{col, expr, max, size => asize}
    val row = post.agg(max(asize(col("posting"))),
      max(expr("aggregate(posting, 0L, (a, e) -> " +
        s"a + IF(e.d DIV ${graft.operators.CorpusQueries.Bm25BlockStride} = blk, 0L, 1L))"))).head()
    assert(row.getInt(0) <= graft.operators.CorpusQueries.Bm25BlockStride,
      "every posting block bounded by the stride")
    assert(row.getLong(1) == 0L, "every entry lives in its own doc-id block")
  }

  test("the gate's stage inventory matches Bench.KnownStages exactly (wire-budget tripwire)") {
    // BenchFormatSpec budgets the `st` wire field at KnownStages' width
    // and Bench warns at runtime on unknown names; this test makes the
    // drift a FAILURE: running one representative consumer per stage
    // family must build exactly the known inventory — a new StageMemo
    // call site (or a renamed stage) fails here before it can overflow
    // the wire tail or ship unpriced.
    StageMemo.reset()
    StageMemo.resetBuildTimes()
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q59_dedup_clusters", "q243_bpe_merges", "q244_bpe_encode",
        "q245_incremental_semdedup", "q249_incremental_components",
        "q152_simhash_pairs", "q165_subword_tokens", "q251_bm25",
        "q257_index_compaction", "q259_sem_index_compaction",
        "q264_decremental_shingle_index", "q265_cluster_map_maintenance",
        "q272_pair_graph_compaction"))
      SparkEntry.queries(q)(spark, dir).count()
    val built = StageMemo.buildTimes.map(_._1).toSet
    assert(built == Bench.KnownStages.toSet,
      s"stage inventory drift — built-but-unknown: ${(built -- Bench.KnownStages).toSeq.sorted}; " +
        s"known-but-unbuilt: ${(Bench.KnownStages.toSet -- built).toSeq.sorted}")
  }

  test("the pair-graph consumers share one materialized stage end-to-end") {
    // q59 (clusters) then q188 (health): both sit on the memoized pairs
    // + clusters; after the first the memo holds the stage and the
    // second must not rebuild (observable: the memo size is stable and
    // results agree with the first run).
    StageMemo.reset()
    val dir = "/root/testdata/sf0.001"
    val c1 = SparkEntry.queries("q59_dedup_clusters")(spark, dir).count()
    val sizeAfterFirst = StageMemo.size
    val c2 = SparkEntry.queries("q59_dedup_clusters")(spark, dir).count()
    assert(c1 == c2)
    assert(StageMemo.size == sizeAfterFirst,
      "re-running a consumer must not add memo entries")
    assert(sizeAfterFirst >= 2, "pairs + clusters stages expected in the memo")
  }
}
