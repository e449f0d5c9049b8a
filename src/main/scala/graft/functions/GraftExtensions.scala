package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-function registration for the engine's custom Catalyst expressions,
  * so `spark.sql("SELECT kusto_decimal_plain(d) ...")` works alongside the
  * Column API — the `SparkSessionExtensions` integration path for custom
  * expression libraries.
  *
  * Two entry points:
  *   - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (applies at session build time),
  *   - `GraftFunctions.register(spark)` for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftFunctions {

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder)

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("kusto_decimal_plain",
      "decimal -> plain (never scientific) string, reference decimal_to_string") {
      args => DecimalPlainString(args.head)
    },
    fn("kusto_bytes_array",
      "binary -> array of unsigned byte numbers, reference bytes_to_value") {
      args => BinaryToIntArray(args.head)
    },
    fn("kusto_double_text",
      "double -> shortest round-trip text (ryu), NaN/Inf -> null") {
      args => RyuDoubleString(args.head, csv = false)
    },
    fn("kusto_double_csv",
      "double -> ryu text with trailing zeros stripped (reference CSV form)") {
      args => RyuDoubleString(args.head, csv = true)
    },
    fn("kusto_json",
      "struct -> Kusto-semantics JSON object text (sorted keys, NaN->null, ...)") {
      args => KustoJsonExpr(args.head, KustoRenderOptions())
    },
    fn("simhash64", "array<string> -> 64-bit SimHash over distinct tokens") {
      args => SimHash64(args.head)
    },
    fn("vec_dot",
      "array<double> x array<double> -> dot product; codegen'd fused loop," +
        " null on length mismatch or null element") {
      args => VecDot(args.head, args(1))
    },
    fn("sorted_intersect_count",
      "two SORTED-distinct array<bigint> -> overlap count; zero-allocation" +
        " merge scan (the prefix-filter join's verify loop)") {
      args => SortedIntersectCount(args.head, args(1))
    },
    fn("sorted_intersect_atleast",
      "sorted_intersect_count(a, b) when it can reach m, else -1 —" +
        " early-exit verify for threshold filters (exact for passing rows)") {
      args => SortedIntersectAtLeast(args.head, args(1), args(2))
    },
    fn("divide_unsigned",
      "64-bit unsigned long division (u64 reinterpret, /0 -> null)") {
      args => DivideUnsigned(args.head, args(1))
    },
    fn("zorder_key",
      "Morton interleave of two bigints' low 32 bits (Z-order clustering sort key)") {
      args => ZorderKey(args.head, args(1))
    },
    fn("rolling_hash64", "string -> 64-bit Rabin-Karp polynomial fingerprint") {
      args => RollingHash64(args.head)
    },
    fn("fnv64",
      "string -> 64-bit FNV-1a of the UTF-8 bytes (engine-independent," +
        " oracle-replicable — the fuzzy-dedup shingle key)") {
      args => Fnv64Expr(args.head)
    },
    fn("mix64",
      "bigint -> murmur3 fmix64 finalizer (full-avalanche bijection;" +
        " the MinHash family is mix64(key ^ seed_j))") {
      args => Mix64(args.head)
    },
    fn("bigram_keys",
      "array<string> tokens -> sorted distinct fnv64 keys of adjacent" +
        " bigrams \"x y\" — fused, no bigram string materialized") {
      args => BigramKeys(args.head)
    },
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its own
    // runtime-filter injection but does not expose them in the public
    // FunctionRegistry. Registering them makes the semi-join-reduction
    // pattern (build a bloom over the dim keys, pre-filter the fact scan
    // before the exact join) writable as plain SQL — the shape that cuts
    // the fact-side shuffle by the dim selectivity at 100 TB.
    fn("graft_bloom_agg",
      "bloom_filter_agg(xxhash64(key), estItems, numBits) -> bloom binary") {
      args => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args.head, args(1), args(2))
    },
    fn("graft_might_contain",
      "might_contain(bloomBinary, xxhash64(key)); bloom must be a scalar subquery") {
      args => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args.head, args(1))
    }
  )

  /** Register all functions on a live session's function registry. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftShims.registerFunction(spark, id, info, builder)
    }
}
