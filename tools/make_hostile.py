#!/usr/bin/env python3
"""Build the hostile-population corpus variant (round-15 addition).

Copies an sf dir and injects edge-case documents the clean harness
never produces — empty text, whitespace-only, single-char, unicode
multi-byte, regex metacharacters, mixed whitespace, a long repetitive
doc, a same-symbol run, exact duplicates, and rows landing in the
mod-10/mod-7 erasure/admission cohorts — then the full Verify +
compare_oracle cycle runs against it:

    python3 tools/make_hostile.py [srcSfDir] [outDir]
    sbt -batch "runMain graft.Verify <outDir> target/vhostile"
    python3 tools/compare_oracle.py <outDir> target/vhostile

Doc ids stay in 9900..9931 — above every real harness id and below the
PlantedOffset (10000) so the planted-slice guard holds. This sweep
found two real divergence classes on first run (r15): the BPE chain's
slice(-1) crash on the empty word (DuckDB degrades to [] where Spark
throws) and q40's codepoint-vs-byte oracle mismatch on unicode.
"""
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/hostile"

HOSTILE = [
    (9900, "", "en", "src0"),                         # empty text
    (9901, "   ", "en", "src1"),                      # whitespace-only
    (9902, "x", "de", "src3"),                        # single 1-char token
    (9903, "héllo wörld ünïcöde tôkens",
     "fr", "src4"),                                   # unicode multi-byte
    (9904, "a.b (c) [d] e* f+ g? h|i j\\k", "en", "src0"),  # regex metachars
    (9905, "tab\tseparated\tand  double  spaced", "es", "src6"),
    (9906, " ".join(f"tok{i % 97}" for i in range(5000)), "en", "src7"),
    (9907, "x " * 200, "zh", "src9"),                 # same-symbol run
    (9909, "erase me cohort nine", "en", "src11"),    # %10==9 RTBF cohort
    (9914, "second cohort four here", "de", "src13"), # %10==4 era-2 cohort
    (9919, "both cohorts nine again", "en", "src16"),
    (9910, "admit cohort seven three", "en", "src18"),
    (9924, "overlap text for id 9924", "fr", "src19"),
    (9908, "duplicate payload of doc 9911", "en", "src0"),
    (9911, "duplicate payload of doc 9911", "en", "src1"),  # exact dup pair
    (9912, None, "en", "src3"),                             # NULL text
    (9913, "null metadata row", None, None),                # NULL lang+source
]


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    con = duckdb.connect()
    # embeddings: zero-norm (cosine x/0), float-extreme, tiny-denormal,
    # exact-duplicate, sign-mirrored, NULL embedding, NULL label. Ids
    # 9000+ stay under every planted offset (+100000/+200000/+400000);
    # 9002 lands in the %5==2 erasure cohort.
    con.sql(f"""
    COPY (
      SELECT vec_id, embedding, label
      FROM read_parquet('{SRC}/embeddings.parquet')
      UNION ALL SELECT 9000,
        CAST(list_transform(range(64), i -> 0.0) AS FLOAT[]), 0
      UNION ALL SELECT 9002,
        CAST(list_transform(range(64), i -> 1e-30) AS FLOAT[]), 1
      UNION ALL SELECT 9005,
        CAST(list_transform(range(64), i -> 1e30) AS FLOAT[]), 2
      UNION ALL SELECT 9010,
        (SELECT embedding FROM read_parquet('{SRC}/embeddings.parquet')
         WHERE vec_id = 0), 0
      UNION ALL SELECT 9015,
        (SELECT CAST(list_transform(embedding, x -> -x) AS FLOAT[])
         FROM read_parquet('{SRC}/embeddings.parquet')
         WHERE vec_id = 1), 1
      UNION ALL SELECT 9020, NULL, 0
      UNION ALL SELECT 9025,
        CAST(list_transform(range(64), i -> 0.25) AS FLOAT[]), NULL
      ORDER BY vec_id
    ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
    """)
    # events: NULL user/value/props, NULL and empty event_type,
    # malformed JSON props, an extreme negative value.
    con.sql(f"""
    COPY (
      SELECT event_id, ts, user_id, event_type, value, props
      FROM read_parquet('{SRC}/events.parquet')
      UNION ALL SELECT 9000, TIMESTAMP '2024-01-01 05:00:00', NULL,
        'click', 5.0, '{{"k": 1}}'
      UNION ALL SELECT 9001, TIMESTAMP '2024-01-01 05:01:00', 7,
        NULL, NULL, NULL
      UNION ALL SELECT 9002, TIMESTAMP '2024-01-01 05:02:00', 7,
        'unknown_kind', -1e18, '{{"k": '
      UNION ALL SELECT 9003, TIMESTAMP '2024-01-01 05:03:00', 7,
        '', 0.0, '{{}}'
      UNION ALL SELECT 9004, NULL, 7, 'click', 1.0, '{{"k": 2}}'
      ORDER BY event_id
    ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
    """)
    def lit(v):
        return "NULL" if v is None else "'" + v.replace("'", "''") + "'"

    rows = ",".join(
        "(%d, %s, %s, %s)" % (i, lit(t), lit(l), lit(s))
        for i, t, l, s in HOSTILE)
    con.sql(f"""
    COPY (
      SELECT doc_id, text, lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet')
      UNION ALL
      SELECT doc_id, text, lang, source,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM (VALUES {rows}) v(doc_id, text, lang, source)
      ORDER BY doc_id
    ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
    """)
    n = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{OUT}/documents.parquet')"
    ).fetchone()[0]
    print(f"hostile corpus at {OUT}: {n} documents "
          f"({len(HOSTILE)} injected)")


if __name__ == "__main__":
    main()
