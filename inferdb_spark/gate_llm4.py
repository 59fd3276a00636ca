"""Round-4 LLM-training-data gates: exact substring dedup (Lee et al.
2022) and unigram-LM (SentencePiece-style) tokenizer training.

Same cross-engine discipline as gate_llm3: shared literals in both
dialects, integer/lexicographic decisions only (substring dedup is
float-free end to end), transcendental outputs quantized before any
ordering decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate
from inferdb_spark.gate_prep import _d_tokens

SSD_K = 8  # token window width for exact-substring dedup


@gate(
    "substring_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_d_tokens('text')} AS a FROM documents),
    grams AS (
      SELECT doc_id, s.pos, s.gh FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(a) - {SSD_K} + 1),
                   i -> struct_pack(pos := i - 1,
                       gh := md5(array_to_string(a[i:i+{SSD_K - 1}], ' '))))) AS s
        FROM d WHERE length(a) >= {SSD_K})
    ),
    dup AS (
      SELECT doc_id, pos AS s, pos + {SSD_K - 1} AS e FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
        FROM grams) WHERE rn > 1
    ),
    isl AS (
      SELECT doc_id, s, e,
             sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM (
        SELECT doc_id, s, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_e
        FROM dup)
    ),
    spans AS (
      SELECT doc_id, island, min(s) AS s, max(e) AS e
      FROM isl GROUP BY doc_id, island
    ),
    covered AS (
      SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM spans
    ),
    toks AS (
      SELECT doc_id, s.pos, s.tok FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(a)),
                   i -> struct_pack(pos := i - 1, tok := a[i]))) AS s
        FROM d)
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t LEFT JOIN covered c
        ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           md5(coalesce(r.text_clean, '')) AS clean_md5,
           CAST(length(d.a) AS BIGINT) AS n_tokens,
           CAST(length(d.a) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring removal (operators/textprep.
    substring_dedup; Lee et al. 2022 ExactSubstr at token 8-gram
    granularity): every k-token window whose content occurs earlier in
    global (doc_id, pos) order is excised; first occurrences survive.
    Corpus-linear plan — gram projection is map-only, first-occurrence is
    one groupBy on md5(gram) (128-bit key: no collisions at 100 TB gram
    counts), span merge is the gaps-and-islands window per doc.
    Float-free, so the rebuilt text hashes bit-identically."""
    from inferdb_spark.operators.textprep import substring_dedup

    d = load_table(spark, sf_dir, "documents")
    out = substring_dedup(d, "doc_id", "text", k=SSD_K)
    return out.select(
        "doc_id",
        F.md5(F.col("text_clean")).alias("clean_md5"),
        "n_tokens",
        "n_removed",
    )
