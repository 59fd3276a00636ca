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


# ---------------------------------------------------------------------------
# unigram-LM (SentencePiece) tokenizer: Viterbi segmentation + one EM round
# (operators/unigram_lm.py; Kudo 2018).  Fixed literal piece inventory in
# BOTH dialects; all DP decisions are integer max-plus with (q DESC,
# l DESC) tie-breaks, so the best path replays bit-identically.

UNI_L = 4  # max piece length
UNI_W = 12  # max word length the oracle DP unrolls to (corpus max is 8)
UNI_PIECES: dict[str, int] = {
    c: -3_000_000 - 997 * i
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz0123456789")
}
UNI_PIECES.update(
    {
        "th": -3_500_000, "he": -3_600_000, "the": -4_200_000,
        "er": -3_400_000, "or": -3_450_000, "ta": -3_470_000,
        "ab": -3_480_000, "le": -3_490_000, "tab": -5_000_000,
        "able": -6_000_000, "row": -4_900_000, "ord": -5_100_000,
        "der": -5_050_000, "ch": -3_430_000, "at": -3_460_000,
        "an": -3_440_000, "sc": -3_420_000, "ba": -3_410_000,
        "st": -3_405_000, "re": -3_415_000, "am": -3_425_000,
        "cust": -6_500_000, "om": -3_435_000, "mer": -5_200_000,
        "que": -5_300_000, "ry": -3_455_000, "in": -3_445_000,
        "dow": -5_150_000, "win": -5_250_000,
    }
)

_UNI_PS_SQL = ", ".join(
    f"('{p}', {s})" for p, s in sorted(UNI_PIECES.items())
)


def _uni_oracle(body: str) -> str:
    from inferdb_spark.operators.unigram_lm import viterbi_sql

    return (
        "WITH w AS (SELECT t AS word, CAST(count(*) AS BIGINT) AS cnt FROM ("
        f"SELECT unnest({_d_tokens('text')}) AS t FROM documents) "
        f"WHERE length(t) <= {UNI_W} GROUP BY t),\n"
        f"ps AS (SELECT * FROM (VALUES {_UNI_PS_SQL}) AS t(piece, score_q)),\n"
        + viterbi_sql(UNI_W, UNI_L)
        + "\n"
        + body
    )


@gate(
    "unigram_segment_apply",
    oracle=_uni_oracle(
        """
    SELECT word, substring(seg, 2) AS pieces,
           CAST(length(string_split(substring(seg, 2), '/')) AS BIGINT)
               AS n_pieces,
           q AS score_q
    FROM fin
    """
    ),
)
def q_unigram_segment_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi segmentation with a FIXED literal piece
    inventory (operators/unigram_lm.unigram_viterbi): max-plus DP over
    integer micro-nat scores as ONE aggregate-HOF projection per word —
    map-only at any scale (the tokenize-the-corpus step of a fitted
    SentencePiece model).  The oracle unrolls the identical DP as one
    CTE per position with ORDER BY q DESC, l DESC argmax."""
    from inferdb_spark.operators.unigram_lm import unigram_viterbi

    d = load_table(spark, sf_dir, "documents")
    from inferdb_spark.functions.text import tokens as _tokens

    words = (
        d.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .where(F.length("word") <= UNI_W)
        .distinct()
    )
    v = unigram_viterbi(F.col("word"), UNI_PIECES, UNI_L)
    return words.select("word", v.alias("_v")).select(
        "word",
        F.col("_v.seg").alias("pieces"),
        F.size(F.split(F.col("_v.seg"), "/")).cast("long").alias("n_pieces"),
        F.col("_v.score_q").cast("long").alias("score_q"),
    )


@gate(
    "unigram_em_round",
    oracle=_uni_oracle(
        """
    , cnts AS (
      SELECT piece, CAST(sum(cnt) AS BIGINT) AS n FROM (
        SELECT cnt, unnest(string_split(substring(seg, 2), '/')) AS piece
        FROM fin)
      GROUP BY piece
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cnts)
    SELECT piece, n,
           CAST(floor((ln(CAST(n AS DOUBLE)) - ln(CAST(tot AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS score_q
    FROM cnts, tot
    """
    ),
)
def q_unigram_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One unigram-LM EM round over the corpus word relation
    (operators/unigram_lm.unigram_em_round): Viterbi E-step projection +
    one piece-count groupBy + quantized ln-ratio M-step — the
    training-replay gate for the SentencePiece trainer (the full
    multi-round fit with seeding/pruning is pytest-parity-checked against
    a pure-Python twin).  Per-round cluster cost is vocabulary-sized;
    driver sees one piece table per round."""
    from inferdb_spark.functions.text import tokens as _tokens
    from inferdb_spark.operators.unigram_lm import unigram_em_round

    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .where(F.length("word") <= UNI_W)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return unigram_em_round(words, UNI_PIECES, UNI_L).select(
        "piece",
        "n",
        F.col("score_q").cast("long").alias("score_q"),
    )
