"""SQL-defined scalar functions — the SQL-surface twin of math_fns/hashing.

The reference installs its scalar library as plpgsql/SQL UDFs once per
database (`create_aux_functions`, src/transpiler.py:135-166) so generated
queries can call them by name.  The Spark analog is SQL-DEFINED functions
(CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>): they inline
into the Catalyst plan as ordinary expressions (a plain Project inside
whole-stage codegen — verified in tests), so unlike Python UDFs they cost
nothing at 100 TB and keep predicate pushdown/codegen intact.

Definitions mirror the Column-expression versions in math_fns.py /
hashing.py exactly; tests assert SQL-path == Column-path row-for-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DEFS = [
    # sigmoid: src/transpiler.py:1612,1646 (reference), math_fns.sigmoid
    """CREATE OR REPLACE TEMPORARY FUNCTION sigmoid(x DOUBLE) RETURNS DOUBLE
       RETURN 1.0 / (1.0 + exp(-x))""",
    # crazy_exp: sql_scripts/crazy_exp.sql:1-20 (clamped exp), math_fns.crazy_exp
    """CREATE OR REPLACE TEMPORARY FUNCTION crazy_exp(x DOUBLE) RETURNS DOUBLE
       RETURN CASE WHEN x < 0 THEN 0.0
                   WHEN x < 700.0 THEN exp(x)
                   ELSE exp(700.0) END""",
    # relu: src/transpiler.py:1741-1743
    """CREATE OR REPLACE TEMPORARY FUNCTION relu(x DOUBLE) RETURNS DOUBLE
       RETURN greatest(0.0d, x)""",
    # cross-engine-safe ln(1+x) (math_fns.ln1p_compat)
    """CREATE OR REPLACE TEMPORARY FUNCTION ln1p_compat(x DOUBLE) RETURNS DOUBLE
       RETURN ln(1.0 + x)""",
    # portable 52-bit md5-prefix hash (hashing.h52)
    """CREATE OR REPLACE TEMPORARY FUNCTION h52(s STRING) RETURNS BIGINT
       RETURN CAST(conv(substring(md5(s), 1, 13), 16, 10) AS BIGINT)""",
]


def register_sql_functions(spark: SparkSession) -> None:
    """Install the scalar library into the session's SQL surface."""
    for ddl in _DEFS:
        spark.sql(ddl)
