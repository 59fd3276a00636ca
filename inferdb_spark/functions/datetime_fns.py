"""Datetime scalar functions, normalized to PostgreSQL semantics.

The reference extracts hour/minute/month/week/dow/isodow in generated SQL
(src/featurizers/create_featurizer_pg.py:236-241;
sql_scripts/query_integration.sql:9-12).  PG `dow` is 0=Sunday..6=Saturday,
`isodow` 1=Monday..7=Sunday; Spark's `dayofweek` is 1=Sunday..7=Saturday —
these helpers do the off-by-one normalization once, in one place
(SURVEY.md §7 known-hard item 5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pg_dow(ts: Column) -> Column:
    """PostgreSQL extract(dow): 0=Sunday .. 6=Saturday."""
    return F.dayofweek(ts) - 1


def pg_isodow(ts: Column) -> Column:
    """PostgreSQL extract(isodow): 1=Monday .. 7=Sunday."""
    return ((F.dayofweek(ts) + 5) % 7) + 1


def day_name(ts: Column) -> Column:
    """TRIM(to_char(ts,'Day')) equivalent (sql_scripts/query_integration.sql:9)."""
    return F.date_format(ts, "EEEE")


def is_weekend(ts: Column) -> Column:
    """dow in (0,6) (sql_scripts/query_integration.sql:11) as 0/1 int."""
    return F.dayofweek(ts).isin(1, 7).cast("int")


def week_hour(ts: Column) -> Column:
    """weekday*24 + hour with Monday=0 weekday, the reference's engineered
    feature (src/featurizers/nyc_rides_featurizer.py:326-327)."""
    return (pg_isodow(ts) - 1) * 24 + F.hour(ts)


def datetime_features(ts: Column) -> dict[str, Column]:
    """The full extraction family used by the featurizers."""
    return {
        "hour": F.hour(ts),
        "minute": F.minute(ts),
        "month": F.month(ts),
        "week": F.weekofyear(ts),
        "dow": pg_dow(ts),
        "isodow": pg_isodow(ts),
        "day_name": day_name(ts),
        "is_weekend": is_weekend(ts),
        "week_hour": week_hour(ts),
    }
