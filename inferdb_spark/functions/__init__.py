from inferdb_spark.functions import datetime_fns, geo, hashing, math_fns, text, vector

__all__ = ["math_fns", "geo", "datetime_fns", "vector", "hashing", "text"]
