"""linkkchecker_net_spark — a brand-new PySpark-native URL-frontier + fetch
scheduler with the crawl/report capabilities of EmmanuelDURIN/linkkchecker.net.

NOT a port: the reference (C#, /root/reference) tells us WHAT is computed
(crawl semantics, URL canonicalization, dedup, status classification,
reports); this package expresses it as idiomatic Spark — DataFrames,
vectorized Arrow/pandas UDFs, anti-join dedup with bloom/cuckoo pre-filters,
parquet/Iceberg-backed frontier tables, and an epoch-per-BFS-level driver
loop (SURVEY.md §3.1).
"""

__version__ = "0.1.0"
