"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
``vitali87/code-graph-rag`` (the reference): per-document span sequences are
parsed by vectorized Arrow-batched UDFs into typed *mention* rows, cross-file
resolution (the reference's in-memory registry/trie lookups) becomes a DAG of
DataFrame joins, and the result is materialized as ``nodes`` / ``edges`` /
``adjacency`` tables.

Nothing here is a port: the reference is a single-process Python engine
(``codebase_rag/graph_updater.py``); this package is a Spark logical-plan
builder designed for 100 TB inputs on a multi-executor cluster.
"""

__version__ = "0.1.0"
