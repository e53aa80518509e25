"""Graph export/import: the reference's JSON dump + indexed loader
(``services/graph_service.py:660-679``, ``graph_loader.py:48-146``)
re-expressed as DataFrame writers/readers.

Format: one JSON object per line (Spark-native json lines) in two
directories ``nodes/`` and ``edges/`` plus a ``metadata.json`` sidecar —
round-trips through ``import_graph``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_graph(nodes: DataFrame, edges: DataFrame, out_dir: str) -> dict:
    n_nodes = nodes.count()
    n_edges = edges.count()
    nodes.write.mode("overwrite").json(str(Path(out_dir) / "nodes"))
    edges.withColumn("props_json", F.to_json("props")).drop("props").write.mode(
        "overwrite"
    ).json(str(Path(out_dir) / "edges"))
    meta = {
        "node_count": n_nodes,
        "relationship_count": n_edges,
        "exported_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "format": "cgr-spark-jsonl-v1",
    }
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    (Path(out_dir) / "metadata.json").write_text(json.dumps(meta, indent=1))
    return meta


def import_graph(spark: SparkSession, in_dir: str) -> tuple[DataFrame, DataFrame]:
    nodes = spark.read.json(str(Path(in_dir) / "nodes"))
    edges = spark.read.json(str(Path(in_dir) / "edges"))
    if "props_json" in edges.columns:
        edges = edges.withColumn(
            "props", F.from_json("props_json", "map<string,string>")
        ).drop("props_json")
    else:
        # the JSON writer omits columns that were null on every row
        edges = edges.withColumn(
            "props", F.lit(None).cast("map<string,string>")
        )
    return nodes, edges
