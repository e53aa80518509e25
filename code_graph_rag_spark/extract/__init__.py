from code_graph_rag_spark.extract.mentions import extract_mentions

__all__ = ["extract_mentions"]
