from go_streaming_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
