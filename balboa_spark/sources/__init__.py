from balboa_spark.sources.registry import FORMATS, normalize_json_lines

__all__ = ["FORMATS", "normalize_json_lines"]
