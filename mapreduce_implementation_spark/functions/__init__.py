from mapreduce_implementation_spark.functions import text, textstats, vectors

__all__ = ["text", "textstats", "vectors"]
