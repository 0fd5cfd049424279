from mapreduce_framework_simple_spark.operators.mapreduce import MapReduceEngine, map_reduce

__all__ = ["MapReduceEngine", "map_reduce"]
