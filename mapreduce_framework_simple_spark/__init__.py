"""mapreduce_framework_simple_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capability surface of the
Perl distribution ``MapReduce-Framework-Simple`` (reference:
``/root/reference/lib/MapReduce/Framework/Simple.pm``), extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) a 100 TB training-data pipeline needs.

Design stance (see SURVEY.md §2/§4):

* **DataFrame/SQL first.** Everything relational is declared through the
  DataFrame API so Catalyst does pushdown/pruning/join-reordering and
  Tungsten does codegen. ~80% of the reference (forking, HTTP transport,
  serialization, retry) is Spark-native and needs zero code here.
* **The ``map_reduce`` parity API** (``operators.mapreduce``) reproduces
  the reference's one public entry point — (data, mapper, reducer) —
  on top of ``sc.parallelize().mapPartitions()``; closure shipping is
  cloudpickle (the moral equivalent of B::Deparse + eval,
  reference Simple.pm:164,408).
* **Python rows are the slow path.** UDF work is Arrow-batched
  (pandas_udf / mapInPandas); row-at-a-time Python UDFs are avoided.
"""

from mapreduce_framework_simple_spark.session import get_session, stop_session

__all__ = ["get_session", "stop_session"]
__version__ = "0.1.0"
