"""tiny_etl_multiproc_bigdata_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference multiprocess dataflow ETL engine
(``enimiste/tiny-etl-multiproc-bigdata``): EXTRACTORS |> TRANSFORMERS |>
LOADERS over row streams (reference readme.md:12), rebuilt on the
DataFrame/SQL API so Catalyst + Tungsten pick the physical strategy.

Design stance (vs the reference's hand-built process/queue topology,
pipline.py:40-263):

* items are rows of a typed ``DataFrame`` (reference: nested dicts,
  extractors/files.py:25-26) — schema errors surface at analysis time;
* operators are declarative ``DataFrame`` transforms — fusion, predicate
  pushdown, column pruning, partial aggregation come from Catalyst instead
  of generator chaining (reference commons.py:46-56);
* parallelism is partitioning, not ``multiprocessing.Queue`` round-robin
  (reference pipline.py:92-103); sinks are ``df.write`` with partitioned
  parallel output instead of the LoadBalance queue fan-out
  (reference loaders/loadbalancer.py:16-163).
"""

from tiny_etl_multiproc_bigdata_spark.session import get_spark

__all__ = ["get_spark"]
