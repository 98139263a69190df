"""sfa_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the capabilities of patrickzib/SFA
(symbolic Fourier approximation, bag-of-patterns classifiers, trie-style
similarity indexing) as idiomatic Spark DataFrame / SQL / MLlib plans,
plus the LLM-data-pipeline operators (dedup, ANN search, text analysis)
that a 100 TB training-data pipeline needs.

Canonical data layouts (see SURVEY.md §1.4):
  * long form   : (series_id bigint, pos bigint, value double, n bigint)
                  — the at-scale layout; one shuffle on series_id, every
                  window function downstream reuses that partitioning.
  * array form  : (series_id bigint, label double, values array<double>)
                  — for Arrow-batched pandas_udf spectral transforms.
"""

__version__ = "0.1.0"
