"""PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the query/data-processing capabilities of
aws-samples/siem-on-amazon-opensearch-service (reference at /root/reference,
read-only).  The reference delegates indexing/search to OpenSearch/Lucene;
this package implements that delegated layer natively on Spark DataFrames:

- posting-list construction (tokenize -> per-partition postings -> salted
  repartition-by-term merge), delta+varbyte compression, block-max metadata
- Lucene-compatible BM25 (k1=1.2, b=0.75, lossy SmallFloat norms,
  rank-identical top-k with ascending-docID tie-break)
- the reference's SIEM query surface: term / AND / OR / phrase-within-turn,
  keyword + time-range filters, and the dashboard aggregations
  (terms-top-N, date_histogram, cardinality, filters-agg, top_hits,
  pipeline aggs) as DataFrame operators
- training-data-pipeline extras: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text quality stats.

Everything is DataFrame-first; Python appears only in vectorized
Arrow/pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
