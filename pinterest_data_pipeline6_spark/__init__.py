"""pinterest_data_pipeline6_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (joana54/pinterest-data-pipeline6):

- three-entity ingestion (batch parquet/JSON scan + file-based streaming
  source standing in for Kinesis),
- a Catalyst-native cleaning operator set (sentinel->NULL normalization,
  regex rewrites, casts, renames, projection, keyed dedup, derived columns),
- the 8-query analytics workload (joins, group-by aggregates, count-distinct,
  approx/exact median, window top-1 per group, CASE bucketing, order/limit),
- batch parquet sinks and streaming append sinks with checkpointing,
- plus large-scale training-data operators: deduplication (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute-force
  and LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
  counting, fingerprinting) and multimodal binary-column plumbing.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; there are no row-at-a-time Python UDFs in any hot path.
"""

__version__ = "0.1.0"
