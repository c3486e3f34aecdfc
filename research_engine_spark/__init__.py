"""research_engine_spark — PySpark-native full-text index + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference (k4tie113/research_engine, which delegates retrieval to
Elasticsearch/Lucene + FAISS), re-expressed Spark-first:

- input: a table of multi-turn conversation transcripts
  (conv_id:string, turn_idx:int, role:string, text:string, tool:string,
  ts:timestamp)
- index build: tokenize (vectorized Arrow/pandas UDFs) -> explode ->
  tf aggregation -> SPIMI per-partition posting construction with
  delta+varbyte compression and per-block max-score metadata
- query: broadcast query-term join -> block decode + BM25 scoring ->
  block-max pruning -> distributed top-k (TakeOrderedAndProject)

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"
