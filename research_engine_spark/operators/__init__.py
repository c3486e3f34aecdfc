"""Engine operators: docid assignment, SPIMI index build, BM25 scoring,
top-k, fusion, dedup, similarity."""
