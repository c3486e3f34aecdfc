"""The reference query set (FIXTURES.md §6) — queries the engine must
answer rank-identically to the oracle.

Sources in the reference repo: retrieval/es_search_final.py:56-62 (5 BM25
test queries), retrieval/test_rag.py:35-40 (4 RAG queries),
retrieval/inspect_vector_store.py:107, retrieval/es_search.py:23.
"""

REFERENCE_QUERIES = [
    "neural networks",
    "transformer architecture",
    "language models",
    "machine learning",
    "natural language processing",
    "What are transformer architectures?",
    "How does attention mechanism work?",
    "What is BERT and how does it work?",
    "Recent advances in natural language processing",
    "machine learning in healthcare",
    "contrastive pretraining retrieval augmentation",
]

# k values appearing in the reference (es_search_final.py:66, app.py:42,
# test_rag.py:47, rag_service.py:24)
REFERENCE_KS = [3, 5, 10, 15]
