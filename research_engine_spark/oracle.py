"""Pure-Python/numpy BM25 oracle (SURVEY.md §5 item 1).

Plays the role Elasticsearch/Lucene plays in the reference: an independent,
single-process ground truth the Spark engine must match rank-identically
(top-k docIDs AND float64 scores) on the reference query set.

Shares the exact analyzer code path with the engine
(research_engine_spark.functions.analyzer.analyze) so token identity is
bit-identical; sums per-doc partials in term-sorted order, matching the
engine's deterministic fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions.analyzer import analyze, analyze_query
from .functions.porter import CachedStemmer
from .operators.indexer import bm25_idf, bm25_tf_part


# Fuzzy expansion distance: the SAME unrestricted Damerau-Levenshtein the
# engine uses (functions/editdist.py) — Lucene FuzzyQuery transpositions=
# true semantics, DuckDB damerau_levenshtein-identical.
from .functions.editdist import damerau_levenshtein as _edit_distance


class BM25Oracle:
    def __init__(self, transcripts: pd.DataFrame, k1: float = 1.2,
                 b: float = 0.75, dl_fn=None) -> None:
        """transcripts: pandas DF with conv_id, turn_idx, text columns.

        dl_fn: optional text -> int doc-length override (the oracle twin
        of build_index(dl_tokenizer=...), e.g. a trained BPETokenizer's
        ``lambda t: len(tok.encode(t))``); tf/df stay analyzer-based."""
        self.k1, self.b = k1, b
        df = transcripts.sort_values(["conv_id", "turn_idx"],
                                     kind="mergesort").reset_index(drop=True)
        self.doc_ids = np.arange(len(df), dtype=np.int64)
        self.conv_id = df["conv_id"].to_numpy()
        self.turn_idx = df["turn_idx"].to_numpy()
        self.text = df["text"].fillna("").to_numpy()
        stemmer = CachedStemmer()
        toks = [analyze(t, stemmer) for t in self.text]
        if dl_fn is not None:
            self.dl = np.array([int(dl_fn(t)) for t in self.text],
                               dtype=np.int64)
        else:
            self.dl = np.array([len(t) for t in toks], dtype=np.int64)
        self.n_docs = len(df)
        # exact int64 token total -> bit-identical avgdl with the engine
        self.avgdl = int(self.dl.sum()) / self.n_docs if self.n_docs else 0.0
        # inverted index: term -> (doc_ids asc, tfs); positions for phrases
        self.index: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        tmp: dict[str, dict[int, int]] = {}
        for d, ts in enumerate(toks):
            for p, t in enumerate(ts):
                tmp.setdefault(t, {})
                tmp[t][d] = tmp[t].get(d, 0) + 1
                self.positions.setdefault(t, {}).setdefault(d, []).append(p)
        for t, postings in tmp.items():
            ids = np.array(sorted(postings), dtype=np.int64)
            tfs = np.array([postings[i] for i in ids], dtype=np.int64)
            self.index[t] = (ids, tfs)

    def idf(self, term: str) -> float:
        df_t = self.index[term][0].size if term in self.index else 0
        return float(bm25_idf(self.n_docs, df_t))

    def search(self, query: str, k: int = 10, k1: float | None = None,
               b: float | None = None) -> pd.DataFrame:
        """Top-k: DataFrame(doc_id, score, conv_id, turn_idx, text),
        (score desc, doc_id asc) ordering, float64 scores."""
        k1 = self.k1 if k1 is None else k1
        b = self.b if b is None else b
        scores: dict[int, float] = {}
        for term, qtf in analyze_query(query):  # term-sorted fold order
            if term not in self.index:
                continue
            ids, tfs = self.index[term]
            dls = self.dl[ids]
            # identical float op order to the engine's scorer UDF
            part = (qtf * self.idf(term)
                    * bm25_tf_part(tfs, dls, self.avgdl, k1, b))
            for d, p in zip(ids, part):
                scores[int(d)] = scores.get(int(d), 0.0) + float(p)
        if not scores:
            return pd.DataFrame(
                columns=["doc_id", "score", "conv_id", "turn_idx", "text"])
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        ids = np.array([d for d, _ in items], dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "score": [s for _, s in items],
            "conv_id": self.conv_id[ids],
            "turn_idx": self.turn_idx[ids],
            "text": self.text[ids],
        })

    def fuzzy_search(self, query: str, k: int = 10,
                     max_expansions: int = 50,
                     k1: float | None = None,
                     b: float | None = None) -> pd.DataFrame:
        """R5 mirror of search(..., fuzzy=True): Lucene AUTO
        Damerau-Levenshtein expansion against the vocabulary (adjacent
        transposition = ONE edit), weight = qtf * (1 - ed/min(|q|, |t|)),
        top max_expansions per query term by (boost desc, df desc, term
        asc); per-doc partials summed in the engine's deterministic
        (term, partial)-sorted fold order."""
        from .operators.scorer import auto_max_edits

        k1 = self.k1 if k1 is None else k1
        b = self.b if b is None else b
        clauses: list[tuple[str, float]] = []  # (term, weight)
        for qterm, qtf in analyze_query(query):
            e = auto_max_edits(qterm)
            if e == 0:
                if qterm in self.index:
                    clauses.append((qterm, float(qtf)))
                continue
            cands = []
            for t in self.index:
                if abs(len(t) - len(qterm)) > e:
                    continue
                ed = _edit_distance(qterm, t, e)
                if ed <= e:
                    boost = 1.0 - float(ed) / float(min(len(qterm), len(t)))
                    cands.append((t, boost, self.index[t][0].size))
            cands.sort(key=lambda c: (-c[1], -c[2], c[0]))
            clauses.extend((t, float(qtf) * boost)
                           for t, boost, _ in cands[:max_expansions])
        per_doc: dict[int, list[tuple[str, float]]] = {}
        for term, w in clauses:
            ids, tfs = self.index[term]
            part = (w * self.idf(term)
                    * bm25_tf_part(tfs, self.dl[ids], self.avgdl, k1, b))
            for d, p in zip(ids, part):
                per_doc.setdefault(int(d), []).append((term, float(p)))
        scores: dict[int, float] = {}
        for d, pairs in per_doc.items():
            acc = 0.0
            for _, p in sorted(pairs):
                acc += p
            scores[d] = acc
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        ids = np.array([d for d, _ in items], dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "score": [s for _, s in items],
            "conv_id": self.conv_id[ids] if ids.size else np.array([]),
            "turn_idx": self.turn_idx[ids] if ids.size else np.array([]),
        })

    def phrase_scores(self, phrase: str, k1: float | None = None,
                      b: float | None = None) -> dict[int, float]:
        """Exact-phrase scoring mirroring the engine's semantics (R3):
        score = (Σ idf(t_i) in phrase order) * ptf/(ptf + K(dl))."""
        k1 = self.k1 if k1 is None else k1
        b = self.b if b is None else b
        ordered = analyze(phrase)
        if not ordered or any(t not in self.index for t in ordered):
            return {}
        sum_idf = 0.0
        for t in ordered:
            sum_idf += self.idf(t)
        # candidate docs: contain all unique terms
        uniq = sorted(set(ordered))
        docs = set(self.positions[uniq[0]])
        for t in uniq[1:]:
            docs &= set(self.positions[t])
        out: dict[int, float] = {}
        for d in docs:
            cand = np.asarray(self.positions[ordered[0]][d], dtype=np.int64)
            for i, t in enumerate(ordered[1:], start=1):
                if cand.size == 0:
                    break
                cand = cand[np.isin(cand + i,
                                    np.asarray(self.positions[t][d]))]
            ptf = int(cand.size)
            if ptf:
                out[d] = sum_idf * float(
                    bm25_tf_part(ptf, int(self.dl[d]), self.avgdl, k1, b))
        return out

    def phrase_search(self, phrase: str, k: int = 10, k1: float | None = None,
                      b: float | None = None) -> pd.DataFrame:
        scores = self.phrase_scores(phrase, k1, b)
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pd.DataFrame({"doc_id": [d for d, _ in items],
                             "score": [s for _, s in items]})

    def term_scores(self, query: str, k1: float | None = None,
                    b: float | None = None) -> dict[int, float]:
        """Full scored set for the bool/should combination."""
        k1 = self.k1 if k1 is None else k1
        b = self.b if b is None else b
        scores: dict[int, float] = {}
        for term, qtf in analyze_query(query):
            if term not in self.index:
                continue
            ids, tfs = self.index[term]
            part = (qtf * self.idf(term)
                    * bm25_tf_part(tfs, self.dl[ids], self.avgdl, k1, b))
            for d, p in zip(ids, part):
                scores[int(d)] = scores.get(int(d), 0.0) + float(p)
        return scores

    def bool_should_search(self, query: str, k: int = 10,
                           phrase_boost: float = 2.0,
                           k1: float | None = None,
                           b: float | None = None) -> pd.DataFrame:
        """R4 mirror: term clause + boosted phrase clause."""
        t = self.term_scores(query, k1, b)
        p = self.phrase_scores(query, k1, b)
        combined = {d: t.get(d, 0.0) + phrase_boost * p.get(d, 0.0)
                    for d in set(t) | set(p)}
        items = sorted(combined.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pd.DataFrame({"doc_id": [d for d, _ in items],
                             "score": [s for _, s in items]})
