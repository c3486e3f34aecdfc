"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the engine's primary input table — multi-turn conversation /
agent transcripts with schema (conv_id:string, turn_idx:int, role:string,
text:string, tool:string, ts:timestamp) per BASELINE.json input_hint —
fully distributed (mapInPandas over spark.range) and fully deterministic
(numpy PCG64 seeded per conversation; no wall clock, no Python random).

Term distribution is Zipfian (s≈1.07) over a synthetic vocabulary with the
reference query-set terms ("neural", "networks", "transformer", ...) pinned
at known ranks so every reference query (FIXTURES.md §6) has non-trivial
hits, and hot-term skew is real (exercises the salted skew merge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

# Terms appearing in the reference query set (FIXTURES.md §6; sources:
# retrieval/es_search_final.py:56-62, retrieval/test_rag.py:35-40,
# retrieval/inspect_vector_store.py:107, retrieval/es_search.py:23).
QUERY_TERMS = [
    "neural", "networks", "network", "transformer", "architecture",
    "architectures", "language", "models", "model", "machine", "learning",
    "natural", "processing", "attention", "mechanism", "BERT", "advances",
    "healthcare", "contrastive", "pretraining", "retrieval", "augmentation",
    "recent", "work", "works",
]

_FILLERS = [
    "the", "a", "of", "and", "to", "in", "is", "for", "we", "that", "this",
    "with", "are", "on", "as", "by", "an", "be", "from", "data", "method",
    "results", "using", "approach", "paper", "show", "training", "task",
    "performance", "based", "function", "call", "tool", "agent", "user",
    "system", "query", "response", "step", "plan", "code", "error", "test",
]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "calculator", "none"]

_BASE_TS = np.datetime64("2025-01-01T00:00:00")


def _build_vocab(vocab_size: int) -> np.ndarray:
    """Deterministic vocabulary: fillers + query terms interleaved near the
    head of the Zipf ranking, then synthetic terms."""
    vocab: list[str] = []
    vocab.extend(_FILLERS)
    # pin query terms at moderately-hot ranks (every 3rd slot)
    for i, qt in enumerate(QUERY_TERMS):
        vocab.append(qt)
    n_syn = max(vocab_size - len(vocab), 0)
    vocab.extend(f"term{i:05d}" for i in range(n_syn))
    return np.array(vocab[:vocab_size], dtype=object)


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def _gen_conv(
    rng: np.random.Generator,
    conv_idx: int,
    vocab: np.ndarray,
    probs: np.ndarray,
    huge: bool,
    burstiness: float = 0.0,
) -> pd.DataFrame:
    if huge:
        n_turns = int(rng.integers(200, 400))
    else:
        n_turns = int(np.clip(rng.lognormal(1.6, 0.7), 1, 60))
    lens = np.clip(rng.lognormal(2.6, 0.9, size=n_turns), 0, 300).astype(int)
    # sprinkle empty and whitespace-only turns (analyzer edge cases)
    blank = (lens == 0) | (rng.random(n_turns) < 0.01)
    lens = np.where(blank, 0, lens)
    # ONE vectorized draw for the whole conversation (a per-turn
    # rng.choice would be O(vocab) per call and dominate the build)
    total = int(lens.sum())
    words = rng.choice(vocab, size=total, p=probs, replace=True)
    if burstiness > 0.0 and total:
        # Term burstiness (Church & Gale): a word that appears in a turn
        # tends to repeat there, giving real corpora their heavy per-doc
        # tf tails (which is what lets block-max pruning skip anything).
        # Opt-in only — the default corpus stays bit-identical to r1/r2.
        offsets_b = np.concatenate([[0], np.cumsum(lens)])
        bursty = rng.random(n_turns) < burstiness
        for t in np.flatnonzero(bursty):
            s, e = int(offsets_b[t]), int(offsets_b[t + 1])
            if e - s < 4:
                continue
            topic = words[int(rng.integers(s, e))]
            rep = rng.random(e - s) < rng.uniform(0.1, 0.5)
            words[s:e][rep] = topic
    w = pd.Series(words, dtype=object)
    caps = rng.random(total) < 0.08
    w[caps] = w[caps].str.capitalize()
    punct = rng.random(total) < 0.06
    marks = np.array([".", ",", "!", "?", ";"], dtype=object)
    w[punct] = w[punct] + rng.choice(marks, size=int(punct.sum()))
    wl = w.tolist()
    offsets = np.concatenate([[0], np.cumsum(lens)])
    texts = []
    for t in range(n_turns):
        if blank[t]:
            texts.append("" if rng.random() < 0.5 else "   \t ")
        else:
            texts.append(" ".join(wl[offsets[t]:offsets[t + 1]]))
    roles = [ROLES[t % 3] for t in range(n_turns)]
    tools = [
        TOOLS[int(rng.integers(0, len(TOOLS)))] if r == "tool" else None
        for r in roles
    ]
    ts = _BASE_TS + np.arange(n_turns) * np.timedelta64(7, "s") + np.timedelta64(
        int(conv_idx) * 60, "s"
    )
    return pd.DataFrame(
        {
            "conv_id": f"conv_{conv_idx:08d}",
            "turn_idx": np.arange(n_turns, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    vocab_size: int = 4000,
    n_huge: int = 2,
    n_partitions: int | None = None,
    burstiness: float = 0.0,
) -> DataFrame:
    """Distributed deterministic transcript table.

    Each conversation is generated from its own PCG64 stream seeded by
    (seed, conv_idx), so output is identical regardless of partitioning,
    executor count, or scheduling order — required for the determinism and
    resume tests (SURVEY.md §5 invariant 3).
    """
    if n_partitions is None:
        n_partitions = max(int(spark.sparkContext.defaultParallelism), 8)
    vocab = _build_vocab(vocab_size)
    probs = _zipf_probs(vocab_size)
    n_huge_eff = min(n_huge, n_convs)

    def gen(batches):
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"].to_numpy():
                rng = np.random.default_rng(
                    np.random.SeedSequence([seed, int(conv_idx)])
                )
                out.append(
                    _gen_conv(rng, int(conv_idx), vocab, probs,
                              huge=conv_idx < n_huge_eff,
                              burstiness=burstiness)
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    base = spark.range(0, n_convs, numPartitions=n_partitions)
    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def transcripts_pandas(n_convs: int = 200, seed: int = 42,
                       vocab_size: int = 4000, n_huge: int = 2) -> pd.DataFrame:
    """Driver-side (oracle) twin of synth_transcripts — same bytes."""
    vocab = _build_vocab(vocab_size)
    probs = _zipf_probs(vocab_size)
    n_huge_eff = min(n_huge, n_convs)
    out = [
        _gen_conv(
            np.random.default_rng(np.random.SeedSequence([seed, i])),
            i, vocab, probs, huge=i < n_huge_eff,
        )
        for i in range(n_convs)
    ]
    return pd.concat(out, ignore_index=True)
