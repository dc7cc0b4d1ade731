"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
  (repo:string, path:string, commit:string, lang:string, content:string)

Each row is a pure function of its index ``i`` and the seed, so the
corpus can be generated *distributed* (``spark.range(n)`` →
``mapInPandas``) with no driver-side materialization — the same recipe
works at 64 rows or 10^9 rows. Content is a seeded token soup of
language keywords, Zipf-distributed identifiers, numbers and
punctuation, with stopword-bearing comment lines to exercise the
StopFilter (document lengths 20–2000 tokens, Zipf-ish).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

EXTS = ["py", "java", "c", "go", "md"]
LANG_BY_EXT = {"py": "python", "java": "java", "c": "c", "go": "go", "md": "markdown"}

KEYWORDS = (
    "int return if for while class def import static void public private "
    "else break continue struct func var const len range self this new "
    "try except finally switch case type interface map string bool float"
).split()

STOP_COMMENT_WORDS = (
    "the of and to in a is that it on for as with by this be are was"
).split()

DIRS = ["core", "util", "index", "search", "io", "net", "api", "db", "ui", "cli"]
NAMES = ["main", "utils", "engine", "parser", "writer", "reader", "server",
         "client", "model", "config", "handler", "worker", "codec", "store"]

VOCAB_SIZE = 5000


def _identifier_vocab() -> list[str]:
    stems = ["get", "set", "make", "build", "run", "init", "load", "save",
             "read", "write", "parse", "merge", "split", "index", "query",
             "score", "hash", "sort", "find", "scan", "push", "pop", "emit",
             "flush", "open", "close", "send", "recv", "encode", "decode"]
    suffixes = ["er", "ed", "ing", "s", "_impl", "_v2", "_buf", "_ptr",
                "_idx", "_cnt", "_map", "_arr", "_len", "_pos", "_ctx"]
    vocab = []
    i = 0
    while len(vocab) < VOCAB_SIZE:
        s = stems[i % len(stems)]
        sx = suffixes[(i // len(stems)) % len(suffixes)]
        vocab.append(f"{s}{sx}{i // (len(stems) * len(suffixes))}")
        i += 1
    return vocab


_VOCAB = _identifier_vocab()


def make_rows(indices: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Vectorized row generation for a batch of global indices."""
    idx = np.asarray(indices, dtype=np.int64)
    n = len(idx)
    repos = [f"org{i % 7}/repo{i % 23}" for i in idx]
    exts = [EXTS[i % len(EXTS)] for i in idx]
    paths = [
        f"src/{DIRS[(i // 7) % len(DIRS)]}/{NAMES[(i // 3) % len(NAMES)]}_{i}.{e}"
        for i, e in zip(idx, exts)
    ]
    commits = [
        hashlib.sha256(f"{r}/{p}".encode()).hexdigest()[:40]
        for r, p in zip(repos, paths)
    ]
    langs = [LANG_BY_EXT[e] for e in exts]

    contents = []
    for i in idx:
        rng = np.random.default_rng(seed * 1_000_003 + int(i))
        # Zipf-ish length 20..2000
        length = int(min(2000, 20 + (rng.zipf(1.3) - 1) * 7))
        kw = rng.integers(0, len(KEYWORDS), size=length)
        # Zipf-distributed identifier choice
        ident_ranks = np.minimum(rng.zipf(1.2, size=length) - 1, VOCAB_SIZE - 1)
        pick = rng.random(length)
        parts = []
        for j in range(length):
            if pick[j] < 0.35:
                parts.append(KEYWORDS[kw[j]])
            elif pick[j] < 0.85:
                parts.append(_VOCAB[ident_ranks[j]])
            elif pick[j] < 0.92:
                parts.append(str(rng.integers(0, 100000)))
            else:
                parts.append("{}();=" [int(rng.integers(0, 5))])
            if j % 13 == 12:
                parts.append("\n")
            if j % 29 == 28:
                # comment line with stopwords
                parts.append(
                    "// "
                    + " ".join(
                        STOP_COMMENT_WORDS[int(x)]
                        for x in rng.integers(0, len(STOP_COMMENT_WORDS), size=4)
                    )
                    + "\n"
                )
        contents.append(" ".join(parts))

    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits,
         "lang": langs, "content": contents}
    )


def corpus_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Small-scale driver-side corpus (tests)."""
    return make_rows(np.arange(n), seed)


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus: spark.range(n) → mapInPandas(make_rows).

    Scale path: each partition generates its own rows from indices —
    no shuffle, no driver data, embarrassingly parallel.
    """
    rng_seed = seed

    def gen(batches):
        for pdf in batches:
            yield make_rows(pdf["id"].to_numpy(), rng_seed)

    rng = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(0, n)
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)
