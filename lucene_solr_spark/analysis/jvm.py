"""JVM-side StandardAnalyzer front end: tokenize + lowercase with
Spark builtins so the index build's hot loop never enters Python.

The ASCII subset of the UAX#29 word-break grammar (the exact pattern
``tokenizer._A_WORD`` that the Python ASCII fast path compiles) is a
plain regular expression that Java's regex engine evaluates with the
same leftmost-longest-alternation semantics as Python's ``re`` — so
``regexp_extract_all`` produces the identical token stream JVM-side at
JVM-string-scan speed. Lowercasing is ONE ``transform(lower)``.

Deliberately NOT done here: the StopFilter. Spark's higher-order
array functions are interpreted per element (no codegen), and building
(term, index) structs + filtering them cost ~5× the tokenization
itself (measured: 3s regex vs 16s struct/filter on 9.6M tokens).
The builders stop-filter in vectorized numpy instead — positions are
the raw token indices (so StopFilter's position-gap behavior,
analysis/FilteringTokenFilter.java:47-57, falls out), and BM25 doc
length counts only surviving tokens.

Rows the ASCII grammar cannot handle exactly — any non-ASCII character
(full Unicode word-break classes) or a 256+ run of token characters
(StandardAnalyzer's 255-char chop, StandardAnalyzer.java:61-69) — are
routed through the Python analyzer via ``mapInPandas``, coalesced to a
few partitions so the (normally empty) branch does not spin up one
Python worker per corpus partition. Golden tests pin the two paths to
byte-identical output on the shared domain.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from .tokenizer import _A_WORD, MAX_TOKEN_LENGTH, standard_tokenize

#: output columns added by :func:`analyzed_columns`
ANALYZED_COLS = ("tokens", "content_sha256")

#: partitions for the python-fallback branch (usually ~zero rows)
_FALLBACK_PARTITIONS = 4


def _needs_python(content, raw_tokens, max_token_length: int):
    """Column predicate: row needs the Python analyzer — any non-ASCII
    char (UTF-8 byte length > char length; full Unicode word-break
    classes apply) or an ASCII token longer than max_token_length
    (StandardAnalyzer's chop, StandardAnalyzer.java:61-69). Both checks
    are O(n) scans — a bounded-repetition regex here cost ~5× the
    tokenization itself (measured 14s vs 3s on 60 MB)."""
    return (F.length(content) != F.octet_length(content)) | F.exists(
        raw_tokens, lambda t: F.length(t) > max_token_length)


def _python_analyzed(df: DataFrame, max_token_length: int,
                     content_col: str, tokens_col: str,
                     with_sha: bool) -> DataFrame:
    """The exact-semantics fallback (full Unicode + 255-chop): lowered,
    UNFILTERED token stream — position = list index, like the JVM
    branch."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {tokens_col} array<string>"
    if with_sha:
        out_schema += ", content_sha256 string"

    def analyze(batches):
        for pdf in batches:
            toks_l, sha_l = [], []
            for content in pdf[content_col].fillna(""):
                toks = standard_tokenize(content, max_token_length)
                toks_l.append([t.lower() for t in toks])
                if with_sha:
                    sha_l.append(
                        hashlib.sha256(content.encode("utf-8")).hexdigest())
            out = pdf.copy()
            out[tokens_col] = toks_l
            if with_sha:
                out["content_sha256"] = sha_l
            yield out

    return df.coalesce(_FALLBACK_PARTITIONS).mapInPandas(
        analyze, schema=out_schema)


#: deferred-mode column holding the retained content of rows that need
#: the Python analyzer (NULL on the JVM-analyzed mainline, so parquet
#: RLEs it away)
PY_CONTENT_COL = "_lss_py_content"


def analyzed_deferred(df: DataFrame,
                      max_token_length: int = MAX_TOKEN_LENGTH,
                      content_col: str = "content",
                      tokens_col: str = "tokens",
                      with_sha: bool = True,
                      py_content_col: str = PY_CONTENT_COL) -> DataFrame:
    """ONE-projection analyze (drops ``content_col``): ASCII rows get
    ``tokens_col`` (lowered, position = index) and — when ``with_sha``
    — ``content_sha256``; rows needing the full-Unicode Python analyzer
    get NULL tokens and their content retained in ``PY_CONTENT_COL``
    for :func:`finalize_analyzed`.

    Why this exists: :func:`analyzed_columns` is a union of two
    filtered branches, and each filter re-evaluates the tokenize regex
    — the physical plan runs ``regexp_extract_all`` 3x per row over 2
    corpus scans. Here the regex and the needs-py predicate each get
    their OWN Project so they are computed once per row: Catalyst's
    CollapseProject refuses to merge a Project whose alias is a
    non-cheap expression referenced more than once downstream (a
    single-Project CASE shape measured ~1.4x MORE cpu — subexpression
    elimination does not cover interpreted higher-order exprs).

    CONTRACT: the result must be MATERIALIZED (parquet spill, persist)
    before any filter touches it — Catalyst pushes predicates through
    Project aliases, which would re-derive the regex per filter. After
    materialization, branch on ``PY_CONTENT_COL`` (atomic string →
    parquet-pushable; an IsNull on the ``tokens`` ARRAY column is NOT
    pushable and forces full scans — measured 3x on the block build).
    """
    content = F.coalesce(F.col(content_col), F.lit(""))
    raw_col, npy_col = f"_lss_raw_{tokens_col}", f"_lss_npy_{tokens_col}"
    # lowercase the DOCUMENT once, then extract: the ASCII word-break
    # grammar is case-symmetric, so extract(lower(doc)) ==
    # transform(extract(doc), lower) token-for-token — but allocates one
    # String per document instead of one per token, and skips the
    # per-element interpreted transform() entirely (non-ASCII rows never
    # use raw_col: needs_py routes them to the Python analyzer)
    step = df.withColumn(raw_col, F.regexp_extract_all(
        F.lower(content), F.lit(_A_WORD), F.lit(0)))
    step = step.withColumn(npy_col, _needs_python(
        content, F.col(raw_col), max_token_length))
    npy = F.col(npy_col)
    cols = {
        tokens_col: F.when(~npy, F.col(raw_col)),
        py_content_col: F.when(npy, F.col(content_col)),
    }
    if with_sha:
        cols["content_sha256"] = F.when(~npy, F.sha2(content, 256))
    return step.withColumns(cols).drop(content_col, raw_col, npy_col)


def finalize_analyzed(df: DataFrame,
                      max_token_length: int = MAX_TOKEN_LENGTH,
                      content_col: str = "content",
                      tokens_col: str = "tokens",
                      with_sha: bool = True,
                      py_content_col: str = PY_CONTENT_COL) -> DataFrame:
    """Complete a MATERIALIZED :func:`analyzed_deferred` frame: rows
    with NULL ``tokens_col`` run through the Python analyzer (content
    retained in ``PY_CONTENT_COL``); the output schema matches
    :func:`analyzed_columns` minus the content column. Push any
    row-subset filter (e.g. the per-chunk segment range) onto ``df``
    BEFORE calling, so the Python branch analyzes each rare row exactly
    once across downstream jobs. Branches split on ``PY_CONTENT_COL``
    (atomic → parquet-pushable; the Python branch's IsNotNull skips
    every all-null row group, so on an all-ASCII corpus it is a
    metadata-only scan)."""
    jvm = df.where(F.col(py_content_col).isNull()).drop(py_content_col)
    py_in = df.where(F.col(py_content_col).isNotNull()).drop(tokens_col)
    if with_sha:
        py_in = py_in.drop("content_sha256")
    py_in = py_in.withColumnRenamed(py_content_col, content_col)
    py = _python_analyzed(py_in, max_token_length, content_col,
                          tokens_col, with_sha).drop(content_col)
    return jvm.unionByName(py)


def analyzed_columns(df: DataFrame,
                     max_token_length: int = MAX_TOKEN_LENGTH,
                     content_col: str = "content",
                     stop_words=None,
                     tokens_col: str = "tokens",
                     with_sha: bool = True) -> DataFrame:
    """Add ``tokens_col`` (lowered, unfiltered, position = index) and —
    when ``with_sha`` — ``content_sha256`` (hex digest of the UTF-8
    content bytes, the per-row invariant vs the input) to ``df``.

    ``stop_words`` is accepted for signature compatibility and ignored:
    stop filtering happens vectorized in the consuming builder.
    Multi-field indexes call this once per analyzed field with a
    distinct ``tokens_col`` (sha only on the content field).
    """
    content = F.coalesce(F.col(content_col), F.lit(""))
    raw = F.regexp_extract_all(content, F.lit(_A_WORD), F.lit(0))
    needs_py = _needs_python(content, raw, max_token_length)

    # extract over the lowered DOCUMENT (case-symmetric ASCII grammar:
    # identical tokens, one String alloc per doc instead of per token,
    # no interpreted per-element transform — see analyzed_deferred)
    jvm = df.where(~needs_py).withColumn(
        tokens_col,
        F.regexp_extract_all(F.lower(content), F.lit(_A_WORD), F.lit(0)))
    if with_sha:
        jvm = jvm.withColumn("content_sha256", F.sha2(content, 256))
    py = _python_analyzed(df.where(needs_py), max_token_length, content_col,
                          tokens_col, with_sha)
    return jvm.unionByName(py)
