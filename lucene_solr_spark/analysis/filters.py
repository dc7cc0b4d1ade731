"""TokenFilter zoo: the commonly-used members of Lucene's
``analysis/common`` filter collection, re-expressed over this
package's ``(terms, positions)`` token-stream representation.

A *filter* is a callable ``(terms: list[str], positions: list[int])
-> (list[str], list[int])``.  Positions follow Lucene's attribute
semantics: removing a token leaves a gap (FilteringTokenFilter.java:
47-57), stacked tokens share a position, and a shingle/ngram carries
the position of its first source token.

Reference semantics (all public, from the reference tree):
  * PorterStemFilter — analysis/common/src/java/org/apache/lucene/
    analysis/en/PorterStemmer.java (Porter 1980 algorithm including
    the two marked DEPARTUREs: ``bli→ble`` and ``logi→log``).
  * EnglishPossessiveFilter — en/EnglishPossessiveFilter.java
    (strip trailing ``'s`` for ' / ’ / ＇).
  * ASCIIFoldingFilter — miscellaneous/ASCIIFoldingFilter.java.
    Implemented as NFKD + combining-mark strip + the Latin
    supplement table below: covers the Latin-1/Latin-Extended
    range used in practice (the reference's hand-unrolled switch
    covers additional exotic blocks).
  * LengthFilter — miscellaneous/LengthFilter.java.
  * NGramTokenFilter / EdgeNGramTokenFilter — ngram/*.java
    (modern semantics: all grams of one token at the SAME position).
  * ShingleFilter — shingle/ShingleFilter.java (token n-grams with
    ``_`` filler tokens for position gaps, optional unigrams).

The chain composes into :class:`CustomAnalyzer` (drop-in for
``StandardAnalyzer`` everywhere an ``analyzer=`` is accepted) and into
:func:`filter_tokens_column` for the Spark side — one vectorized
``pandas_udf`` applying the same chain to a ``tokens`` array column,
so engine and declarative paths share one implementation.
"""

from __future__ import annotations

import unicodedata
from typing import Callable, Iterable

import pandas as pd

from .tokenizer import MAX_TOKEN_LENGTH, StandardAnalyzer, standard_tokenize

TokenFilter = Callable[[list[str], list[int]], tuple[list[str], list[int]]]


# ---------------------------------------------------------------------------
# Porter stemmer (Porter 1980; PorterStemmer.java incl. its DEPARTUREs)
# ---------------------------------------------------------------------------
_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m() of Porter's paper: number of VC alternations in w."""
    m, i, n = 0, 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i == n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o condition: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),  # DEPARTURE abli→able
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"), ("logi", "log"),  # DEPARTURE
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(w: str) -> str:
    """Stem one lowered word (PorterStemmer.stem)."""
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem + ""
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # Step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


def porter_stem_filter(terms: list[str], positions: list[int]):
    return [porter_stem(t) for t in terms], positions


# ---------------------------------------------------------------------------
# Possessive / folding / length
# ---------------------------------------------------------------------------
_APOSTROPHES = ("'s", "’s", "＇s")


def english_possessive_filter(terms: list[str], positions: list[int]):
    """EnglishPossessiveFilter.java: strip a trailing ``'s``."""
    out = []
    for t in terms:
        for a in _APOSTROPHES:
            if t.endswith(a):
                t = t[: -len(a)]
                break
        out.append(t)
    return out, positions


_FOLD_SUPPLEMENT = str.maketrans({
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O",
    "ß": "ss", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D", "þ": "th",
    "Þ": "TH", "ł": "l", "Ł": "L", "ı": "i", "ħ": "h", "Ħ": "H",
})


def ascii_fold(s: str) -> str:
    if s.isascii():
        return s
    s = s.translate(_FOLD_SUPPLEMENT)
    d = unicodedata.normalize("NFKD", s)
    return "".join(c for c in d if not unicodedata.combining(c))


def ascii_folding_filter(terms: list[str], positions: list[int]):
    return [ascii_fold(t) for t in terms], positions


def length_filter(min_len: int = 1, max_len: int = MAX_TOKEN_LENGTH) -> TokenFilter:
    """LengthFilter.java — drops out-of-range tokens, KEEPING position
    gaps (FilteringTokenFilter semantics)."""

    def f(terms: list[str], positions: list[int]):
        keep = [(t, p) for t, p in zip(terms, positions)
                if min_len <= len(t) <= max_len]
        return [t for t, _ in keep], [p for _, p in keep]

    f.__name__ = "length_filter"
    return f


# ---------------------------------------------------------------------------
# NGram / EdgeNGram / Shingle
# ---------------------------------------------------------------------------
def ngram_filter(min_gram: int = 1, max_gram: int = 2,
                 preserve_original: bool = False) -> TokenFilter:
    """NGramTokenFilter.java (modern semantics): every n-gram of each
    token, all at the source token's position."""

    def f(terms: list[str], positions: list[int]):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            emitted = False
            for n in range(min_gram, max_gram + 1):
                for i in range(0, len(t) - n + 1):
                    out_t.append(t[i : i + n])
                    out_p.append(p)
                    emitted = True
            if preserve_original and (not emitted or len(t) > max_gram
                                      or len(t) < min_gram):
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p

    f.__name__ = "ngram_filter"
    return f


def edge_ngram_filter(min_gram: int = 1, max_gram: int = 2,
                      preserve_original: bool = False) -> TokenFilter:
    """EdgeNGramTokenFilter.java: leading-edge grams only."""

    def f(terms: list[str], positions: list[int]):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            for n in range(min_gram, min(max_gram, len(t)) + 1):
                out_t.append(t[:n])
                out_p.append(p)
            # EdgeNGramTokenFilter.java:104-109 keeps the original both
            # when it is LONGER than max_gram and when it is SHORTER
            # than min_gram (which emitted no grams at all)
            if preserve_original and (len(t) > max_gram or len(t) < min_gram):
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p

    f.__name__ = "edge_ngram_filter"
    return f


FILLER_TOKEN = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN


def shingle_filter(min_size: int = 2, max_size: int = 2,
                   output_unigrams: bool = True,
                   token_separator: str = " ") -> TokenFilter:
    """ShingleFilter.java: word n-grams over the position-ordered
    stream; a position gap (removed stopword) contributes a ``_``
    filler. Shingles take the position of their first member."""
    if min_size < 2 or max_size < min_size:
        raise ValueError("shingle sizes must satisfy 2 <= min <= max")

    def f(terms: list[str], positions: list[int]):
        if not terms:
            return [], []
        # rebuild the dense position line with fillers in the gaps
        line: list[str] = []
        line_pos: list[int] = []
        prev = None
        for t, p in zip(terms, positions):
            if prev is not None:
                for gap in range(prev + 1, p):
                    line.append(FILLER_TOKEN)
                    line_pos.append(gap)
            line.append(t)
            line_pos.append(p)
            prev = p
        out_t, out_p = [], []
        for i, (t, p) in enumerate(zip(line, line_pos)):
            is_filler = t == FILLER_TOKEN
            if output_unigrams and not is_filler:
                out_t.append(t)
                out_p.append(p)
            for size in range(min_size, max_size + 1):
                if i + size > len(line):
                    break
                window = line[i : i + size]
                if all(w == FILLER_TOKEN for w in window):
                    continue  # all-filler shingles are never emitted
                out_t.append(token_separator.join(window))
                out_p.append(p)
        return out_t, out_p

    f.__name__ = "shingle_filter"
    return f


_CJK_RANGES = {
    "han": ((0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF)),
    "hiragana": ((0x3040, 0x309F),),
    "katakana": ((0x30A0, 0x30FF), (0xFF66, 0xFF9F)),
    "hangul": ((0xAC00, 0xD7AF), (0x1100, 0x11FF), (0x3130, 0x318F)),
}


def _cjk_script(t: str, enabled: frozenset[str]) -> bool:
    """True when every char of ``t`` is in ONE enabled CJK script —
    the token-type test of CJKBigramFilter (StandardTokenizer emits
    Han ideographs as single-char <IDEOGRAPHIC> tokens and
    hiragana/katakana/hangul as typed runs)."""
    for name in enabled:
        ranges = _CJK_RANGES[name]
        if all(any(lo <= ord(c) <= hi for lo, hi in ranges) for c in t):
            return True
    return False


def cjk_bigram_filter(han: bool = True, hiragana: bool = True,
                      katakana: bool = True, hangul: bool = True,
                      output_unigrams: bool = False) -> TokenFilter:
    """CJKBigramFilter (analysis/cjk/CJKBigramFilter.java): adjacent
    tokens of the enabled CJK writing systems combine into overlapping
    bigrams (the CJKAnalyzer strategy); a lone eligible token passes
    through as a unigram (SINGLE type, CJKBigramFilter.java:62,150);
    with ``output_unigrams`` both unigrams and bigrams are emitted
    (:42-44, :308,344). A bigram carries the position of its first
    member; adjacency requires consecutive positions (a stopword gap
    breaks the run, like the reference's position-increment check)."""
    enabled = frozenset(
        n for n, on in (("han", han), ("hiragana", hiragana),
                        ("katakana", katakana), ("hangul", hangul)) if on)

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        i, n = 0, len(terms)
        while i < n:
            if _cjk_script(terms[i], enabled):
                j = i
                while (j + 1 < n and _cjk_script(terms[j + 1], enabled)
                       and positions[j + 1] == positions[j] + 1):
                    j += 1
                run_t = terms[i:j + 1]
                run_p = positions[i:j + 1]
                if len(run_t) == 1:
                    out_t.append(run_t[0])
                    out_p.append(run_p[0])
                else:
                    for k in range(len(run_t) - 1):
                        if output_unigrams:
                            out_t.append(run_t[k])
                            out_p.append(run_p[k])
                        out_t.append(run_t[k] + run_t[k + 1])
                        out_p.append(run_p[k])
                    if output_unigrams:
                        out_t.append(run_t[-1])
                        out_p.append(run_p[-1])
                i = j + 1
            else:
                out_t.append(terms[i])
                out_p.append(positions[i])
                i += 1
        return out_t, out_p

    f.__name__ = "cjk_bigram_filter"
    return f


def stop_filter(stop_words: frozenset[str]) -> TokenFilter:
    """StopFilter as a chain member (position-gap preserving)."""

    def f(terms: list[str], positions: list[int]):
        keep = [(t, p) for t, p in zip(terms, positions) if t not in stop_words]
        return [t for t, _ in keep], [p for _, p in keep]

    f.__name__ = "stop_filter"
    return f


def lowercase_filter(terms: list[str], positions: list[int]):
    return [t.lower() for t in terms], positions


# ---------------------------------------------------------------------------
# CustomAnalyzer + Spark column application
# ---------------------------------------------------------------------------
class CustomAnalyzer:
    """CustomAnalyzer.builder() role (analysis/custom/CustomAnalyzer.
    java): char filters → StandardTokenizer → lowercase → user filter
    chain. Drop-in for :class:`StandardAnalyzer` wherever
    ``analyzer=`` is accepted (OracleIndex, percolate, components...).

    ``char_filters`` — str→str transforms applied BEFORE tokenization
    (HTMLStripCharFilter / MappingCharFilter role, see
    ``analysis/charfilters.py``)."""

    def __init__(self, filters: Iterable[TokenFilter] = (),
                 max_token_length: int = MAX_TOKEN_LENGTH,
                 char_filters: Iterable = ()):
        self.filters = list(filters)
        self.char_filters = list(char_filters)
        self.max_token_length = max_token_length

    def analyze(self, text: str) -> tuple[list[str], list[int]]:
        for cf in self.char_filters:
            text = cf(text)
        toks = standard_tokenize(text, self.max_token_length)
        terms = [t.lower() for t in toks]
        positions = list(range(len(terms)))
        for f in self.filters:
            terms, positions = f(terms, positions)
        return terms, positions

    def terms(self, text: str) -> list[str]:
        return self.analyze(text)[0]


def english_analyzer() -> CustomAnalyzer:
    """EnglishAnalyzer.java pipeline: standard → lowercase →
    possessive-strip → stop → porter."""
    from .tokenizer import ENGLISH_STOP_WORDS

    return CustomAnalyzer([
        english_possessive_filter,
        stop_filter(ENGLISH_STOP_WORDS),
        porter_stem_filter,
    ])


def filter_tokens_column(df, chain: Iterable[TokenFilter],
                         tokens_col: str = "tokens",
                         out_col: str | None = None):
    """Apply a filter chain to a Spark ``array<string>`` tokens column
    (position = array index on input; output tokens carry their terms
    only — builders that need filtered POSITIONS run the chain inside
    their own vectorized stage). One Arrow-batched pandas UDF for the
    whole chain — the Spark-side twin of :class:`CustomAnalyzer`."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    chain = list(chain)

    @F.pandas_udf(ArrayType(StringType()))
    def apply_chain(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            terms = list(toks) if toks is not None else []
            positions = list(range(len(terms)))
            for f in chain:
                terms, positions = f(terms, positions)
            out.append(terms)
        return pd.Series(out)

    return df.withColumn(out_col or tokens_col, apply_chain(F.col(tokens_col)))


def analysis_stages(analyzer: CustomAnalyzer, text: str) -> list[dict]:
    """FieldAnalysisRequestHandler role (solr/core/src/java/org/apache/
    solr/handler/FieldAnalysisRequestHandler.java + AnalysisRequestHandlerBase
    :95-161): run the analysis chain stage by stage and report the
    token stream AFTER each component — the /analysis/field debug
    surface that shows which stage dropped/altered each token.

    Returns one dict per stage: {"stage": name, "terms": [...],
    "positions": [...]} — char filters (text-level), the tokenizer,
    the implicit lowercase, then every token filter in chain order.
    """
    out: list[dict] = []
    for cf in analyzer.char_filters:
        text = cf(text)
        name = getattr(cf, "__name__", type(cf).__name__)
        out.append({"stage": f"charfilter:{name}", "text": text})
    toks = standard_tokenize(text, analyzer.max_token_length)
    positions = list(range(len(toks)))
    out.append({"stage": "tokenizer:standard", "terms": list(toks),
                "positions": list(positions)})
    terms = [t.lower() for t in toks]
    out.append({"stage": "filter:lowercase", "terms": list(terms),
                "positions": list(positions)})
    for f in analyzer.filters:
        terms, positions = f(terms, positions)
        name = getattr(f, "__name__", type(f).__name__)
        out.append({"stage": f"filter:{name}", "terms": list(terms),
                    "positions": list(positions)})
    return out
