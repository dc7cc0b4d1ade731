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


def ascii_folding_preserve_filter(terms: list[str], positions: list[int]):
    """ASCIIFoldingFilter(preserveOriginal=true)
    (miscellaneous/ASCIIFoldingFilter.java:66-75): when folding changes
    the token, emit the folded form AND the original stacked at the
    same position (posIncrement 0)."""
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        f = ascii_fold(t)
        out_t.append(f)
        out_p.append(p)
        if f != t:
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def fingerprint_filter(separator: str = " ",
                       max_output_token_size: int = 1024) -> TokenFilter:
    """FingerprintFilter (miscellaneous/FingerprintFilter.java): the
    whole stream collapses to ONE token — the sorted, deduplicated
    terms joined by ``separator`` (Solr's FingerprintFilterFactory;
    near-dup clustering keys). Streams whose fingerprint exceeds
    ``max_output_token_size`` emit nothing, like the reference."""

    def f(terms: list[str], positions: list[int]):
        if not terms:
            return [], []
        fp = separator.join(sorted(set(terms)))
        if len(fp) > max_output_token_size:
            return [], []
        return [fp], [0]

    f.__name__ = "fingerprint_filter"
    return f


# default-ignorable ranges removed by UTR#30 folding (variation
# selectors + Mongolian FVS; Cf chars are caught by category), plus
# the spacing kana voicing marks and prolonged-sound mark that the
# reference's DiacriticFolding.txt:131-132 removes (3099..309C>,
# 30FC> — the combining 3099/309A fall to the ccc>0 strip)
_IGNORABLE_RANGES = ((0xFE00, 0xFE0F), (0x180B, 0x180D),
                     (0x309B, 0x309C), (0x30FC, 0x30FC))


def icu_fold(s: str) -> str:
    """ICUFoldingFilter role (analysis/icu/src/java/.../ICUFoldingFilter
    .java: UTR#30 character foldings — accent removal, case folding,
    width folding, canonical duplicates, sub/superscripts, NFKC; "all
    foldings ... applied recursively to ensure a fully folded and
    normalized result"). Approximated from Unicode data the stdlib
    ships: NFKC + casefold + true-diacritic strip (combining class >
    0, which spares Indic matras and other ccc=0 spacing vowels) +
    default-ignorable removal, iterated to a fixpoint. The reference's
    data file (utr30.nrm) additionally folds Han radicals, Jamo, and
    Suzhou numerals — out of scope here, documented divergence."""
    prev = None
    while s != prev:
        prev = s
        s = unicodedata.normalize("NFKC", s).casefold()
        s = "".join(
            c for c in unicodedata.normalize("NFD", s)
            if unicodedata.combining(c) == 0
        )
        s = unicodedata.normalize("NFKC", s)
        s = "".join(
            c for c in s
            if unicodedata.category(c) != "Cf"
            and not any(lo <= ord(c) <= hi for lo, hi in _IGNORABLE_RANGES)
        )
    return s


def icu_folding_filter(terms: list[str], positions: list[int]):
    return [icu_fold(t) for t in terms], positions


def common_grams_filter(common_words: frozenset[str],
                        separator: str = "_",
                        query_mode: bool = False) -> TokenFilter:
    """CommonGramsFilter (commongrams/CommonGramsFilter.java:85-90):
    for each adjacent token pair where EITHER member is a common word,
    also emit the bigram ``w1_w2`` stacked at the first member's
    position (posIncrement 0) — phrase queries containing stopwords
    hit the rare bigram posting instead of the huge stopword posting.

    ``query_mode`` gives CommonGramsQueryFilter
    (CommonGramsQueryFilter.java:72-90): output bigrams whenever
    possible and a unigram only when it is not a member of any bigram
    ("the rain in spain falls" → the_rain, rain_in, in_spain, falls),
    with output positions renumbered sequentially (the filter resets
    gram posIncrement to 1)."""

    def f(terms: list[str], positions: list[int]):
        n = len(terms)
        gram_at = []  # (index i, gram text) for pair (i, i+1)
        for i in range(n - 1):
            if positions[i + 1] == positions[i] + 1 and (
                    terms[i] in common_words or terms[i + 1] in common_words):
                gram_at.append((i, terms[i] + separator + terms[i + 1]))
        if not query_mode:
            out_t, out_p = [], []
            grams = dict(gram_at)
            for i, (t, p) in enumerate(zip(terms, positions)):
                out_t.append(t)
                out_p.append(p)
                if i in grams:
                    out_t.append(grams[i])
                    out_p.append(p)  # stacked (posInc 0)
            return out_t, out_p
        covered = set()
        for i, _g in gram_at:
            covered.add(i)
            covered.add(i + 1)
        grams = dict(gram_at)
        out_t = []
        for i in range(n):
            if i in grams:
                out_t.append(grams[i])
            if i not in covered:
                out_t.append(terms[i])
        return out_t, list(range(len(out_t)))

    f.__name__ = "common_grams_filter"
    return f


#: default elidable French articles (fr/FrenchAnalyzer.java
#: DEFAULT_ARTICLES: l, m, t, qu, n, s, j, d, c, jusqu, quoiqu,
#: lorsqu, puisqu)
FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"])


def elision_filter(articles: frozenset[str] = FRENCH_ARTICLES) -> TokenFilter:
    """ElisionFilter (util/ElisionFilter.java): strip a leading
    elided article + apostrophe (``l'avion`` → ``avion``); both the
    ASCII apostrophe and U+2019 count."""

    def f(terms: list[str], positions: list[int]):
        out = []
        for t in terms:
            for apo in ("'", "’"):
                k = t.find(apo)
                if 0 < k and t[:k].lower() in articles:
                    t = t[k + 1:]
                    break
            out.append(t)
        keep = [(t, p) for t, p in zip(out, positions) if t]
        return [t for t, _ in keep], [p for _, p in keep]

    f.__name__ = "elision_filter"
    return f


def keyword_repeat_stem_filter(stem=porter_stem) -> TokenFilter:
    """KeywordRepeatFilter + stemmer (miscellaneous/KeywordRepeatFilter
    .java: emit each token twice, once keyword-marked so the stemmer
    skips it — indexing BOTH the original and the stemmed form at one
    position; RemoveDuplicatesTokenFilter then drops the pair when the
    stem is a no-op). The three stages fused for our attribute-less
    chain: emit original + stacked stem when they differ."""

    def f(terms: list[str], positions: list[int]):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            s = stem(t)
            if s != t:
                out_t.append(s)
                out_p.append(p)  # stacked (posInc 0)
        return out_t, out_p

    f.__name__ = "keyword_repeat_stem_filter"
    return f


def protected_stem_filter(keywords: frozenset[str] = frozenset(),
                          overrides: dict[str, str] | None = None,
                          stem=porter_stem) -> TokenFilter:
    """KeywordMarkerFilter + StemmerOverrideFilter + stemmer, fused
    (miscellaneous/SetKeywordMarkerFilter.java:24-34 sets
    KeywordAttribute so downstream stemmers skip the token;
    miscellaneous/StemmerOverrideFilter.java replaces the term from a
    dictionary AND marks it keyword). Our chain carries no attribute
    channel, so the three stages collapse into one callable:
    ``overrides`` wins, ``keywords`` pass through unstemmed, the rest
    go through ``stem``."""
    overrides = overrides or {}

    def f(terms: list[str], positions: list[int]):
        out = []
        for t in terms:
            if t in overrides:
                out.append(overrides[t])
            elif t in keywords:
                out.append(t)
            else:
                out.append(stem(t))
        return out, list(positions)

    f.__name__ = "protected_stem_filter"
    return f


def trim_filter(terms: list[str], positions: list[int]):
    """TrimFilter (miscellaneous/TrimFilter.java): strip leading/
    trailing whitespace from each token (pattern/keyword tokenizers
    can emit padded tokens); tokens trimming to empty keep their slot
    removed with a position gap."""
    keep = [(t.strip(), p) for t, p in zip(terms, positions)]
    keep = [(t, p) for t, p in keep if t]
    return [t for t, _ in keep], [p for _, p in keep]


def reverse_string_filter(terms: list[str], positions: list[int]):
    """ReverseStringFilter (reverse/ReverseStringFilter.java): reverse
    each token — index-time front end for leading-wildcard search
    (``*suffix`` becomes a prefix scan over the reversed field, the
    ReversedWildcardFilterFactory trick)."""
    return [t[::-1] for t in terms], list(positions)


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
    (:42-44, :308,344). A run's tokens are decomposed to CODEPOINTS
    before bigramming (refill(), :276-291) — a lone multi-char
    katakana token still emits char bigrams, and only a lone single
    codepoint passes as a unigram. A bigram carries the position of
    its first member codepoint's source token; adjacency requires
    consecutive positions (a stopword gap breaks the run, like the
    reference's offset-alignment check — the offset-faithful variant,
    fed by the typed tokenizer, lives in ``analysis/cjk.py``)."""
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
                # per-codepoint buffer, each char tagged with its
                # source token's position
                buf = [(c, positions[k])
                       for k in range(i, j + 1) for c in terms[k]]
                if len(buf) == 1:
                    out_t.append(buf[0][0])
                    out_p.append(buf[0][1])
                else:
                    for k in range(len(buf) - 1):
                        if output_unigrams:
                            out_t.append(buf[k][0])
                            out_p.append(buf[k][1])
                        out_t.append(buf[k][0] + buf[k + 1][0])
                        out_p.append(buf[k][1])
                    if output_unigrams:
                        out_t.append(buf[-1][0])
                        out_p.append(buf[-1][1])
                i = j + 1
            else:
                out_t.append(terms[i])
                out_p.append(positions[i])
                i += 1
        return out_t, out_p

    f.__name__ = "cjk_bigram_filter"
    return f


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter
# ---------------------------------------------------------------------------
# char classes — WordDelimiterIterator.java:25-28
_WD_LOWER, _WD_UPPER, _WD_DIGIT, _WD_DELIM = 0x01, 0x02, 0x04, 0x08
_WD_ALPHA = _WD_LOWER | _WD_UPPER
_WD_DONE = -1


def _wd_char_type(ch: str) -> int:
    """WordDelimiterIterator.getType (java:289-331): Unicode category →
    LOWER/UPPER/ALPHA/DIGIT, everything else a subword delimiter."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return _WD_UPPER
    if cat == "Ll":
        return _WD_LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return _WD_ALPHA
    if cat in ("Nd", "Nl", "No"):
        return _WD_DIGIT
    if cat == "Cs":  # surrogate: prevent splitting (java:314-315)
        return _WD_ALPHA | _WD_DIGIT
    return _WD_DELIM


class _WordDelimiterIterator:
    """Faithful port of WordDelimiterIterator.java (subword boundary
    scan: delimiter runs, case transitions, alpha<->digit transitions,
    trailing-possessive stripping)."""

    def __init__(self, text: str, split_on_case_change: bool,
                 split_on_numerics: bool, stem_english_possessive: bool):
        self.text = text
        self.split_case = split_on_case_change
        self.split_num = split_on_numerics
        self.stem_poss = stem_english_possessive
        self.types = [_wd_char_type(c) for c in text]
        self.current = 0
        self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        # setBounds (java:241-253): trim leading/trailing delimiter runs
        self.start_bounds = 0
        self.end_bounds = len(text)
        while (self.start_bounds < len(text)
               and self.types[self.start_bounds] & _WD_DELIM):
            self.start_bounds += 1
        while (self.end_bounds > self.start_bounds
               and self.types[self.end_bounds - 1] & _WD_DELIM):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        # java:261-268
        t = self.text
        return (self.stem_poss and pos > 2
                and t[pos - 2] == "'" and t[pos - 1] in ("s", "S")
                and (self.types[pos - 3] & _WD_ALPHA) != 0
                and (pos == self.end_bounds
                     or (self.types[pos] & _WD_DELIM) != 0))

    def _is_break(self, last_type: int, cur_type: int) -> bool:
        # java:204-221
        if cur_type & last_type:
            return False
        is_alpha = lambda x: (x & _WD_ALPHA) != 0
        if not self.split_case and is_alpha(last_type) and is_alpha(cur_type):
            return False
        if (last_type & _WD_UPPER) and is_alpha(cur_type):
            return False  # UPPER->letter: don't split (WiFi -> Wi,Fi not W,i...)
        if not self.split_num and (
                (is_alpha(last_type) and (cur_type & _WD_DIGIT))
                or ((last_type & _WD_DIGIT) and is_alpha(cur_type))):
            return False
        return True

    def next(self) -> int:
        # java:122-156
        self.current = self.end
        if self.current == _WD_DONE:
            return _WD_DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = self.types[self.current]
            if not (last_type & _WD_DELIM):
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _WD_DONE
            return _WD_DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            t = self.types[self.end]
            if self._is_break(last_type, t):
                break
            last_type = t
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        # java:165-179 — type of first char; LOWER/UPPER both -> ALPHA
        if self.end == _WD_DONE:
            return 0
        t = self.types[self.current]
        return _WD_ALPHA if t & _WD_ALPHA and not t & _WD_DIGIT else t

    def is_single_word(self) -> bool:
        # java:228-235
        if self.has_final_possessive:
            return (self.current == self.start_bounds
                    and self.end == self.end_bounds - 2)
        return self.current == self.start_bounds and self.end == self.end_bounds


class _WDConcat:
    """WordDelimiterConcatenation (WordDelimiterGraphFilter.java:595-646)."""

    __slots__ = ("parts", "start_pos", "type", "subword_count")

    def __init__(self):
        self.parts: list[str] = []
        self.start_pos = 0
        self.type = 0
        self.subword_count = 0

    def append(self, text: str):
        self.parts.append(text)
        self.subword_count += 1

    def clear(self):
        self.parts = []
        self.type = self.subword_count = 0


def word_delimiter_graph_filter(
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
    protected_words: frozenset[str] = frozenset(),
) -> TokenFilter:
    """WordDelimiterGraphFilter (miscellaneous/WordDelimiterGraphFilter
    .java, boundary scan per WordDelimiterIterator.java) — splits
    tokens into subwords on delimiters / case changes / alpha<->digit
    transitions and optionally catenates runs; the filter that makes
    ``camelCase``/``snake_case``/``wi-fi`` identifiers searchable by
    subword, which is why it matters for a source-code corpus.

    Defaults match WordDelimiterGraphFilterFactory's (generate parts,
    split on case + numerics, stem possessives; no catenation).

    Graph positions are rendered into this package's flat ``(terms,
    positions)`` stream the same way the index consumes Lucene's graph:
    each subword takes one position; a catenation/preserved original
    starts at its run's first position (posLength is dropped, as
    Lucene's indexer itself drops it); a token of pure delimiters is
    swallowed leaving a position hole (accumPosInc semantics,
    WordDelimiterGraphFilter.java:361-369)."""

    def should_concat(word_type: int) -> bool:
        return ((catenate_words and word_type & _WD_ALPHA != 0)
                or (catenate_numbers and word_type & _WD_DIGIT != 0))

    def should_generate(word_type: int) -> bool:
        return ((generate_word_parts and word_type & _WD_ALPHA != 0)
                or (generate_number_parts and word_type & _WD_DIGIT != 0))

    def buffer_word_parts(text: str, it: _WordDelimiterIterator):
        """bufferWordParts (java:259-337): returns the sorted list of
        (term, start_pos, end_pos) plus the token's position width."""
        parts: list[tuple[str, int, int]] = []
        word_pos = 0
        concat = _WDConcat()
        concat_all = _WDConcat()
        last_concat_count = 0

        def flush_concat(c: _WDConcat):
            # flushConcatenation (java:533-543)
            nonlocal word_pos, last_concat_count
            if word_pos == c.start_pos:
                word_pos += 1
            last_concat_count = c.subword_count
            if c.subword_count != 1 or not should_generate(c.type):
                parts.append(("".join(c.parts), c.start_pos, word_pos))
            c.clear()

        if it.is_single_word():
            parts.append((text[it.current:it.end], 0, 1))
            word_pos = 1
            it.next()
        else:
            while it.end != _WD_DONE:
                word_type = it.type()
                if concat.parts and (concat.type & word_type) == 0:
                    flush_concat(concat)
                if should_concat(word_type):
                    if not concat.parts:
                        concat.type = word_type
                        concat.start_pos = word_pos
                    concat.append(text[it.current:it.end])
                if catenate_all:
                    if not concat_all.parts:
                        concat_all.type = word_type
                        concat_all.start_pos = word_pos
                    concat_all.append(text[it.current:it.end])
                if should_generate(word_type):
                    parts.append((text[it.current:it.end], word_pos, word_pos + 1))
                    word_pos += 1
                it.next()
            if concat.parts:
                flush_concat(concat)
            if concat_all.parts:
                # only if not already emitted by CATENATE_WORDS (java:310-319)
                if concat_all.subword_count > last_concat_count:
                    if word_pos == concat_all.start_pos:
                        word_pos += 1
                    parts.append(("".join(concat_all.parts),
                                  concat_all.start_pos, word_pos))
                concat_all.clear()
        if preserve_original:
            if word_pos == 0:
                word_pos = 1
            parts.append((text, 0, word_pos))
        # PositionSorter (java:439-460): start asc, longer span first
        parts.sort(key=lambda x: (x[1], -x[2]))
        return parts, word_pos

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        next_out = 0
        prev_in: int | None = None
        for tok, pin in zip(terms, positions):
            gap = (pin - prev_in - 1) if prev_in is not None else pin
            base = next_out + gap
            prev_in = pin
            it = _WordDelimiterIterator(
                tok, split_on_case_change, split_on_numerics,
                stem_english_possessive)
            it.next()
            # no delimiters at all, or protected: pass through (java:358-364)
            if ((it.current == 0 and it.end == len(tok))
                    or tok in protected_words):
                out_t.append(tok)
                out_p.append(base)
                next_out = base + 1
                continue
            # pure delimiters: swallow, leaving a hole (java:366-374)
            if it.end == _WD_DONE:
                if preserve_original:
                    out_t.append(tok)
                    out_p.append(base)
                next_out = base + 1
                continue
            parts, width = buffer_word_parts(tok, it)
            for text_part, sp, _ep in parts:
                out_t.append(text_part)
                out_p.append(base + sp)
            next_out = base + max(width, 1)
        return out_t, out_p

    f.__name__ = "word_delimiter_graph_filter"
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
    ``analysis/charfilters.py``).

    ``tokenizer`` — a ``(text, max_token_length) -> list[str]``
    callable; defaults to ``standard_tokenize``.  ``lowercase=False``
    skips the built-in LowerCaseFilter stage so case-sensitive filters
    (WordDelimiterGraphFilter's splitOnCaseChange) can run first and
    lowercase later in their own chain — the whitespace→WDGF→lowercase
    ordering the reference recommends (WordDelimiterGraphFilter.java:
    94-97)."""

    def __init__(self, filters: Iterable[TokenFilter] = (),
                 max_token_length: int = MAX_TOKEN_LENGTH,
                 char_filters: Iterable = (),
                 tokenizer: Callable[[str, int], list[str]] | None = None,
                 lowercase: bool = True):
        self.filters = list(filters)
        self.char_filters = list(char_filters)
        self.max_token_length = max_token_length
        self.tokenizer = tokenizer or standard_tokenize
        self.lowercase = lowercase

    def analyze(self, text: str) -> tuple[list[str], list[int]]:
        for cf in self.char_filters:
            text = cf(text)
        toks = self.tokenizer(text, self.max_token_length)
        terms = [t.lower() for t in toks] if self.lowercase else list(toks)
        positions = list(range(len(terms)))
        for f in self.filters:
            terms, positions = f(terms, positions)
        return terms, positions

    def terms(self, text: str) -> list[str]:
        return self.analyze(text)[0]

    def analyze_stages(self, text: str) -> list[tuple[str, list[tuple[str, int]]]]:
        """Per-stage analysis trace — the FieldAnalysisRequestHandler /
        AnalysisRequestHandlerBase role (solr/core/.../handler/
        FieldAnalysisRequestHandler.java:56-71,
        AnalysisRequestHandlerBase.java:90-145: the response lists the
        token stream AFTER each char filter, the tokenizer, and each
        token filter, so a schema author can see which stage ate or
        rewrote a token). Returns ``[(stage_name, [(term, position),
        ...]), ...]`` in pipeline order."""
        stages: list[tuple[str, list[tuple[str, int]]]] = []
        for cf in self.char_filters:
            text = cf(text)
            name = getattr(cf, "__name__", type(cf).__name__)
            # char filters operate pre-tokenization: show the text as a
            # single pseudo-token the way the Solr response shows the
            # transformed char stream
            stages.append((f"charfilter:{name}", [(text, 0)]))
        toks = self.tokenizer(text, self.max_token_length)
        tname = getattr(self.tokenizer, "__name__", type(self.tokenizer).__name__)
        stages.append((f"tokenizer:{tname}",
                       [(t, i) for i, t in enumerate(toks)]))
        terms = [t.lower() for t in toks] if self.lowercase else list(toks)
        positions = list(range(len(terms)))
        if self.lowercase:
            stages.append(("filter:lowercase",
                           list(zip(terms, positions))))
        for f in self.filters:
            terms, positions = f(terms, positions)
            name = getattr(f, "__name__", type(f).__name__)
            stages.append((f"filter:{name}", list(zip(terms, positions))))
        return stages


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


def tokenize_column(df, text_col: str = "content",
                    out_col: str = "tokens",
                    tokenizer: Callable[[str, int], list[str]] | None = None,
                    chain: Iterable[TokenFilter] = (),
                    lowercase: bool = True,
                    max_token_length: int = MAX_TOKEN_LENGTH):
    """The §2.12 "swappable tokenize UDF" extension point as a Spark
    column op: text column → ``array<string>`` tokens with any zoo
    tokenizer (standard/whitespace/keyword/letter/pattern/
    path-hierarchy/URL-email) + optional filter chain, one Arrow-
    batched pandas UDF for the whole pipeline. The flagship build path
    keeps its JVM-expression tokenizer (analysis/jvm.py) — this is the
    pluggable slow-path twin for custom per-field analyzers."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    tok = tokenizer or standard_tokenize
    chain = list(chain)

    @F.pandas_udf(ArrayType(StringType()))
    def apply_pipeline(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            terms = tok(t, max_token_length) if t is not None else []
            if lowercase:
                terms = [w.lower() for w in terms]
            positions = list(range(len(terms)))
            for f in chain:
                terms, positions = f(terms, positions)
            out.append(terms)
        return pd.Series(out)

    return df.withColumn(out_col, apply_pipeline(F.col(text_col)))


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


def delimited_payload_filter(delimiter: str = "|") -> TokenFilter:
    """DelimitedPayloadTokenFilter (analysis/payloads/
    DelimitedPayloadTokenFilter.java): tokens of the form
    ``term|payload`` index as ``term``. The chain protocol carries
    (terms, positions) only, so the payload side-channel is
    materialized separately with :func:`extract_payloads` (the engine
    keeps payloads as a positions-aligned float column — see the
    ``payload_score`` suite row)."""

    def f(terms: list[str], positions: list[int]):
        return ([t.split(delimiter, 1)[0] for t in terms],
                list(positions))

    f.__name__ = "delimited_payload_filter"
    return f


def extract_payloads(terms: list[str], delimiter: str = "|",
                     default: float = 1.0) -> tuple[list[str], list[float]]:
    """Split delimited-payload tokens into (bare terms, float
    payloads); tokens without a delimiter (or with a non-numeric
    payload, which the reference's FloatEncoder would reject) carry
    ``default``."""
    out_t, out_p = [], []
    for t in terms:
        term, sep, pay = t.partition(delimiter)
        if sep:
            try:
                out_p.append(float(pay))
            except ValueError:
                out_p.append(default)
        else:
            out_p.append(default)
        out_t.append(term)
    return out_t, out_p


def keep_word_filter(words, lower_case: bool = False) -> TokenFilter:
    """KeepWordFilter (miscellaneous/KeepWordFilter.java): the inverse
    of a stop filter — only tokens IN ``words`` survive; removed slots
    leave a position gap like StopFilter (the reference extends
    FilteringTokenFilter, which bumps posIncrement)."""
    keep = {w.lower() for w in words} if lower_case else set(words)

    def f(terms: list[str], positions: list[int]):
        pairs = [(t, p) for t, p in zip(terms, positions)
                 if (t.lower() if lower_case else t) in keep]
        return [t for t, _ in pairs], [p for _, p in pairs]

    f.__name__ = "keep_word_filter"
    return f


def limit_token_count_filter(max_token_count: int) -> TokenFilter:
    """LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter.java:
    34-44): index only the first ``max_token_count`` tokens of a field
    (huge-document guard). consumeAllTokens has no analogue here — the
    chain owns the whole token list either way."""

    def f(terms: list[str], positions: list[int]):
        return terms[:max_token_count], positions[:max_token_count]

    f.__name__ = "limit_token_count_filter"
    return f


def truncate_filter(length: int) -> TokenFilter:
    """TruncateTokenFilter (miscellaneous/TruncateTokenFilter.java):
    cut every token to at most ``length`` chars (agrammatical-language
    stemming / prefix bucketing)."""

    def f(terms: list[str], positions: list[int]):
        return [t[:length] for t in terms], list(positions)

    f.__name__ = "truncate_filter"
    return f


def decimal_digit_filter(terms: list[str], positions: list[int]):
    """DecimalDigitFilter (core/DecimalDigitFilter.java:42-56): fold
    any Unicode decimal digit (Nd category — Arabic-Indic, Devanagari,
    fullwidth…) to its 0-9 equivalent."""
    import unicodedata

    def fold(t: str) -> str:
        return "".join(
            chr(ord("0") + unicodedata.decimal(c))
            if c > "\x7f" and unicodedata.category(c) == "Nd" else c
            for c in t)

    return [fold(t) for t in terms], list(positions)


def pattern_capture_group_filter(patterns, preserve_original: bool = True
                                 ) -> TokenFilter:
    """PatternCaptureGroupTokenFilter (pattern/
    PatternCaptureGroupTokenFilter.java:31-102): emit one token per
    capture group per match of each pattern, all stacked at the
    original token's position (posIncrement 0 in the reference);
    ``preserve_original`` keeps the input token too, and a token no
    pattern matches always passes through."""
    import re as _re

    pats = [_re.compile(p) if isinstance(p, str) else p for p in patterns]

    def f(terms: list[str], positions: list[int]):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            emitted = []
            for pat in pats:
                for m in pat.finditer(t):
                    for g in range(1, (pat.groups or 0) + 1):
                        if m.group(g):
                            emitted.append(m.group(g))
            if not emitted:
                out_t.append(t)
                out_p.append(p)
                continue
            if preserve_original:
                out_t.append(t)
                out_p.append(p)
            for e in emitted:
                out_t.append(e)
                out_p.append(p)          # stacked, posIncrement 0
        return out_t, out_p

    f.__name__ = "pattern_capture_group_filter"
    return f
