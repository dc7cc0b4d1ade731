"""CJK analysis: CJKWidthFilter + CJKBigramFilter + CJKAnalyzer.

Reference semantics (all public):
  * CJKWidthFilter — analysis/common/src/java/org/apache/lucene/
    analysis/cjk/CJKWidthFilter.java: fold fullwidth ASCII variants
    (U+FF01–FF5E) to basic latin, halfwidth katakana (U+FF65–FF9F) to
    the equivalent kana, combining a halfwidth voiced/semi-voiced
    sound mark with the preceding kana when a composed form exists
    (its KANA_NORM / KANA_COMBINE_* byte tables are generated from
    exactly the Unicode NFKC / canonical-composition data we use
    here — "this filter can be viewed as a (practical) subset of
    NFKC", CJKWidthFilter.java:34).
  * CJKBigramFilter — cjk/CJKBigramFilter.java: form overlapping
    character bigrams from runs of Han/Hiragana/Katakana/Hangul
    tokens whose offsets chain (startOffset == previous endOffset,
    :183), pass all other tokens through unchanged, emit a lone CJK
    character as a unigram, and optionally emit unigrams alongside
    bigrams (the combined unigram+bigram mode, bigrams stacked at the
    unigram's position with posLength 2, :306-312).
  * CJKAnalyzer — cjk/CJKAnalyzer.java:86-94: StandardTokenizer →
    CJKWidthFilter → LowerCaseFilter → CJKBigramFilter → StopFilter.

The bigram trick is the classic no-dictionary CJK indexing strategy:
queries analyzed the same way turn into phrase-like bigram
conjunctions, giving substring-match behavior without a segmenter.
"""

from __future__ import annotations

import unicodedata

from .tokenizer import MAX_TOKEN_LENGTH, standard_tokenize_full

#: script flags (CJKBigramFilter.java:52-58)
HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL_CJK = HAN | HIRAGANA | KATAKANA | HANGUL

_FLAG_BY_TYPE = {
    "<IDEOGRAPHIC>": HAN,
    "<HIRAGANA>": HIRAGANA,
    "<KATAKANA>": KATAKANA,
    "<HANGUL>": HANGUL,
}

#: types stamped on emitted tokens (CJKBigramFilter.java:61-64)
DOUBLE_TYPE = "<DOUBLE>"
SINGLE_TYPE = "<SINGLE>"


def cjk_width_fold(term: str) -> str:
    """CJKWidthFilter on one token: fullwidth ASCII → latin, halfwidth
    katakana → kana, halfwidth voiced marks composed into the previous
    kana where Unicode defines a composition (else kept as the
    standalone combining mark, the reference's fallback)."""
    out: list[str] = []
    for ch in term:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif cp in (0xFF9E, 0xFF9F):
            mark = "゙" if cp == 0xFF9E else "゚"
            if out:
                composed = unicodedata.normalize("NFC", out[-1] + mark)
                if len(composed) == 1:
                    out[-1] = composed
                    continue
            out.append(mark)
        elif 0xFF65 <= cp <= 0xFF9D:
            out.append(unicodedata.normalize("NFKC", ch))
        else:
            out.append(ch)
    return "".join(out)


def cjk_width_filter(terms: list[str], positions: list[int]):
    """Chain-compatible TokenFilter form of :func:`cjk_width_fold`
    (plugs into ``CustomAnalyzer(filters=[...])``)."""
    return [cjk_width_fold(t) for t in terms], list(positions)


def cjk_bigrams(
    tokens: list[tuple[str, str, int, int]],
    flags: int = ALL_CJK,
    output_unigrams: bool = False,
) -> list[tuple[str, str, int]]:
    """CJKBigramFilter over ``(term, type, start, end)`` tokens →
    ``(term, type, position)``.

    A *run* is a maximal sequence of CJK tokens (of flag-enabled
    scripts) whose offsets chain; its codepoints are bigrammed
    ``ABC → AB BC`` (a 1-char run emits the unigram). Every emitted
    run token advances the position by 1 (the reference clears
    attributes → default increment); in ``output_unigrams`` mode the
    order is ``A, AB, B, BC, C`` with each bigram stacked at its first
    unigram's position (posIncrement 0, CJKBigramFilter.java:306-312).
    Non-CJK tokens pass through with their own position slot.
    """
    out: list[tuple[str, str, int]] = []
    pos = -1
    buf: list[str] = []  # codepoints of the current run
    last_end: int | None = None

    def flush() -> None:
        nonlocal pos
        if not buf:
            return
        if len(buf) == 1:
            pos += 1
            out.append((buf[0], SINGLE_TYPE, pos))
        elif output_unigrams:
            for i, c in enumerate(buf):
                pos += 1
                out.append((c, SINGLE_TYPE, pos))
                if i + 1 < len(buf):
                    out.append((c + buf[i + 1], DOUBLE_TYPE, pos))
        else:
            for i in range(len(buf) - 1):
                pos += 1
                out.append((buf[i] + buf[i + 1], DOUBLE_TYPE, pos))
        buf.clear()

    for term, typ, start, end in tokens:
        if _FLAG_BY_TYPE.get(typ, 0) & flags:
            if buf and start != last_end:  # unaligned: new run (:183)
                flush()
            buf.extend(term)  # per-codepoint (refill(), :276-291)
            last_end = end
        else:
            flush()
            last_end = None
            pos += 1
            out.append((term, typ, pos))
    flush()
    return out


class CJKAnalyzer:
    """CJKAnalyzer.java:86-94 pipeline. ``analyze`` returns the
    package-standard ``(terms, positions)`` stream; removed stopwords
    leave position gaps (StopFilter semantics). ``stop_words`` applies
    to the passthrough (non-CJK) tokens — bigrammed CJK text never
    collides with an English stop list."""

    def __init__(
        self,
        stop_words: frozenset[str] | None = None,
        flags: int = ALL_CJK,
        output_unigrams: bool = False,
        max_token_length: int = MAX_TOKEN_LENGTH,
    ):
        self.stop_words = stop_words or frozenset()
        self.flags = flags
        self.output_unigrams = output_unigrams
        self.max_token_length = max_token_length

    def analyze(self, text: str) -> tuple[list[str], list[int]]:
        toks = [
            (cjk_width_fold(t).lower(), typ, s, e)
            for t, typ, s, e in standard_tokenize_full(text, self.max_token_length)
        ]
        terms: list[str] = []
        positions: list[int] = []
        for term, _typ, pos in cjk_bigrams(toks, self.flags, self.output_unigrams):
            if term in self.stop_words:
                continue  # position gap
            terms.append(term)
            positions.append(pos)
        return terms, positions
