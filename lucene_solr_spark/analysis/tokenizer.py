"""StandardAnalyzer-equivalent analysis chain.

Reimplements the *semantics* of Lucene's StandardTokenizer (UAX#29
word-break rules WB1-WB14, grammar at
lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex:134-197),
LowerCaseFilter, and StopFilter (position-increment-preserving gap
behavior, analysis/FilteringTokenFilter.java:47-57) as Python regex
tokenization suitable for vectorized pandas UDFs.

Two engines, golden-tested to agree on ASCII input:

* a full-Unicode pattern built on the third-party ``regex`` module's
  Unicode word-break properties (mirrors the JFlex rule set:
  NUMERIC before WORD for typing, Han/Hiragana single-char tokens,
  SEA runs, katakana runs, ``_`` = ExtendNumLet gluing groups);
* an ASCII fast path on the stdlib ``re`` module (source code is
  overwhelmingly ASCII; ``str.isascii()`` dispatch).

Token chopping at 255 chars matches StandardAnalyzer's default
``maxTokenLength`` buffer behavior (StandardAnalyzer.java:37,61-69:
"Tokens larger than this will be chopped up at this token length and
emitted as multiple tokens").
"""

from __future__ import annotations

import re
from functools import lru_cache

try:  # full-Unicode engine (optional at runtime; ASCII path needs only stdlib)
    import regex as _uregex
except ImportError:  # pragma: no cover
    _uregex = None

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET, 33 words
# (lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:45-49)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


# ---------------------------------------------------------------------------
# ASCII fast path (stdlib re). Classes restricted to the ASCII members of the
# corresponding UAX#29 word-break classes:
#   ALetter       ⊇ [A-Za-z]
#   Numeric       ⊇ [0-9]
#   MidLetter     ⊇ [:]          (Unicode 6.3: ':' is MidLetter)
#   MidNumLet     ⊇ [.']         Single_Quote = [']
#   MidNum        ⊇ [,;]
#   ExtendNumLet  ⊇ [_]
# No ASCII char is Extend/Format, so the (Extend|Format)* suffixes vanish.
# ---------------------------------------------------------------------------
_A_AL = "[A-Za-z]"
_A_NUM = "[0-9]"
_A_MIDLET = "[:.']"  # MidLetter | MidNumLet | Single_Quote (letter context)
_A_MIDNUM = "[,;.']"  # MidNum | MidNumLet | Single_Quote (numeric context)
_A_ENL = "_"

# numeric chain: Num ((ENL* | MidNumeric) Num)*
_A_NUM_CHAIN = f"{_A_NUM}(?:(?:{_A_ENL}*|{_A_MIDNUM}){_A_NUM})*"
# letter chain: AL ((ENL* | MidLetter) AL)*
_A_AL_CHAIN = f"{_A_AL}(?:(?:{_A_ENL}*|{_A_MIDLET}){_A_AL})*"
# big group: (Num-chain | AL-chain)+   (Katakana/Hebrew branches are non-ASCII)
_A_GROUP = f"(?:{_A_NUM_CHAIN}|{_A_AL_CHAIN})+"
# WORD: ENL* group (ENL+ group)* ENL*
_A_WORD = f"{_A_ENL}*{_A_GROUP}(?:{_A_ENL}+{_A_GROUP})*{_A_ENL}*"

_ASCII_TOKEN_RE = re.compile(_A_WORD)
_ASCII_NUMERIC_RE = re.compile(f"{_A_ENL}*{_A_NUM_CHAIN}{_A_ENL}*")


# ---------------------------------------------------------------------------
# Full-Unicode engine (regex module), a transliteration of the JFlex grammar.
# ---------------------------------------------------------------------------
def _build_unicode_patterns():
    FE = r"[\p{WordBreak=Format}\p{WordBreak=Extend}]*"

    def ex(cls: str) -> str:
        return f"(?:{cls}{FE})"

    AL = ex(r"[\p{WordBreak=ALetter}\p{WordBreak=HebrewLetter}]")
    HEB = ex(r"\p{WordBreak=HebrewLetter}")
    NUM = ex(r"[\p{WordBreak=Numeric}\p{Nd}]")  # + fullwidth digits (jflex adds Blk=HalfAndFullForms&&Nd)
    KAT = ex(r"\p{WordBreak=Katakana}")
    MIDLET = ex(r"[\p{WordBreak=MidLetter}\p{WordBreak=MidNumLet}\p{WordBreak=SingleQuote}]")
    MIDNUM = ex(r"[\p{WordBreak=MidNum}\p{WordBreak=MidNumLet}\p{WordBreak=SingleQuote}]")
    ENL = ex(r"\p{WordBreak=ExtendNumLet}")
    SQ = ex(r"\p{WordBreak=SingleQuote}")
    DQ = ex(r"\p{WordBreak=DoubleQuote}")
    HANGUL = ex(r"\p{Script=Hangul}")
    HAN = ex(r"\p{Script=Han}")
    HIRA = ex(r"\p{Script=Hiragana}")
    SEA = ex(r"\p{LineBreak=Complex_Context}")

    num_chain = f"{NUM}(?:(?:{ENL}*|{MIDNUM}){NUM})*"
    al_chain = f"{AL}(?:(?:{ENL}*|{MIDLET}){AL})*"
    kat_chain = f"{KAT}(?:{ENL}*{KAT})*"
    heb_q = f"{HEB}(?:{SQ}|{DQ}{HEB})"
    group = f"(?:{kat_chain}|(?:{heb_q}|{num_chain}|{al_chain})+)"
    word = f"{ENL}*{group}(?:{ENL}+{group})*{ENL}*"

    # master alternation; WORD subsumes the NUMERIC / HANGUL+ / KATAKANA+
    # rules' languages, so putting it first emulates jflex longest-match;
    # typing is resolved post-hoc below (jflex first-rule-wins).
    master = _uregex.compile(f"(?:{word}|{SEA}+|{HAN}|{HIRA})", _uregex.V1)
    numeric_full = _uregex.compile(f"{ENL}*{num_chain}{ENL}*", _uregex.V1)
    hangul_full = _uregex.compile(f"{HANGUL}+", _uregex.V1)
    katakana_full = _uregex.compile(f"{kat_chain}", _uregex.V1)
    return master, numeric_full, hangul_full, katakana_full


@lru_cache(maxsize=1)
def _unicode_patterns():
    if _uregex is None:  # pragma: no cover
        raise ImportError(
            "full-Unicode tokenization requires the 'regex' module; "
            "ASCII input works with the stdlib fallback"
        )
    return _build_unicode_patterns()


def _chop(text: str, max_len: int) -> list[str]:
    if len(text) <= max_len:
        return [text]
    return [text[i : i + max_len] for i in range(0, len(text), max_len)]


def standard_tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """Tokenize like StandardTokenizer (no lowercasing, no stops).

    Returns raw token texts in order. Position = index in this list
    (every token has position increment 1 at this stage, like Lucene).
    """
    if text.isascii():
        out: list[str] = []
        for m in _ASCII_TOKEN_RE.finditer(text):
            out.extend(_chop(m.group(), max_token_length))
        return out
    master, *_ = _unicode_patterns()
    out = []
    for m in master.finditer(text):
        out.extend(_chop(m.group(), max_token_length))
    return out


def whitespace_tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """WhitespaceTokenizer (analysis/core/WhitespaceTokenizer.java):
    split on ``Character.isWhitespace`` runs, keep everything else —
    punctuation stays inside tokens. The recommended front end for
    WordDelimiterGraphFilter (WordDelimiterGraphFilter.java:94-97:
    StandardTokenizer already removes the intra-word delimiters the
    filter wants to see)."""
    out: list[str] = []
    for tok in text.split():
        out.extend(_chop(tok, max_token_length))
    return out


def standard_tokenize_typed(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> list[tuple[str, str]]:
    """Tokenize and attach Lucene token types (<ALPHANUM>, <NUM>,
    <HANGUL>, <KATAKANA>, <IDEOGRAPHIC>, <HIRAGANA>, <SOUTHEAST_ASIAN>).

    Typing replicates jflex first-rule-wins: a token whose whole text
    also matches the NUMERIC rule is <NUM>, etc.
    (StandardTokenizerImpl.jflex:134-197.)
    """
    return [(t, typ) for t, typ, _, _ in standard_tokenize_full(text, max_token_length)]


def standard_tokenize_full(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> list[tuple[str, str, int, int]]:
    """Like :func:`standard_tokenize_typed` but also carries character
    offsets: ``(term, type, start_offset, end_offset)``. Offsets are
    what CJKBigramFilter keys cross-token chaining on
    (CJKBigramFilter.java:183 ``startOffset != lastEndOffset``) — two
    Han chars separated by a space must NOT bigram even though their
    token positions are consecutive."""
    if text.isascii():
        out = []
        for m in _ASCII_TOKEN_RE.finditer(text):
            typ = "<NUM>" if _ASCII_NUMERIC_RE.fullmatch(m.group()) else "<ALPHANUM>"
            off = m.start()
            for piece in _chop(m.group(), max_token_length):
                out.append((piece, typ, off, off + len(piece)))
                off += len(piece)
        return out
    master, numeric_full, hangul_full, katakana_full = _unicode_patterns()
    out = []
    for m in master.finditer(text):
        tok = m.group()
        cp = tok[0]
        if _uregex.match(r"\p{LineBreak=Complex_Context}", cp):
            typ = "<SOUTHEAST_ASIAN>"
        elif _uregex.match(r"\p{Script=Han}", cp) and len(tok) <= 2:
            typ = "<IDEOGRAPHIC>"
        elif _uregex.match(r"\p{Script=Hiragana}", cp) and len(tok) <= 2:
            typ = "<HIRAGANA>"
        elif numeric_full.fullmatch(tok):
            typ = "<NUM>"
        elif hangul_full.fullmatch(tok):
            typ = "<HANGUL>"
        elif katakana_full.fullmatch(tok):
            typ = "<KATAKANA>"
        else:
            typ = "<ALPHANUM>"
        off = m.start()
        for piece in _chop(tok, max_token_length):
            out.append((piece, typ, off, off + len(piece)))
            off += len(piece)
    return out


def keyword_tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """KeywordTokenizer (analysis/core/KeywordTokenizer.java): the
    entire input is one token (id/zipcode-style fields)."""
    return _chop(text, max_token_length) if text else []


_LETTER_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def letter_tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """LetterTokenizer (analysis/core/LetterTokenizer.java): maximal
    runs of Unicode letters; digits/punctuation split."""
    out: list[str] = []
    for m in _LETTER_RE.finditer(text):
        out.extend(_chop(m.group(), max_token_length))
    return out


# practical RFC-subset patterns for UAX29URLEmailTokenizer's <URL> /
# <EMAIL> rules (the reference compiles the full RFC 3986/5322
# grammars into the jflex scanner; this covers the scheme/www URL and
# dot-atom email forms that dominate web text). Trailing sentence
# punctuation is excluded from URLs.
_EMAIL_RE_SRC = r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}"
_URL_RE_SRC = r"(?:(?:https?|ftp|file)://|www\.)[^\s<>\"{}|\\^`\[\]]*[^\s<>\"{}|\\^`\[\].,;:!?')]"
_URL_EMAIL_RE = re.compile(
    f"(?P<url>{_URL_RE_SRC})|(?P<email>{_EMAIL_RE_SRC})", re.IGNORECASE
)


def uax29_url_email_tokenize(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> list[str]:
    """UAX29URLEmailTokenizer role (analysis/common/.../standard/
    UAX29URLEmailTokenizer.java:60-74 — StandardTokenizer plus <URL>
    and <EMAIL> token types kept as single tokens). URLs/emails pass
    through whole; the text between them tokenizes with the standard
    UAX#29 rules. Plugs into ``CustomAnalyzer(tokenizer=...)``."""
    return [t for t, _ty in uax29_url_email_tokenize_typed(text, max_token_length)]


def uax29_url_email_tokenize_typed(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    last = 0
    for m in _URL_EMAIL_RE.finditer(text):
        for t, ty in standard_tokenize_typed(text[last:m.start()], max_token_length):
            out.append((t, ty))
        typ = "<URL>" if m.lastgroup == "url" else "<EMAIL>"
        for piece in _chop(m.group(), max_token_length):
            out.append((piece, typ))
        last = m.end()
    for t, ty in standard_tokenize_typed(text[last:], max_token_length):
        out.append((t, ty))
    return out


def pattern_tokenizer(pattern: str, group: int = -1):
    """PatternTokenizer (analysis/pattern/PatternTokenizer.java):
    ``group == -1`` treats the pattern as the DELIMITER (split, empty
    pieces dropped); ``group >= 0`` emits that capture group of every
    match as a token. Returns a ``(text, max_token_length) -> tokens``
    callable for ``CustomAnalyzer(tokenizer=...)``."""
    rx = re.compile(pattern)

    def tok(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
        out: list[str] = []
        if group < 0:
            pieces = rx.split(text)
        else:
            pieces = [m.group(group) for m in rx.finditer(text)]
        for p in pieces:
            if p:
                out.extend(_chop(p, max_token_length))
        return out

    tok.__name__ = "pattern_tokenizer"
    return tok


def path_hierarchy_tokenizer(delimiter: str = "/", replacement: str | None = None,
                             skip: int = 0, reverse: bool = False):
    """PathHierarchyTokenizer (analysis/path/PathHierarchyTokenizer.java):
    ``/a/b/c`` → ``/a``, ``/a/b``, ``/a/b/c`` (every ancestor prefix —
    drill-up faceting on paths); ``skip`` drops that many leading
    chunks and tokens then start at the following delimiter
    (TestPathHierarchyTokenizer.testBasicSkip: "/a/b/c" skip=1 →
    "/b", "/b/c"). ``reverse`` gives ReversePathHierarchyTokenizer:
    suffix tokens longest-first ("/a/b/c" → "/a/b/c", "a/b/c", "b/c",
    "c"); reverse ``skip`` cuts that many trailing chunks keeping the
    delimiter ("a/b/c" skip=1 → "a/b/", "b/"). The delimiter is
    rewritten to ``replacement`` inside emitted tokens. The reference
    stacks all tokens at one position (posInc 1,0,0…); this flat-list
    tokenizer form loses the stacking — use it for faceting/filter
    fields, not phrase fields."""
    repl = delimiter if replacement is None else replacement

    def tok(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
        if not text:
            return []
        dpos = [i for i, c in enumerate(text) if c == delimiter]
        out: list[str] = []
        if not reverse:
            if skip:
                # chunk-ending delimiters: a leading delimiter belongs
                # to the first chunk, it doesn't end one
                ends_chunk = [p for p in dpos if p != 0]
                if len(ends_chunk) < skip:
                    return []
                start = ends_chunk[skip - 1]
            else:
                start = 0
            for p in dpos:
                if p > start:
                    out.append(text[start:p])
            out.append(text[start:])
        else:
            t = text
            if skip:
                cuts = dpos[:-1] if text.endswith(delimiter) else dpos
                if len(cuts) < skip:
                    return []
                t = text[: cuts[-skip] + 1]
            starts = [0] + [p + 1 for p in dpos if 0 < p + 1 < len(t)]
            out.extend(t[s:] for s in starts)
        return [
            o.replace(delimiter, repl)[:max_token_length] for o in out if o
        ]

    tok.__name__ = "path_hierarchy_tokenizer"
    return tok


_MISS = object()  # memo-miss sentinel (None is a valid memo value)


class StandardAnalyzer:
    """StandardTokenizer → LowerCaseFilter → StopFilter.

    ``stop_words=None`` reproduces Lucene's StandardAnalyzer default
    (EMPTY stop set, StandardAnalyzer.java:79-93); pass
    :data:`ENGLISH_STOP_WORDS` for EnglishAnalyzer-like behavior.

    :meth:`analyze` returns ``(terms, positions)`` where positions are
    the original token indices — StopFilter preserves position
    increments across removed words (FilteringTokenFilter.java:47-57),
    so removed stopwords leave gaps in ``positions`` but do NOT count
    toward BM25 document length (= ``len(terms)``).
    """

    def __init__(
        self,
        stop_words: frozenset[str] | None = None,
        max_token_length: int = MAX_TOKEN_LENGTH,
    ):
        self.stop_words = stop_words or frozenset()
        self.max_token_length = max_token_length
        # raw token → lowered term (None = stopword). Zipf vocab means
        # almost every token is a repeat: the memo turns per-token
        # lower()+allocation into a dict hit returning a SHARED string
        # object — far fewer allocations/page-faults in the hot
        # indexing loop, and downstream factorize hashes fewer unique
        # object ids. Bounded by vocabulary size per analyzer instance.
        self._memo: dict[str, str | None] = {}

    def analyze(self, text: str) -> tuple[list[str], list[int]]:
        toks = standard_tokenize(text, self.max_token_length)
        terms: list[str] = []
        positions: list[int] = []
        memo = self._memo
        stops = self.stop_words
        append_t = terms.append
        append_p = positions.append
        for pos, tok in enumerate(toks):
            t = memo.get(tok, _MISS)
            if t is _MISS:
                low = tok.lower()
                t = None if low in stops else low
                memo[tok] = t
            if t is None:
                continue
            append_t(t)
            append_p(pos)
        return terms, positions

    def terms(self, text: str) -> list[str]:
        return self.analyze(text)[0]

    def token_spans(self, text: str) -> list[tuple[str, int, int]]:
        """(lowered_term, start_offset, end_offset) per surviving token
        — the OffsetAttribute view (highlighting needs char offsets;
        lucene/highlighter UnifiedHighlighter re-analyzes exactly like
        this). Stopwords are dropped; >max-length tokens chop into
        offset-accurate pieces like the indexing path."""
        if text.isascii():
            it = _ASCII_TOKEN_RE.finditer(text)
        else:
            master, *_ = _unicode_patterns()
            it = master.finditer(text)
        out: list[tuple[str, int, int]] = []
        stops = self.stop_words
        ml = self.max_token_length
        for m in it:
            base = m.start()
            for k, piece in enumerate(_chop(m.group(), ml)):
                t = piece.lower()
                if t in stops:
                    continue
                lo = base + k * ml
                out.append((t, lo, lo + len(piece)))
        return out
