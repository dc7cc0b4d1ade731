"""Char filters — pre-tokenizer text transforms.

Reference components (lucene/analysis/common/src/java/org/apache/
lucene/analysis/charfilter/): HTMLStripCharFilter.java (a generated
scanner; we implement the ROLE — strip markup, decode entities — not
its offset-correction machinery, which only matters for highlighting
against raw bytes), MappingCharFilter.java (longest-match rewrite),
and pattern/PatternReplaceCharFilter.java.

Two twins per filter, same contract as the token-filter zoo:
  * a Python callable ``str -> str`` for the analyzer chain / oracle;
  * a Spark ``Column -> Column`` builder (pure JVM regexp/replace —
    the 100 TB path; no UDF).
"""

from __future__ import annotations

import html
import re

# ---------------------------------------------------------------------------
# HTMLStrip
# ---------------------------------------------------------------------------

# script/style/comments go first (their CONTENT must vanish too),
# then any remaining tag. A single space replaces each removed run so
# "<p>a</p><p>b</p>" keeps a token boundary between a and b
# (StandardTokenizer would otherwise see "ab").
_RE_SCRIPT = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RE_TAG = re.compile(r"(?s)<[!/]?[a-zA-Z][^>]*>")
_RE_WS = re.compile(r"[ \t]+")


def html_strip(text: str) -> str:
    """HTMLStripCharFilter role: drop script/style/comment content,
    strip tags (→ single space, preserving token boundaries), decode
    character entities, collapse runs of spaces."""
    if not text:
        return text
    t = _RE_SCRIPT.sub(" ", text)
    t = _RE_COMMENT.sub(" ", t)
    t = _RE_TAG.sub(" ", t)
    t = html.unescape(t)
    return _RE_WS.sub(" ", t).strip()


def html_strip_column(col):
    """Spark twin of :func:`html_strip` — a regexp_replace chain, all
    JVM-side (whole-stage codegen; no UDF). Entity decoding covers the
    named entities that dominate real web text plus numeric escapes'
    common subset; exotic entities pass through unchanged (they
    tokenize as words, harmless for indexing)."""
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[!/]?[a-zA-Z][^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
                    ("&amp;", "&")):  # &amp; LAST (it guards the rest)
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    return F.trim(c)


# ---------------------------------------------------------------------------
# MappingCharFilter
# ---------------------------------------------------------------------------

def mapping_char_filter(mappings: dict[str, str]):
    """MappingCharFilter.java: longest-match greedy rewrite of literal
    substrings (e.g. ``{"ph": "f", "qu": "q"}``). Returns str → str."""
    if not mappings:
        return lambda text: text
    # longest alternative first = longest-match (same tie rule as the
    # reference's NormalizeCharMap FST longest-arc match)
    pat = re.compile("|".join(
        re.escape(k) for k in sorted(mappings, key=len, reverse=True)))

    def f(text: str) -> str:
        return pat.sub(lambda m: mappings[m.group(0)], text) if text else text

    return f


def mapping_char_filter_column(col, mappings: dict[str, str]):
    """Spark twin: chained literal replace() (JVM). Longest key first
    so prefixes don't shadow longer mappings."""
    from pyspark.sql import functions as F

    c = col
    for k in sorted(mappings, key=len, reverse=True):
        c = F.replace(c, F.lit(k), F.lit(mappings[k]))
    return c


# ---------------------------------------------------------------------------
# PatternReplaceCharFilter
# ---------------------------------------------------------------------------

def pattern_replace_char_filter(pattern: str, replacement: str):
    """pattern/PatternReplaceCharFilter.java: regex rewrite of the
    raw text before tokenization."""
    rx = re.compile(pattern)

    def f(text: str) -> str:
        return rx.sub(replacement, text) if text else text

    return f


def pattern_replace_char_filter_column(col, pattern: str, replacement: str):
    from pyspark.sql import functions as F

    return F.regexp_replace(col, pattern, replacement)
