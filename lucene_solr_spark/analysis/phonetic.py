"""Phonetic encoders + PhoneticFilter
(lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java, which delegates to commons-codec
encoders; the encoders themselves follow the published algorithms).

Encoders:
  * soundex        — American Soundex, 4-char code (commons-codec
    Soundex: same-code letters separated by H/W collapse into one;
    vowels reset the run).
  * refined_soundex — commons-codec RefinedSoundex (first letter +
    unlimited digits, distinct consonant classes).

``phonetic_filter(encoder, inject=True)`` is a chain member for
:class:`CustomAnalyzer`: inject=True stacks the code at the SAME
position as the original (PhoneticFilter's posInc=0 injection),
inject=False replaces the token.
"""

from __future__ import annotations

_SOUNDEX_CODE = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(word: str) -> str:
    """American Soundex, commons-codec variant: letters H and W are
    TRANSPARENT between same-code consonants (``Ashcraft`` → A261,
    not A226), vowels break the run; pad/truncate to 4 chars."""
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    last_code = _SOUNDEX_CODE.get(letters[0], "")
    for c in letters[1:]:
        code = _SOUNDEX_CODE.get(c, "")
        if code:
            if code != last_code:
                out.append(code)
                if len(out) == 4:
                    break
            last_code = code
        elif c in "HW":
            continue  # transparent: last_code survives across H/W
        else:
            last_code = ""  # vowel: reset the duplicate-run suppressor
    return ("".join(out) + "000")[:4]


_REFINED_CODE = {
    **dict.fromkeys("AEIOUYHW", "0"),
    **dict.fromkeys("BP", "1"),
    **dict.fromkeys("FV", "2"),
    **dict.fromkeys("CKS", "3"),
    **dict.fromkeys("GJ", "4"),
    **dict.fromkeys("QXZ", "5"),
    **dict.fromkeys("DT", "6"),
    "L": "7",
    **dict.fromkeys("MN", "8"),
    "R": "9",
}


def refined_soundex(word: str) -> str:
    """commons-codec RefinedSoundex: first letter, then the code of
    every letter with consecutive duplicates collapsed; no length
    cap, vowels keep a '0' marker."""
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    last = None
    for c in letters:
        code = _REFINED_CODE.get(c, "")
        if code and code != last:
            out.append(code)
        last = code
    return "".join(out)


def phonetic_filter(encoder=soundex, inject: bool = True):
    """PhoneticFilter.java chain member: encode each token; stack the
    code at the same position (inject=True, posInc=0) or replace the
    token (inject=False). Tokens whose code equals the token itself
    are not double-emitted."""

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            code = encoder(t).lower()
            if inject:
                out_t.append(t)
                out_p.append(p)
                if code and code != t:
                    out_t.append(code)
                    out_p.append(p)
            else:
                out_t.append(code if code else t)
                out_p.append(p)
        return out_t, out_p

    return f
