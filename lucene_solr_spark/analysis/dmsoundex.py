"""Daitch–Mokotoff Soundex — the genealogical encoder behind the
reference's dedicated lucene/analysis/phonetic/src/java/org/apache/
lucene/analysis/phonetic/DaitchMokotoffSoundexFilter.java (which
delegates to commons-codec). Unlike classic Soundex it is built for
Slavic/Yiddish surname matching: multi-letter groups, three coding
contexts (word start / before a vowel / elsewhere), and BRANCHING —
ambiguous groups like CH (tch/kh) or RS (rz/rs) yield several 6-digit
codes per word, so the filter stacks every code at the token's
position.

Table per the published Avotaynu/JewishGen rule set. A group coded
identically to the previous group is coded once unless a vowel
separates them (MANNHEIM → 665600 keeps both 6s across the vowel,
collapses the NN).
"""

from __future__ import annotations

_NC = None  # not coded in this context

# (pattern, code at word start, code before a vowel, code elsewhere)
# branching alternatives are tuples; longest patterns listed first per
# initial so longest-match wins.
_RULES: list[tuple[str, object, object, object]] = [
    ("SCHTSCH", "2", "4", "4"), ("SCHTSH", "2", "4", "4"),
    ("SCHTCH", "2", "4", "4"),
    ("ZHDZH", "2", "4", "4"),
    ("SHTCH", "2", "4", "4"), ("SHTSH", "2", "4", "4"),
    ("STSCH", "2", "4", "4"), ("TTSCH", "4", "4", "4"),
    ("SZCZ", "2", "4", "4"), ("SZCS", "2", "4", "4"),
    ("SCHT", "2", "43", "43"), ("SCHD", "2", "43", "43"),
    ("STRZ", "2", "4", "4"), ("STRS", "2", "4", "4"),
    ("STSH", "2", "4", "4"), ("STCH", "2", "4", "4"),
    ("SHCH", "2", "4", "4"),
    ("TSCH", "4", "4", "4"), ("TTCH", "4", "4", "4"),
    ("TTSZ", "4", "4", "4"),
    ("ZDZH", "2", "4", "4"),
    ("CSZ", "4", "4", "4"), ("CZS", "4", "4", "4"),
    ("DRZ", "4", "4", "4"), ("DRS", "4", "4", "4"),
    ("DSH", "4", "4", "4"), ("DSZ", "4", "4", "4"),
    ("DZH", "4", "4", "4"), ("DZS", "4", "4", "4"),
    ("CHS", "5", "54", "54"),
    ("SCH", "4", "4", "4"), ("SHT", "2", "43", "43"),
    ("SZT", "2", "43", "43"), ("SHD", "2", "43", "43"),
    ("SZD", "2", "43", "43"),
    ("TCH", "4", "4", "4"), ("TRZ", "4", "4", "4"),
    ("TRS", "4", "4", "4"), ("TSH", "4", "4", "4"),
    ("TTS", "4", "4", "4"), ("TTZ", "4", "4", "4"),
    ("TZS", "4", "4", "4"), ("TSZ", "4", "4", "4"),
    ("ZDZ", "2", "4", "4"),
    ("ZSCH", "4", "4", "4"), ("ZSH", "4", "4", "4"),
    ("AI", "0", "1", _NC), ("AJ", "0", "1", _NC), ("AY", "0", "1", _NC),
    ("AU", "0", "7", _NC),
    ("CH", ("5", "4"), ("5", "4"), ("5", "4")),
    ("CK", ("5", "45"), ("5", "45"), ("5", "45")),
    ("CZ", "4", "4", "4"), ("CS", "4", "4", "4"),
    ("DS", "4", "4", "4"), ("DZ", "4", "4", "4"),
    ("DT", "3", "3", "3"),
    ("EI", "0", "1", _NC), ("EJ", "0", "1", _NC), ("EY", "0", "1", _NC),
    ("EU", "1", "1", _NC),
    ("FB", "7", "7", "7"),
    ("IA", "1", _NC, _NC), ("IE", "1", _NC, _NC),
    ("IO", "1", _NC, _NC), ("IU", "1", _NC, _NC),
    ("KS", "5", "54", "54"), ("KH", "5", "5", "5"),
    ("MN", "66", "66", "66"), ("NM", "66", "66", "66"),
    ("OI", "0", "1", _NC), ("OJ", "0", "1", _NC), ("OY", "0", "1", _NC),
    ("PF", "7", "7", "7"), ("PH", "7", "7", "7"),
    ("RZ", ("94", "4"), ("94", "4"), ("94", "4")),
    ("RS", ("94", "4"), ("94", "4"), ("94", "4")),
    ("SC", "2", "4", "4"),
    ("SD", "2", "43", "43"),
    ("SH", "4", "4", "4"), ("SZ", "4", "4", "4"),
    ("ST", "2", "43", "43"),
    ("TC", "4", "4", "4"), ("TH", "3", "3", "3"),
    ("TS", "4", "4", "4"), ("TZ", "4", "4", "4"),
    ("UI", "0", "1", _NC), ("UJ", "0", "1", _NC), ("UY", "0", "1", _NC),
    ("UE", "0", _NC, _NC),
    ("ZD", "2", "43", "43"), ("ZHD", "2", "43", "43"),
    ("ZH", "4", "4", "4"), ("ZS", "4", "4", "4"),
    ("A", "0", _NC, _NC),
    ("B", "7", "7", "7"),
    ("C", ("5", "4"), ("5", "4"), ("5", "4")),
    ("D", "3", "3", "3"),
    ("E", "0", _NC, _NC),
    ("F", "7", "7", "7"),
    ("G", "5", "5", "5"),
    ("H", "5", "5", _NC),
    ("I", "0", _NC, _NC),
    ("J", ("1", "4"), ("1", "4"), ("1", "4")),
    ("K", "5", "5", "5"),
    ("L", "8", "8", "8"),
    ("M", "6", "6", "6"),
    ("N", "6", "6", "6"),
    ("O", "0", _NC, _NC),
    ("P", "7", "7", "7"),
    ("Q", "5", "5", "5"),
    ("R", "9", "9", "9"),
    ("S", "4", "4", "4"),
    ("T", "3", "3", "3"),
    ("U", "0", _NC, _NC),
    ("V", "7", "7", "7"),
    ("W", "7", "7", "7"),
    ("X", "5", "54", "54"),
    ("Y", "1", _NC, _NC),
    ("Z", "4", "4", "4"),
]

# index by first letter, longest-first (list order already guarantees
# longest-first within the scan below)
_BY_FIRST: dict[str, list[tuple[str, object, object, object]]] = {}
for _r in _RULES:
    _BY_FIRST.setdefault(_r[0][0], []).append(_r)
for _lst in _BY_FIRST.values():
    _lst.sort(key=lambda r: -len(r[0]))

_VOWELS = "AEIOUY"
_MAX_BRANCHES = 16


def daitch_mokotoff(word: str, max_code_len: int = 6) -> tuple[str, ...]:
    """Encode ``word``; returns every distinct 6-digit code the
    branching rules produce, in branch order (first = the 'primary'
    reading)."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return ()
    n = len(s)
    # branch state: (codes_tuple, last_code, vowel_since_last_code)
    branches: list[tuple[tuple[str, ...], str, bool]] = [((), "", False)]
    i = 0
    while i < n:
        rules = _BY_FIRST.get(s[i], [])
        match = None
        for pat, at_start, before_vowel, other in rules:
            if s.startswith(pat, i):
                match = (pat, at_start, before_vowel, other)
                break
        if match is None:  # unmapped letter: skip
            i += 1
            continue
        pat, at_start, before_vowel, other = match
        end = i + len(pat)
        if i == 0:
            code = at_start
        elif end < n and s[end] in _VOWELS:
            code = before_vowel
        else:
            code = other
        is_vowel_group = pat[0] in _VOWELS
        alts = code if isinstance(code, tuple) else (code,)
        new_branches: list[tuple[tuple[str, ...], str, bool]] = []
        for codes, last, vowel_since in branches:
            for alt in alts:
                if alt is _NC:
                    new_branches.append(
                        (codes, last, vowel_since or is_vowel_group))
                elif alt == last and not vowel_since:
                    # same sound, no vowel between: coded once
                    new_branches.append((codes, alt, False))
                else:
                    new_branches.append((codes + (alt,), alt, False))
        branches = new_branches[:_MAX_BRANCHES]
        i = end
    out: list[str] = []
    seen: set[str] = set()
    for codes, _, _ in branches:
        code = ("".join(codes) + "0" * max_code_len)[:max_code_len]
        if code not in seen:
            seen.add(code)
            out.append(code)
    return tuple(out)


def dm_soundex_filter(inject: bool = True):
    """DaitchMokotoffSoundexFilter.java chain member: stack every
    branch code at the token's position (posInc=0); inject=False
    replaces the token with its codes."""

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            codes = daitch_mokotoff(t)
            if inject:
                out_t.append(t)
                out_p.append(p)
                for c in codes:
                    if c != t:
                        out_t.append(c)
                        out_p.append(p)
            else:
                if codes:
                    for c in codes:
                        out_t.append(c)
                        out_p.append(p)
                else:
                    out_t.append(t)
                    out_p.append(p)
        return out_t, out_p

    return f
