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

# ---------------------------------------------------------------------------
# Metaphone (commons-codec Metaphone.java semantics, maxCodeLen=4).
# Solr exposes it via PhoneticFilterFactory encoder="Metaphone".

_VOWELS = "AEIOU"
_VARSON = "CSPTG"  # letters after which H is silent (commons-codec)
_FRONTV = "EIY"    # front vowels that soften C/G


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Original Lawrence Philips Metaphone, commons-codec variant:
    4-char cap, initial-cluster transforms (AE/GN/KN/PN/WR/WH/X),
    duplicate letters collapsed except C."""
    s = [c for c in word.upper() if "A" <= c <= "Z"]
    if not s:
        return ""
    if len(s) == 1:
        return s[0]
    # initial-cluster transforms
    two = "".join(s[:2])
    if two in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif s[0] == "X":
        s[0] = "S"
    elif two == "WH":
        s = ["W"] + s[2:]
    code: list[str] = []
    n = len(s)
    i = 0
    while i < n and len(code) < max_code_len:
        c = s[i]
        # collapse duplicate adjacent letters except C
        if c != "C" and i > 0 and s[i - 1] == c:
            i += 1
            continue
        nxt = s[i + 1] if i + 1 < n else ""
        nxt2 = s[i + 2] if i + 2 < n else ""
        if c in _VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            # silent terminal -MB
            if not (i == n - 1 and i > 0 and s[i - 1] == "M"):
                code.append("B")
        elif c == "C":
            if i > 0 and nxt == "I" and nxt2 == "A":        # -CIA-
                code.append("X")
            elif nxt in _FRONTV:
                if i > 0 and s[i - 1] == "S":
                    pass                                    # -SCI/SCE/SCY-
                else:
                    code.append("S")
            elif i > 0 and s[i - 1] == "S" and nxt == "H":  # -SCH-
                code.append("K")
            elif nxt == "H":
                if i == 0 and n >= 3 and nxt2 not in _VOWELS:  # CHR- etc.
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in _FRONTV:              # -DGE/DGY/DGI
                code.append("J")
                i += 1                                       # skip the G
            else:
                code.append("T")
        elif c == "G":
            silent = False
            if nxt == "H" and not (i + 2 == n or nxt2 in _VOWELS):
                silent = True                               # -GH- not before vowel
            if i + 1 == n - 1 and nxt == "N":
                silent = True                               # terminal -GN
            elif i + 1 == n - 3 and nxt == "N" and nxt2 == "E" and \
                    i + 3 < n and s[i + 3] == "D":
                silent = True                               # terminal -GNED
            if i > 0 and s[i - 1] == "D" and nxt in _FRONTV:
                silent = True                               # -DGE- handled at D
            if not silent:
                if nxt in _FRONTV and (i == 0 or s[i - 1] != "G"):
                    code.append("J")
                else:
                    code.append("K")
        elif c == "H":
            if i > 0 and s[i - 1] in _VOWELS and nxt not in _VOWELS:
                pass                                        # silent after vowel
            elif i > 0 and s[i - 1] in _VARSON:
                pass                                        # CH/SH/PH/TH/GH handled
            else:
                code.append("H")
        elif c in "FJLMNR":
            code.append(c)
        elif c == "K":
            if i == 0 or s[i - 1] != "C":
                code.append("K")
        elif c == "P":
            code.append("F" if nxt == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if nxt == "H" or (nxt == "I" and nxt2 in ("O", "A")):
                code.append("X")                            # SH / -SIO- / -SIA-
            else:
                code.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):
                code.append("X")                            # -TIO- / -TIA-
            elif nxt == "H":
                code.append("0")                            # TH
            elif not (nxt == "C" and nxt2 == "H"):
                code.append("T")                            # TCH: T silent
        elif c == "V":
            code.append("F")
        elif c in ("W", "Y"):
            if nxt in _VOWELS:
                code.append(c)
        elif c == "X":
            code.append("K")
            if len(code) < max_code_len:
                code.append("S")
        elif c == "Z":
            code.append("S")
        i += 1
    return "".join(code[:max_code_len])


# ---------------------------------------------------------------------------
# NYSIIS (commons-codec Nysiis.java, strict=True → 6-char cap).

def nysiis(word: str, strict: bool = True) -> str:
    """New York State Identification and Intelligence System code:
    boundary transcodes (MAC/KN/K/PH/PF/SCH, EE/IE/DT..→Y/D), body
    rules (EV→AF, vowels→A, Q→G, Z→S, M→N, KN→N, K→C, SCH→SSS,
    PH→FF, H collapses to neighbour, W after vowel collapses),
    adjacent-duplicate suppression, terminal S/A strip and AY→Y."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    # first-characters transcode
    if s.startswith("MAC"):
        s = "MCC" + s[3:]
    elif s.startswith("KN"):
        s = "NN" + s[2:]
    elif s.startswith("K"):
        s = "C" + s[1:]
    elif s.startswith(("PH", "PF")):
        s = "FF" + s[2:]
    elif s.startswith("SCH"):
        s = "SSS" + s[3:]
    # last-characters transcode
    if s.endswith(("EE", "IE")):
        s = s[:-2] + "Y"
    elif s.endswith(("DT", "RT", "RD", "NT", "ND")):
        s = s[:-2] + "D"
    key = [s[0]]
    chars = list(s)
    i = 1
    n = len(chars)
    while i < n:
        c = chars[i]
        nxt = chars[i + 1] if i + 1 < n else ""
        repl: str
        if c in "AEIOU":
            if c == "E" and nxt == "V":
                chars[i], chars[i + 1] = "A", "F"
                repl = "A"
            else:
                chars[i] = "A"
                repl = "A"
        elif c == "Q":
            chars[i] = "G"; repl = "G"
        elif c == "Z":
            chars[i] = "S"; repl = "S"
        elif c == "M":
            chars[i] = "N"; repl = "N"
        elif c == "K":
            if nxt == "N":
                chars[i] = "N"; repl = "N"
            else:
                chars[i] = "C"; repl = "C"
        elif c == "S" and nxt == "C" and i + 2 < n and chars[i + 2] == "H":
            chars[i + 1], chars[i + 2] = "S", "S"
            repl = "S"
        elif c == "P" and nxt == "H":
            chars[i], chars[i + 1] = "F", "F"
            repl = "F"
        elif c == "H":
            prev = chars[i - 1]
            if prev not in "AEIOU" or nxt not in "AEIOU" or nxt == "":
                chars[i] = prev
                repl = prev
            else:
                repl = "H"
        elif c == "W":
            prev = chars[i - 1]
            if prev in "AEIOU":
                chars[i] = "A"
                repl = "A"
            else:
                repl = "W"
        else:
            repl = c
        if repl and repl != key[-1]:
            key.append(repl)
        i += 1
    # terminal cleanup: strip S, AY→Y, strip A
    if len(key) > 1 and key[-1] == "S":
        key.pop()
    if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
        del key[-2]
    if len(key) > 1 and key[-1] == "A":
        key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Caverphone 2.0 (David Hood, University of Otago, 2004 — the revised
# spec commons-codec Caverphone2.java implements). 10-char code.

import re as _re

_CAVERPHONE2_STEPS = [
    ("e$", ""),
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^trough", "trou2f"), ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"),
    ("j", "y"), ("^y3", "Y3"), ("^y", "A"), ("y", "3"),
    ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"),
    ("f+", "F"), ("m+", "M"), ("n+", "N"),
    ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"), ("w", "2"),
    ("^h", "A"), ("h", "2"),
    ("r3", "R3"), ("r$", "3"), ("r", "2"),
    ("l3", "L3"), ("l$", "3"), ("l", "2"),
    ("2", ""),
    ("3$", "A"), ("3", ""),
]


def caverphone2(word: str) -> str:
    """Caverphone 2.0 per the published revised spec: the ordered
    rewrite cascade above, then pad with '1' to exactly 10 chars."""
    s = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not s:
        return ""
    for pat, repl in _CAVERPHONE2_STEPS:
        s = _re.sub(pat, repl, s)
    return (s + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# Cologne phonetic (Kölner Phonetik, Postel 1969) — the German encoder
# Solr exposes as encoder="ColognePhonetic".

def cologne_phonetic(word: str) -> str:
    """Kölner Phonetik: context-sensitive digit table, adjacent
    duplicates collapsed, '0' kept only word-initially."""
    # fold the German letters the reference's preprocessor folds
    w = word.upper().replace("Ä", "A").replace("Ö", "O") \
            .replace("Ü", "U").replace("ß", "SS").replace("ẞ", "SS")
    s = [c for c in w if "A" <= c <= "Z"]
    n = len(s)
    raw: list[str] = []
    for i, c in enumerate(s):
        prev = s[i - 1] if i > 0 else ""
        nxt = s[i + 1] if i + 1 < n else ""
        if c in "AEIJOUY":
            raw.append("0")
        elif c == "H":
            raw.append("-")
        elif c == "B":
            raw.append("1")
        elif c == "P":
            raw.append("3" if nxt == "H" else "1")
        elif c in "DT":
            raw.append("8" if (nxt and nxt in "CSZ") else "2")
        elif c in "FVW":
            raw.append("3")
        elif c in "GKQ":
            raw.append("4")
        elif c == "C":
            if i == 0:
                raw.append("4" if (nxt and nxt in "AHKLOQRUX") else "8")
            elif prev in "SZ":
                raw.append("8")
            else:
                raw.append("4" if (nxt and nxt in "AHKOQUX") else "8")
        elif c == "X":
            raw.append("8" if prev in "CKQ" else "48")
        elif c == "L":
            raw.append("5")
        elif c in "MN":
            raw.append("6")
        elif c == "R":
            raw.append("7")
        elif c in "SZ":
            raw.append("8")
    # collapse adjacent duplicates (H is transparent: '-' dropped after)
    digits = "".join(raw)
    out: list[str] = []
    for ch in digits:
        if out and out[-1] == ch:
            continue
        out.append(ch)
    code = "".join(c for c in out if c != "-")
    # strip non-initial zeros
    if not code:
        return ""
    return code[0] + code[1:].replace("0", "")
