"""Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000) —
the encoder behind the reference's dedicated
lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
DoubleMetaphoneFilter.java (which delegates to the commons-codec
port). Returns a (primary, alternate) pair of max-4-char codes; the
filter indexes the primary and optionally stacks the alternate at the
same position, so 'Smith' (SM0/XMT) and 'Schmidt' (XMT/SMT) meet on
the shared XMT code.

Pure Python, rule-for-rule with the published algorithm: Slavo-
Germanic detection, silent starts (GN/KN/PN/WR/PS), the Greek/Italian
/Germanic CH splits, the -GH- neighbourhood rules, Spanish J, the
ILLO/ALLE L rule, Polish -WICZ, and the French final-X silence.
"""

from __future__ import annotations

_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


def _char(v: str, i: int) -> str:
    return v[i] if 0 <= i < len(v) else ""


def _is_vowel(c: str) -> bool:
    return bool(c) and c in _VOWELS


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    target = v[start:start + length]
    return target in criteria


class _Result:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int = 4):
        self.primary: list[str] = []
        self.alternate: list[str] = []
        self.max_len = max_len

    def append(self, p: str, a: str | None = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, p: str) -> None:
        if len(self.primary) < self.max_len:
            self.primary.append(p)

    def append_alternate(self, a: str) -> None:
        if len(self.alternate) < self.max_len:
            self.alternate.append(a)

    def complete(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)

    def codes(self) -> tuple[str, str]:
        p = "".join(self.primary)[:self.max_len].strip()
        a = "".join(self.alternate)[:self.max_len].strip()
        return p, a


def _slavo_germanic(v: str) -> bool:
    return "W" in v or "K" in v or "CZ" in v or "WITZ" in v


def double_metaphone(word: str, max_code_len: int = 4) -> tuple[str, str]:
    """Encode ``word``; returns (primary, alternate). The alternate
    equals the primary when no ambiguity rule fired."""
    v = "".join(c for c in word.upper() if ("A" <= c <= "Z") or c == " ").strip()
    if not v:
        return "", ""
    slavo = _slavo_germanic(v)
    r = _Result(max_code_len)
    i = 1 if v.startswith(_SILENT_START) else 0
    n = len(v)
    while not r.complete() and i < n:
        c = v[i]
        if c in _VOWELS:
            if i == 0:
                r.append("A")
            i += 1
        elif c == "B":
            r.append("P")
            i += 2 if _char(v, i + 1) == "B" else 1
        elif c == "C":
            i = _handle_c(v, r, i)
        elif c == "D":
            i = _handle_d(v, r, i)
        elif c == "F":
            r.append("F")
            i += 2 if _char(v, i + 1) == "F" else 1
        elif c == "G":
            i = _handle_g(v, r, i, slavo)
        elif c == "H":
            i = _handle_h(v, r, i)
        elif c == "J":
            i = _handle_j(v, r, i, slavo)
        elif c == "K":
            r.append("K")
            i += 2 if _char(v, i + 1) == "K" else 1
        elif c == "L":
            i = _handle_l(v, r, i)
        elif c == "M":
            r.append("M")
            i += 2 if _condition_m0(v, i) else 1
        elif c == "N":
            r.append("N")
            i += 2 if _char(v, i + 1) == "N" else 1
        elif c == "P":
            i = _handle_p(v, r, i)
        elif c == "Q":
            r.append("K")
            i += 2 if _char(v, i + 1) == "Q" else 1
        elif c == "R":
            i = _handle_r(v, r, i, slavo)
        elif c == "S":
            i = _handle_s(v, r, i, slavo)
        elif c == "T":
            i = _handle_t(v, r, i)
        elif c == "V":
            r.append("F")
            i += 2 if _char(v, i + 1) == "V" else 1
        elif c == "W":
            i = _handle_w(v, r, i)
        elif c == "X":
            i = _handle_x(v, r, i)
        elif c == "Z":
            i = _handle_z(v, r, i, slavo)
        else:
            i += 1
    return r.codes()


# -- per-letter handlers (order and conditions per the published
#    algorithm / commons-codec DoubleMetaphone.java) -----------------

def _handle_c(v: str, r: _Result, i: int) -> int:
    if _condition_c0(v, i):                       # germanic 'ACH' (Bacher)
        r.append("K")
        return i + 2
    if i == 0 and _contains(v, i, 6, "CAESAR"):
        r.append("S")
        return i + 2
    if _contains(v, i, 2, "CH"):
        return _handle_ch(v, r, i)
    if _contains(v, i, 2, "CZ") and not _contains(v, i - 2, 4, "WICZ"):
        r.append("S", "X")                        # Polish 'Czerny'
        return i + 2
    if _contains(v, i + 1, 3, "CIA"):             # 'focaccia'
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "CC") and not (i == 1 and _char(v, 0) == "M"):
        return _handle_cc(v, r, i)
    if _contains(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        return i + 2
    if _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):  # italian vs english
            r.append("S", "X")
        else:
            r.append("S")
        return i + 2
    r.append("K")
    if _contains(v, i + 1, 2, " C", " Q", " G"):  # 'mac caffrey'
        return i + 3
    if _contains(v, i + 1, 1, "C", "K", "Q") and \
            not _contains(v, i + 1, 2, "CE", "CI"):
        return i + 2
    return i + 1


def _condition_c0(v: str, i: int) -> bool:
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char(v, i + 2)
    return (c != "I" and c != "E") or \
        _contains(v, i - 2, 6, "BACHER", "MACHER")


def _handle_cc(v: str, r: _Result, i: int) -> int:
    if _contains(v, i + 2, 1, "I", "E", "H") and \
            not _contains(v, i + 2, 2, "HU"):
        if (i == 1 and _char(v, i - 1) == "A") or \
                _contains(v, i - 1, 5, "UCCEE", "UCCES"):
            r.append("KS")                        # 'accident', 'succeed'
        else:
            r.append("X")                         # 'bacci', 'bertucci'
        return i + 3
    r.append("K")                                 # Pierce's rule
    return i + 2


def _handle_ch(v: str, r: _Result, i: int) -> int:
    if i > 0 and _contains(v, i, 4, "CHAE"):      # 'Michael'
        r.append("K", "X")
        return i + 2
    if _condition_ch0(v, i):                      # Greek roots at start
        r.append("K")
        return i + 2
    if _condition_ch1(v, i):                      # Germanic
        r.append("K")
        return i + 2
    if i > 0:
        if v.startswith("MC"):
            r.append("K")                         # 'McHugh'
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return i + 2


def _condition_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if not _contains(v, i + 1, 5, "HARAC", "HARIS") and \
            not _contains(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM"):
        return False
    return not v.startswith("CHORE")


def _condition_ch1(v: str, i: int) -> bool:
    return (v.startswith(("VAN ", "VON ", "SCH"))
            or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _contains(v, i + 2, 1, "T", "S")
            or ((_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
                and (_contains(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                     or i + 1 == len(v) - 1)))


def _handle_d(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):  # 'edge'
            r.append("J")
            return i + 3
        r.append("T")                              # 'Edgar' → TK
        r.append("K")
        return i + 2
    if _contains(v, i, 2, "DT", "DD"):
        r.append("T")
        return i + 2
    r.append("T")
    return i + 1


def _handle_g(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _char(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _char(v, i + 1) == "N":
        if i == 1 and _is_vowel(_char(v, 0)) and not slavo:
            r.append_primary("K")
            r.append_primary("N")
            r.append_alternate("N")
        elif not _contains(v, i + 2, 2, "EY") and \
                _char(v, i + 1) != "Y" and not slavo:
            r.append_primary("N")
            r.append_alternate("K")
            r.append_alternate("N")
        else:
            r.append("K")
            r.append("N")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not slavo:   # 'tagliaro'
        r.append_primary("K")
        r.append_primary("L")
        r.append_alternate("L")
        return i + 2
    if i == 0 and (_char(v, i + 1) == "Y" or
                   _contains(v, i + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        r.append("K", "J")                           # 'ges-', 'gep-' starts
        return i + 2
    if (_contains(v, i + 1, 2, "ER") or _char(v, i + 1) == "Y") and \
            not v.startswith(("DANGER", "RANGER", "MANGER")) and \
            not _contains(v, i - 1, 1, "E", "I") and \
            not _contains(v, i - 1, 3, "RGY", "OGY"):
        r.append("K", "J")                           # 'berger' vs 'bergy'
        return i + 2
    if _contains(v, i + 1, 1, "E", "I", "Y") or \
            _contains(v, i - 1, 4, "AGGI", "OGGI"):
        if v.startswith(("VAN ", "VON ", "SCH")) or \
                _contains(v, i + 1, 2, "ET"):
            r.append("K")                            # germanic
        elif _contains(v, i + 1, 3, "IER"):
            r.append("J")                            # always soft: -gier
        else:
            r.append("J", "K")
        return i + 2
    if _char(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_gh(v: str, r: _Result, i: int) -> int:
    if i > 0 and not _is_vowel(_char(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _char(v, i + 2) == "I":                   # 'ghislane'
            r.append("J")
        else:
            r.append("K")                            # 'ghost'
        return i + 2
    if (i > 1 and _contains(v, i - 2, 1, "B", "H", "D")) or \
            (i > 2 and _contains(v, i - 3, 1, "B", "H", "D")) or \
            (i > 3 and _contains(v, i - 4, 1, "B", "H")):
        return i + 2                                 # silent: 'Hugh'
    if i > 2 and _char(v, i - 1) == "U" and \
            _contains(v, i - 3, 1, "C", "G", "L", "R", "T"):
        r.append("F")                                # 'laugh', 'rough'
    elif i > 0 and _char(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_h(v: str, r: _Result, i: int) -> int:
    # keep H only between vowels or at a vowel-leading start
    if (i == 0 or _is_vowel(_char(v, i - 1))) and _is_vowel(_char(v, i + 1)):
        r.append("H")
        return i + 2
    return i + 1


def _handle_j(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i, 4, "JOSE") or v.startswith("SAN "):
        # Spanish: 'Jose', 'San Jacinto'
        if (i == 0 and _char(v, i + 4) == " ") or len(v) == 4 or \
                v.startswith("SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        return i + 1
    if i == 0:
        r.append("J", "A")                           # 'Yankelovich'/'Jahn'
    elif _is_vowel(_char(v, i - 1)) and not slavo and \
            _char(v, i + 1) in ("A", "O"):
        r.append("J", "H")                           # 'bajador'
    elif i == len(v) - 1:
        r.append_primary("J")                        # final J: alt blank
        r.append_alternate(" ")
    elif not _contains(v, i + 1, 1, *_L_T_K_S_N_M_B_Z) and \
            not _contains(v, i - 1, 1, "S", "K", "L"):
        r.append("J")
    # else silent
    return i + 2 if _char(v, i + 1) == "J" else i + 1


def _handle_l(v: str, r: _Result, i: int) -> int:
    if _char(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.append_primary("L")                    # 'cabrillo' — alt drops
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _condition_l0(v: str, i: int) -> bool:
    if i == len(v) - 3 and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (_contains(v, len(v) - 2, 2, "AS", "OS")
            or _contains(v, len(v) - 1, 1, "A", "O")) and \
        _contains(v, i - 1, 4, "ALLE")


def _condition_m0(v: str, i: int) -> bool:
    if _char(v, i + 1) == "M":
        return True
    return _contains(v, i - 1, 3, "UMB") and \
        (i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER"))


def _handle_p(v: str, r: _Result, i: int) -> int:
    if _char(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _contains(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v: str, r: _Result, i: int, slavo: bool) -> int:
    # French final -IER/-Iagainst: 'rogier' alt keeps R, primary drops
    if i == len(v) - 1 and not slavo and \
            _contains(v, i - 2, 2, "IE") and \
            not _contains(v, i - 4, 2, "ME", "MA"):
        r.append_alternate("R")
    else:
        r.append("R")
    return i + 2 if _char(v, i + 1) == "R" else i + 1


def _handle_s(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i - 1, 3, "ISL", "YSL"):         # 'island'
        return i + 1
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")                            # germanic
        else:
            r.append("X")
        return i + 2
    if _contains(v, i, 3, "SIO", "SIA") or _contains(v, i, 4, "SIAN"):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if (i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W")) or \
            _contains(v, i + 1, 1, "Z"):
        # german/anglicization: 'Smith' ~ 'Schmidt'
        r.append("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _contains(v, i - 2, 2, "AI", "OI"):
        r.append_alternate("S")                      # french: 'resnais'
    else:
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v: str, r: _Result, i: int) -> int:
    if _char(v, i + 2) == "H":
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):   # 'schermerhorn'
                r.append_primary("X")
                r.append_alternate("S")
                r.append_alternate("K")
            else:                                    # 'school', 'schooner'
                r.append("S")
                r.append("K")
            return i + 3
        if i == 0 and not _is_vowel(_char(v, 3)) and _char(v, 3) != "W":
            r.append("X", "S")                       # 'Schmidt' (handled at S)
        else:
            r.append("X")
        return i + 3
    if _contains(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
        return i + 3
    r.append("S")
    r.append("K")
    return i + 3


def _handle_t(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "TH") or _contains(v, i, 3, "TTH"):
        if _contains(v, i + 2, 2, "OM", "AM") or \
                v.startswith(("VAN ", "VON ", "SCH")):
            r.append("T")                            # 'Thomas', germanic
        else:
            r.append("0", "T")
        return i + 2
    r.append("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if i == 0 and (_is_vowel(_char(v, i + 1)) or _contains(v, i, 2, "WH")):
        if _is_vowel(_char(v, i + 1)):
            r.append("A", "F")                       # 'Wasserman' ~ 'Vasserman'
        else:
            r.append("A")                            # 'Wh-'
        return i + 1
    if (i == len(v) - 1 and _is_vowel(_char(v, i - 1))) or \
            _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") or \
            v.startswith("SCH"):
        r.append_alternate("F")                      # polish -owski
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.append_primary("T")
        r.append_primary("S")
        r.append_alternate("F")
        r.append_alternate("X")
        return i + 4
    return i + 1                                     # else silent


def _handle_x(v: str, r: _Result, i: int) -> int:
    if i == 0:
        r.append("S")                                # 'Xavier'
        return i + 1
    if not (i == len(v) - 1 and
            (_contains(v, i - 3, 3, "IAU", "EAU") or
             _contains(v, i - 2, 2, "AU", "OU"))):   # french: 'breaux'
        r.append("K")
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _char(v, i + 1) == "H":                       # 'Zhao'
        r.append("J")
        return i + 2
    if _contains(v, i + 1, 2, "ZO", "ZI", "ZA") or \
            (slavo and i > 0 and _char(v, i - 1) != "T"):
        r.append_primary("S")
        r.append_alternate("T")
        r.append_alternate("S")
    else:
        r.append("S")
    return i + 2 if _char(v, i + 1) == "Z" else i + 1


def double_metaphone_filter(inject: bool = True, max_code_len: int = 4):
    """DoubleMetaphoneFilter.java chain member for CustomAnalyzer:
    inject=True keeps the token and stacks primary (+ alternate when
    it differs) at the same position (posInc=0); inject=False replaces
    the token with the primary code and stacks only the differing
    alternate."""

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            primary, alternate = double_metaphone(t, max_code_len)
            primary, alternate = primary.lower(), alternate.lower()
            if inject:
                out_t.append(t)
                out_p.append(p)
                if primary and primary != t:
                    out_t.append(primary)
                    out_p.append(p)
            else:
                out_t.append(primary if primary else t)
                out_p.append(p)
            if alternate and alternate != primary:
                out_t.append(alternate)
                out_p.append(p)
        return out_t, out_p

    return f
