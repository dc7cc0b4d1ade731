"""Hunspell dictionary stemming — the reference's
lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/
module (Dictionary.java parses .aff/.dic, Stemmer.java enumerates
affix-stripped stems, HunspellStemFilter.java stacks every stem at
the token position).

Scope: the affix core that stemming actually uses —
  * .aff: FLAG mode (single-char, ``long``, ``num``), PFX/SFX rule
    blocks with strip/append/condition and cross-product, IGNORE,
    continuation flags on affix appends (one level, the two-suffix
    case Dictionary.java calls "twofold").
  * .dic: entry count header, ``word/FLAGS`` lines, morphological
    fields after tab dropped.
  * stem(): exact-form lookup + every single-suffix, single-prefix,
    prefix+suffix (cross-product) and suffix-then-suffix (twofold)
    analysis whose restored stem is a dictionary entry carrying the
    rule's flag.
Compounding (COMPOUNDRULE), REP suggestions, and PHONE are spellcheck
concerns, out of stemming scope (the repo's spellchecker has its own
edit-distance path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class _Affix:
    flag: str
    strip: str
    append: str          # surface text added to the stem
    condition: re.Pattern | None
    cross: bool
    cont_flags: frozenset[str]  # continuation classes on the append


def _parse_flags(s: str, mode: str) -> frozenset[str]:
    if not s:
        return frozenset()
    if mode == "long":
        return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
    if mode == "num":
        return frozenset(x.strip() for x in s.split(",") if x.strip())
    return frozenset(s)


class HunspellDictionary:
    """Parsed .aff + .dic pair. ``stem(word)`` returns every valid
    stem (dictionary surface forms), most-specific last like
    Stemmer.java's enumeration order."""

    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "char"
        self.ignore = ""
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self._parse_aff(aff_text)
        # words: surface form -> union of flag sets (a form may repeat)
        self.words: dict[str, frozenset[str]] = {}
        self._parse_dic(dic_text)

    # -- parsing ------------------------------------------------------

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split("#", 1)[0].split()
            i += 1
            if not parts:
                continue
            d = parts[0]
            if d == "FLAG" and len(parts) > 1:
                self.flag_mode = parts[1]  # long | num | (UTF-8 = char)
                if self.flag_mode not in ("long", "num"):
                    self.flag_mode = "char"
            elif d == "IGNORE" and len(parts) > 1:
                self.ignore = parts[1]
            elif d in ("PFX", "SFX") and len(parts) >= 4:
                flag, cross, count = parts[1], parts[2] == "Y", int(parts[3])
                rules = []
                for _ in range(count):
                    while i < len(lines):
                        rp = lines[i].split("#", 1)[0].split()
                        i += 1
                        if rp:
                            break
                    else:
                        break
                    # PFX flag strip append [condition]
                    strip = "" if rp[2] == "0" else rp[2]
                    app_raw = "" if rp[3] == "0" else rp[3]
                    app, _, cont = app_raw.partition("/")
                    cond_src = rp[4] if len(rp) > 4 else "."
                    cond = None
                    if cond_src != ".":
                        try:
                            cond = re.compile(
                                ("^" + cond_src) if d == "PFX"
                                else (cond_src + "$"))
                        except re.error:
                            cond = None
                    rules.append(_Affix(
                        flag, strip, app, cond, cross,
                        _parse_flags(cont, self.flag_mode)))
                target = self.prefixes if d == "PFX" else self.suffixes
                target.setdefault(flag, []).extend(rules)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for ln in lines[start:]:
            ln = ln.split("\t", 1)[0].strip()  # drop morph fields
            if not ln:
                continue
            word, _, flags = ln.partition("/")
            if self.ignore:
                word = "".join(c for c in word if c not in self.ignore)
            fs = _parse_flags(flags, self.flag_mode)
            prev = self.words.get(word)
            self.words[word] = fs | prev if prev else fs

    # -- stemming -----------------------------------------------------

    def _lookup(self, form: str) -> frozenset[str] | None:
        hit = self.words.get(form)
        if hit is None and form.lower() != form:
            hit = self.words.get(form.lower())
        return hit

    def _all_suffixes(self):
        for rules in self.suffixes.values():
            yield from rules

    def _all_prefixes(self):
        for rules in self.prefixes.values():
            yield from rules

    def _try_suffix(self, word: str, sfx: _Affix) -> str | None:
        """Undo ``sfx`` on ``word``; return the restored stem if the
        surface shape and condition allow it."""
        if sfx.append:
            if not word.endswith(sfx.append) or len(word) <= len(sfx.append) - len(sfx.strip):
                return None
            stem = word[:len(word) - len(sfx.append)] + sfx.strip
        else:
            stem = word + sfx.strip
        if not stem:
            return None
        if sfx.condition is not None and not sfx.condition.search(stem):
            return None
        return stem

    def _try_prefix(self, word: str, pfx: _Affix) -> str | None:
        if pfx.append:
            if not word.startswith(pfx.append):
                return None
            stem = pfx.strip + word[len(pfx.append):]
        else:
            stem = pfx.strip + word
        if not stem:
            return None
        if pfx.condition is not None and not pfx.condition.search(stem):
            return None
        return stem

    def stem(self, word: str) -> list[str]:
        if self.ignore:
            word = "".join(c for c in word if c not in self.ignore)
        out: list[str] = []
        seen: set[str] = set()

        def add(form: str) -> None:
            if form not in seen:
                seen.add(form)
                out.append(form)

        if self._lookup(word) is not None:
            add(word)
        # single suffix (outermost affix strips first)
        for sfx in self._all_suffixes():
            stem = self._try_suffix(word, sfx)
            if stem is None:
                continue
            flags = self._lookup(stem)
            if flags is not None and sfx.flag in flags:
                add(stem)
            # twofold suffix: strip an inner suffix whose append
            # carries the outer flag as a continuation class
            # (Dictionary.java "twofold" — kind/K + ness/S chains to
            # kindnesses when the K rule's append is ness/S)
            for sfx_in in self._all_suffixes():
                if sfx.flag not in sfx_in.cont_flags:
                    continue
                stem2 = self._try_suffix(stem, sfx_in)
                if stem2 is None:
                    continue
                flags2 = self._lookup(stem2)
                if flags2 is not None and sfx_in.flag in flags2:
                    add(stem2)
            # cross-product: a prefix under the same dictionary entry
            if sfx.cross:
                for pfx in self._all_prefixes():
                    if not pfx.cross:
                        continue
                    stem2 = self._try_prefix(stem, pfx)
                    if stem2 is None:
                        continue
                    flags2 = self._lookup(stem2)
                    if flags2 is not None and sfx.flag in flags2 \
                            and pfx.flag in flags2:
                        add(stem2)
        # single prefix
        for pfx in self._all_prefixes():
            stem = self._try_prefix(word, pfx)
            if stem is None:
                continue
            flags = self._lookup(stem)
            if flags is not None and pfx.flag in flags:
                add(stem)
        return out


def hunspell_stem_filter(dictionary: HunspellDictionary,
                         dedup: bool = True,
                         longest_only: bool = False):
    """HunspellStemFilter.java chain member: replace each token with
    its stems, all stacked at the token's position (posInc=0 for the
    extras); tokens with no stem pass through unchanged.
    ``longest_only`` keeps only the longest stem (the filter's
    longestOnly option)."""

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            stems = dictionary.stem(t)
            if not stems:
                out_t.append(t)
                out_p.append(p)
                continue
            if longest_only:
                stems = [max(stems, key=len)]
            elif dedup:
                seen: set[str] = set()
                stems = [s for s in stems
                         if not (s in seen or seen.add(s))]
            for s in stems:
                out_t.append(s)
                out_p.append(p)
        return out_t, out_p

    return f
