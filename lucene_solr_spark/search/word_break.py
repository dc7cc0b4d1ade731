"""WordBreakSpellChecker: "did you mean" suggestions that BREAK one
out-of-vocabulary word into indexed words ("helloworld" → "hello
world") or COMBINE adjacent query words into one indexed word
("hel lo" → "hello").

Reference: ``lucene/suggest/.../search/spell/WordBreakSpellChecker.java``
— ``suggestWordBreaks`` (:92-130, recursive splits at :256-307),
``suggestWordCombinations`` (:160-250), ranking comparators
(:444-485): breaks sort by (word count asc, then max-or-sum component
df desc); combinations by (terms combined asc, then combined df desc).

Spark-first shape: the reference issues one ``IndexReader.docFreq``
per candidate substring as the recursion visits it. Here every
contiguous substring of the input (O(len²), ≤ a few hundred strings)
is resolved in ONE batched ``term_stats`` lookup — a single
bucket-pruned dict scan / broadcast-size collect — and the recursion
then runs driver-side against the in-memory df map. Same answers,
one Spark job instead of O(evaluations) point lookups; at 100 TB the
dict scan is the only distributed work and it is pruned to the
buckets holding the candidate substrings.
"""

from __future__ import annotations

from .executor import IndexSearcher

__all__ = ["suggest_word_breaks", "suggest_word_combinations"]

#: SuggestMode (org.apache.lucene.search.spell.SuggestMode)
SUGGEST_WHEN_NOT_IN_INDEX = "SUGGEST_WHEN_NOT_IN_INDEX"
SUGGEST_MORE_POPULAR = "SUGGEST_MORE_POPULAR"
SUGGEST_ALWAYS = "SUGGEST_ALWAYS"


def _substring_freqs(searcher: IndexSearcher, texts: set[str],
                     field: str) -> dict[str, int]:
    stats = searcher.term_stats({(field, t) for t in texts})
    return {t: stats.get((field, t), 0) for t in texts}


def suggest_word_breaks(
    searcher: IndexSearcher,
    word: str,
    max_suggestions: int = 5,
    *,
    field: str = "content",
    min_suggestion_frequency: int = 1,
    min_break_word_length: int = 1,
    max_changes: int = 1,
    max_evaluations: int = 1000,
    sum_freq_sort: bool = False,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
) -> list[list[tuple[str, int]]]:
    """Break ``word`` into dictionary words.

    Returns up to ``max_suggestions`` suggestions, each a list of
    ``(part, df)`` in order, best first — fewest parts, then highest
    max (or, with ``sum_freq_sort``, summed) component df
    (``LengthThenMaxFreqComparator`` / ``LengthThenSumFreqComparator``).
    """
    if max_suggestions < 1 or not word:
        return []
    min_len = max(1, min_break_word_length)

    # All contiguous substrings ≥ min_len — the candidate universe the
    # recursion can touch — resolved in one batched lookup.
    subs = {word[i:j] for i in range(len(word))
            for j in range(i + min_len, len(word) + 1)}
    freq = _substring_freqs(searcher, subs | {word}, field)

    orig_freq = freq.get(word, 0)
    if orig_freq > 0 and suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX:
        return []
    use_min = min_suggestion_frequency
    if suggest_mode == SUGGEST_MORE_POPULAR:
        use_min = orig_freq if orig_freq else 1

    suggestions: list[list[tuple[str, int]]] = []
    evals = [0]

    def gen(text: str, number_breaks: int, prefix: list[tuple[str, int]]):
        # generateBreakUpSuggestions (:256-307)
        if len(text) < min_len * 2:
            return
        for i in range(min_len, len(text) - min_len + 1):
            if evals[0] >= max_evaluations:
                break
            evals[0] += 1
            left, right = text[:i], text[i:]
            lf = freq.get(left, 0)
            if lf < use_min:
                continue
            rf = freq.get(right, 0)
            if rf >= use_min:
                suggestions.append(prefix + [(left, lf), (right, rf)])
            if number_breaks + 1 <= max_changes:
                gen(right, number_breaks + 1, prefix + [(left, lf)])

    gen(word, 1, [])
    key = (lambda s: (len(s), -sum(f for _w, f in s))) if sum_freq_sort else (
        lambda s: (len(s), -max(f for _w, f in s)))
    suggestions.sort(key=key)
    return suggestions[:max_suggestions]


def suggest_word_combinations(
    searcher: IndexSearcher,
    words: list[str],
    max_suggestions: int = 5,
    *,
    field: str = "content",
    min_suggestion_frequency: int = 1,
    max_combine_word_length: int = 20,
    max_changes: int = 1,
    max_evaluations: int = 1000,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
) -> list[tuple[str, int, tuple[int, ...]]]:
    """Combine adjacent ``words`` into one dictionary word.

    Returns up to ``max_suggestions`` of ``(combined, df,
    original_indexes)``, best first — fewest terms combined, then
    highest combined df (``CombinationsThenFreqComparator``).
    ``SUGGEST_WHEN_NOT_IN_INDEX`` only fires when at least one of the
    combined source words is itself absent from the index
    (``minFreq == 0`` check at :222).
    """
    if max_suggestions < 1 or len(words) < 2:
        return []

    # Candidate universe: every adjacent run of 2..max_changes+1 words
    # plus the source words themselves — one batched df lookup.
    combos: list[tuple[str, tuple[int, ...]]] = []
    for i in range(len(words) - 1):
        combined = words[i]
        if len(combined) > max_combine_word_length:
            continue
        for j in range(i + 1, min(len(words), i + max_changes + 1)):
            combined = combined + words[j]
            if len(combined) > max_combine_word_length:
                break
            combos.append((combined, tuple(range(i, j + 1))))
    freq = _substring_freqs(
        searcher, {c for c, _ in combos} | set(words), field)

    out: list[tuple[str, int, tuple[int, ...]]] = []
    evals = 0
    for combined, idxs in combos:
        if evals >= max_evaluations:
            break
        evals += 1
        comp_freqs = [freq.get(words[i], 0) for i in idxs]
        cf = freq.get(combined, 0)
        if suggest_mode == SUGGEST_MORE_POPULAR and cf < max(comp_freqs):
            continue
        if suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX and min(comp_freqs) != 0:
            continue
        if cf >= min_suggestion_frequency:
            out.append((combined, cf, idxs))
    out.sort(key=lambda s: (len(s[2]) - 1, -s[1]))
    return out[:max_suggestions]
