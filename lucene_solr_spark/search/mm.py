"""Solr minimum-should-match spec calculator.

Faithful port of ``solr/core/.../util/SolrPluginUtils.java``
``calculateMinShouldMatch`` (:671-709): the dismax/edismax ``mm``
parameter grammar —

* ``"3"``        absolute count
* ``"-2"``       all-but-2
* ``"75%"``      percentage, rounded DOWN
* ``"-25%"``     all but that percentage (negative percent adds)
* ``"2<-25% 9<-3"``  conditional: for N optional clauses, pick the
  first condition whose upper bound N exceeds, rightmost wins —
  "if more than 2 clauses, all-but-25%; if more than 9, all-but-3";
  N at-or-below every bound requires ALL clauses.

The result is clamped to [0, optional_clause_count] exactly like the
reference's final ternary.
"""

from __future__ import annotations

import re

__all__ = ["calc_min_should_match"]

_LT = re.compile(r"(\s+<\s*)|(\s*<\s+)")


def calc_min_should_match(optional_clause_count: int, spec: str) -> int:
    result = optional_clause_count
    spec = spec.strip()

    if "<" in spec:
        spec = _LT.sub("<", spec)
        for s in spec.split(" "):
            parts = s.split("<")
            upper_bound = int(parts[0])
            if optional_clause_count <= upper_bound:
                return result
            result = calc_min_should_match(optional_clause_count, parts[1])
        return result

    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = (result * percent) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc

    if optional_clause_count < result:
        return optional_clause_count
    return 0 if result < 0 else result
