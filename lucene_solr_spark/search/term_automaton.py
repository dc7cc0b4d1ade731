"""TermAutomatonQuery: a proximity query expressed as an automaton
whose transitions are terms — the generalization of PhraseQuery /
MultiPhraseQuery / SpanNearQuery.

Reference: lucene/sandbox/src/java/org/apache/lucene/search/
TermAutomatonQuery.java (builder + finish()'s ANY expansion +
determinize + rewrite), TermAutomatonScorer.java (the per-document
position-ordered graph intersection, countMatches at :225-341), and
TokenStreamToTermAutomatonQuery.java (token stream → automaton, '*'
as the any-term wildcard).

Semantics ported exactly:

* The automaton's alphabet is integer term IDs assigned in
  registration order; ``ANY`` is one more ID (``getTermID(null)``,
  TermAutomatonQuery.java:221-236).
* ``finish()`` rejects a leading or trailing ANY, expands every ANY
  arc to the full ID range ``[0, termCount-1]`` (**including** the ANY
  ID itself — ``int termCount = termToID.size()`` at :156 counts the
  null entry, so the expanded range covers it; the scorer's gap
  advance steps with the ANY ID and relies on this), determinizes,
  and rejects an automaton accepting the empty string (:186-190).
* Matching is a **disjunction**: any doc containing any query term is
  visited (the scorer javadoc calls this out); per doc the positions
  of all present terms are merged in order and fed through the DFA.
  ``freq`` = number of acceptances; each token occurrence both
  advances live states and starts a fresh match from state 0
  (TermAutomatonScorer.java:304-328). Live state sets are
  **multisets** (PosState.add never dedups, :373-386) — parallel
  paths through the automaton each count.
* Gap handling: between consecutive token positions, states advance
  through ANY arcs one position at a time, petering out when a
  position holds no live states (:264-291). No acceptance is counted
  during gap advance (finish() guarantees no arc into an accept state
  is an ANY arc).
* Weight: similarity scorer over ALL the query's distinct terms'
  stats (TermAutomatonWeight ctor :341-363) — i.e. the summed-idf
  weight the engine's phrase path already uses.

Spark-first execution (see ``IndexSearcher._term_automaton_leaf``):
the per-term positional postings are unioned with a term-ID tag,
grouped by docid (one shuffle keyed on docid — the same shape as the
engine's span/interval path), and a ``mapInPandas`` pass runs the DFA
per document. The DFA itself is a plain dict broadcast by closure —
tiny (states × terms entries).
"""
from __future__ import annotations

from dataclasses import dataclass

from .queries import (
    MatchNoDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    Query,
    TermQuery,
)

# Matches Operations.DEFAULT_MAX_DETERMINIZED_STATES.
DEFAULT_MAX_DETERMINIZED_STATES = 10000


@dataclass(frozen=True)
class CompiledAutomaton:
    """Determinized automaton over term-ID alphabet: ``step`` maps
    (state, term_id) -> dest state; state 0 is initial."""

    step: dict
    accepts: frozenset
    num_states: int


class TermAutomatonQuery(Query):
    """Builder-style query (TermAutomatonQuery.java public API):
    ``create_state`` / ``set_accept`` / ``add_transition`` /
    ``add_any_transition`` then ``finish()``.  State 0 is initial."""

    def __init__(self, field: str = "content", boost: float = 1.0):
        self.field = field
        self.boost = boost
        self._num_states = 0
        self._accept: set[int] = set()
        self._arcs: list[tuple[int, int, int]] = []  # (src, dest, term_id)
        self._term_to_id: dict[str, int] = {}
        self._id_to_term: dict[int, str | None] = {}
        self._any_id: int = -1
        self.det: CompiledAutomaton | None = None

    # -- builder ----------------------------------------------------
    def create_state(self) -> int:
        s = self._num_states
        self._num_states += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def _get_term_id(self, term: str | None) -> int:
        # TermAutomatonQuery.java getTermID: IDs in registration order;
        # the null (ANY) term gets an ID like any other.
        key = term
        if key in self._term_to_id:
            return self._term_to_id[key]
        tid = len(self._term_to_id)
        self._term_to_id[key] = tid
        self._id_to_term[tid] = term
        if term is None:
            self._any_id = tid
        return tid

    def add_transition(self, source: int, dest: int, term: str) -> None:
        if term is None:
            raise ValueError("term should not be null")
        self._arcs.append((source, dest, self._get_term_id(term)))

    def add_any_transition(self, source: int, dest: int) -> None:
        self._arcs.append((source, dest, self._get_term_id(None)))

    # -- finish: ANY expansion + determinize ------------------------
    def finish(self,
               max_determinized_states: int = DEFAULT_MAX_DETERMINIZED_STATES,
               ) -> "TermAutomatonQuery":
        any_id = self._any_id
        arcs = self._arcs
        if any_id != -1:
            # No leading ANY (from the initial state) and no trailing
            # ANY (into an accept state) — TermAutomatonQuery.java:136-154.
            for src, dest, tid in arcs:
                if tid == any_id and src == 0:
                    raise ValueError(
                        "automaton cannot lead with an ANY transition")
                if tid == any_id and dest in self._accept:
                    raise ValueError(
                        "automaton cannot end with an ANY transition")
            # Expand ANY arcs to the full ID range [0, termCount-1]
            # (termCount INCLUDES the ANY id — :156-181).
            term_count = len(self._term_to_id)
            expanded: list[tuple[int, int, int]] = []
            for src, dest, tid in arcs:
                if tid == any_id:
                    expanded.extend(
                        (src, dest, t) for t in range(term_count))
                else:
                    expanded.append((src, dest, tid))
            arcs = expanded

        # NFA table: (state, tid) -> set of dests
        nfa: dict[tuple[int, int], set[int]] = {}
        for src, dest, tid in arcs:
            nfa.setdefault((src, tid), set()).add(dest)
        alphabet = sorted({tid for (_s, tid) in nfa})

        # Subset construction (Operations.determinize role).
        start = frozenset([0])
        subset_id = {start: 0}
        worklist = [start]
        step: dict[tuple[int, int], int] = {}
        accepts: set[int] = set()
        if self._accept & start:
            accepts.add(0)
        while worklist:
            cur = worklist.pop()
            cur_id = subset_id[cur]
            for tid in alphabet:
                nxt = set()
                for s in cur:
                    nxt |= nfa.get((s, tid), set())
                if not nxt:
                    continue
                key = frozenset(nxt)
                if key not in subset_id:
                    if len(subset_id) >= max_determinized_states:
                        raise ValueError(
                            "determinizing automaton would require more "
                            f"than {max_determinized_states} states")
                    subset_id[key] = len(subset_id)
                    worklist.append(key)
                    if self._accept & key:
                        accepts.add(subset_id[key])
                step[(cur_id, tid)] = subset_id[key]

        # Remove dead states (Operations.removeDeadStates role): keep
        # only states reachable from 0 AND able to reach an accept
        # state; with both prunes an empty language leaves step and
        # accepts both empty (Operations.isEmpty test in rewrite()).
        co = set(accepts)
        changed = True
        while changed:
            changed = False
            for (s, _t), d in step.items():
                if d in co and s not in co:
                    co.add(s)
                    changed = True
        fwd = {0}
        changed = True
        while changed:
            changed = False
            for (s, _t), d in step.items():
                if s in fwd and d not in fwd:
                    fwd.add(d)
                    changed = True
        live = co & fwd
        step = {k: d for k, d in step.items()
                if d in live and k[0] in live}
        accepts &= live
        if 0 in accepts:
            raise ValueError("cannot accept the empty string")
        self.det = CompiledAutomaton(step=step,
                                     accepts=frozenset(accepts),
                                     num_states=len(subset_id))
        return self

    # -- introspection ----------------------------------------------
    @property
    def any_id(self) -> int:
        return self._any_id

    def terms(self) -> dict[int, str]:
        """term_id -> term for the real (non-ANY) terms."""
        return {tid: t for tid, t in self._id_to_term.items()
                if t is not None}

    def _check_finished(self) -> CompiledAutomaton:
        if self.det is None:
            raise ValueError(f"Call finish first on: {self!r}")
        return self.det

    def __repr__(self) -> str:  # toString parity
        n = self.det.num_states if self.det is not None else None
        return (f"TermAutomatonQuery(field={self.field}"
                + (f" numStates={n}" if n is not None else "") + ")")

    # -- rewrite (TermAutomatonQuery.java:418-492) -------------------
    def rewrite(self) -> Query:
        det = self._check_finished()
        if not det.step and not det.accepts:
            return MatchNoDocsQuery()
        single = self._get_singleton()
        if single is not None and len(single) == 1:
            return TermQuery(field=self.field,
                             term=self._id_to_term[single[0]],
                             boost=self.boost)
        # Sausage check (:431-483): every state's arcs all point at ONE
        # next state, no accept state mid-chain; an ANY slot is SKIPPED
        # but still advances the position counter, so "a * b" rewrites
        # to a phrase with an explicit position gap (pq.add(term, pos)).
        slots: list[tuple[int, tuple[str, ...]]] = []
        state, ok_mpq, ok_pq = 0, True, True
        pos = 0
        while ok_mpq:
            outs = [(tid, d) for (s, tid), d in det.step.items()
                    if s == state]
            if not outs:
                if state not in det.accepts:
                    ok_mpq = ok_pq = False
                break
            if state in det.accepts:
                ok_mpq = ok_pq = False
                break
            dests = {d for _t, d in outs}
            if len(dests) != 1:
                ok_mpq = ok_pq = False
                break
            matches_any = any(tid == self._any_id for tid, _d in outs)
            if not matches_any:
                terms = tuple(sorted(self._id_to_term[tid]
                                     for tid, _d in outs
                                     if self._id_to_term[tid] is not None))
                slots.append((pos, terms))
                if len(terms) != 1:
                    ok_pq = False
            state = next(iter(dests))
            pos += 1
        if ok_pq and slots:
            return PhraseQuery(field=self.field,
                               terms=tuple(t[0] for _p, t in slots),
                               positions=tuple(p for p, _t in slots),
                               boost=self.boost)
        if ok_mpq and slots:
            return MultiPhraseQuery(
                field=self.field,
                termss=tuple(t for _p, t in slots),
                positions=tuple(p for p, _t in slots),
                boost=self.boost)
        return self

    def _get_singleton(self) -> list[int] | None:
        """Operations.getSingleton role: the one accepted string, or
        None if the language is not exactly one string."""
        det = self.det
        path: list[int] = []
        state = 0
        seen = {0}
        while True:
            outs = [(tid, d) for (s, tid), d in det.step.items()
                    if s == state]
            if state in det.accepts:
                return path if not outs else None
            if len(outs) != 1:
                return None
            tid, dest = outs[0]
            if dest in seen:
                return None  # cycle
            seen.add(dest)
            path.append(tid)
            state = dest


def count_matches(events: list[tuple[int, int]],
                  det: CompiledAutomaton,
                  any_id: int) -> int:
    """TermAutomatonScorer.countMatches (:225-341), exactly: walk the
    doc's (position, term_id) events in position order; live automaton
    states per position are MULTISETS; freq = acceptances.

    ``events`` must be sorted by (pos, term_id) — ties at the same
    position are order-independent in the reference (reads come from
    positions[pos], writes go to positions[pos+1], and the gap advance
    is suppressed when lastPos == pos), so any stable order matches.
    """
    step = det.step
    accepts = det.accepts
    freq = 0
    positions: dict[int, list[int]] = {}
    last_pos = -1
    for pos, tid in events:
        # Maybe advance ANY matches across the gap (:264-291).
        if last_pos != -1 and any_id != -1:
            start_last = lp = last_pos
            while lp < pos:
                cur = positions.get(lp)
                if not cur and lp > start_last:
                    break  # petered out
                if cur:
                    nxt = positions.setdefault(lp + 1, [])
                    for st in cur:
                        ns = step.get((st, any_id))
                        if ns is not None:
                            nxt.append(ns)
                lp += 1
        cur = positions.get(pos, ())
        nxt = positions.setdefault(pos + 1, [])
        # Match current token (:304-317).
        for st in cur:
            ns = step.get((st, tid))
            if ns is not None:
                nxt.append(ns)
                if ns in accepts:
                    freq += 1
        # Also consider starting a new match here (:319-328).
        ns = step.get((0, tid))
        if ns is not None:
            nxt.append(ns)
            if ns in accepts:
                freq += 1
        # Memory guard (shift() role, :209-223): positions < pos can
        # never be read again (events are non-decreasing and the gap
        # advance starts at last_pos == pos after this token).
        if pos != last_pos:
            for key in [p for p in positions if p < pos]:
                del positions[key]
        last_pos = pos
    return freq


def token_stream_to_query(field: str,
                          tokens: list,
                          boost: float = 1.0,
                          preserve_position_increments: bool = True,
                          ) -> TermAutomatonQuery:
    """TokenStreamToTermAutomatonQuery.toQuery (:73-131): each token is
    ``term`` or ``(term, pos_inc)`` or ``(term, pos_inc, pos_length)``;
    a bare ``'*'`` term becomes an any-term transition.  Holes
    (pos_inc > 1) raise, matching the reference (:92-94) — use '*'.
    The last state is the single accept state."""
    q = TermAutomatonQuery(field, boost=boost)
    pos = -1
    state = -1
    for tok in tokens:
        if isinstance(tok, str):
            term, pos_inc, pos_len = tok, 1, 1
        elif len(tok) == 2:
            (term, pos_inc), pos_len = tok, 1
        else:
            term, pos_inc, pos_len = tok
        if not preserve_position_increments and pos_inc > 1:
            pos_inc = 1
        if pos_inc > 1:
            raise ValueError(
                "cannot handle holes; to accept any term, use '*' term")
        if pos_inc > 0:
            pos += pos_inc
        end_pos = pos + pos_len
        while state < end_pos:
            state = q.create_state()
        if term == "*":
            q.add_any_transition(pos, end_pos)
        else:
            q.add_transition(pos, end_pos, term)
    if state < 0:
        raise ValueError("empty token stream")
    q.set_accept(state, True)
    q.finish()
    return q
