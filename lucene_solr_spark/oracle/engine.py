"""Single-node Lucene-faithful reference engine (the correctness oracle).

Implements indexing + BM25 top-k search with exactly the reference's
semantics (same analyzer, SmallFloat norms, float32 BM25, HitQueue
tie-break score-desc/docID-asc per search/HitQueue.java:76-81) in plain
Python/numpy — deliberately simple and obviously-correct, NOT fast.
The Spark engine must be rank- and score-identical to this on any
corpus (SURVEY.md §5 test plan, item 5).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..analysis import StandardAnalyzer
from ..search import bm25
from ..search.multiterm import expand_terms
from ..search.sloppy import sloppy_freq
from ..search.queries import (
    BlendedTermLeaf,
    BlendedTermQuery,
    BooleanClause,
    BooleanQuery,
    CommonTermsQuery,
    ConstantScoreQuery,
    CoveringQuery,
    DisjunctionMaxQuery,
    FieldExistsQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermQuery,
    TopDoc,
    build_common_terms,
)
from ..util.smallfloat import int_to_byte4


class OracleIndex:
    """Multi-field: a document is ``{field: text}`` (a bare string means
    ``{"content": text}``); postings/norms/collection stats are
    per-field (FieldInfos, index/FieldInfo.java:31-71), so BM25 idf and
    avgdl resolve per field exactly like per-field
    collectionStatistics."""

    def __init__(self, analyzer: StandardAnalyzer | None = None,
                 k1: float = 1.2, b: float = 0.75,
                 similarity: str = "bm25"):
        self.analyzer = analyzer or StandardAnalyzer()
        self.k1, self.b = k1, b
        self.similarity = similarity
        # (field, term) -> list[(docid, tf, positions tuple)]
        self.postings: dict[tuple[str, str], list[tuple[int, int, tuple[int, ...]]]] = defaultdict(list)
        # field -> per-doc norm byte (None where the field is absent)
        self.field_norms: dict[str, list[int | None]] = defaultdict(list)
        self.doc_count = 0
        self.field_doc_count: dict[str, int] = defaultdict(int)
        self.field_sum_ttf: dict[str, int] = defaultdict(int)

    # back-compat: content-field views
    @property
    def norms(self) -> list[int | None]:
        return self.field_norms.get("content", [])

    @property
    def sum_ttf(self) -> int:
        return self.field_sum_ttf.get("content", 0)

    def add(self, doc) -> int:
        docid = self.doc_count
        fields = {"content": doc} if isinstance(doc, str) else dict(doc)
        for f, text in fields.items():
            if text is None:
                continue
            terms, positions = self.analyzer.analyze(text)
            by_term: dict[str, list[int]] = defaultdict(list)
            for t, p in zip(terms, positions):
                by_term[t].append(p)
            for t, ps in by_term.items():
                self.postings[(f, t)].append((docid, len(ps), tuple(ps)))
            nl = self.field_norms[f]
            nl.extend([None] * (docid - len(nl)))
            nl.append(int_to_byte4(len(terms)))
            self.field_sum_ttf[f] += len(terms)
            self.field_doc_count[f] += 1
        self.doc_count += 1
        return docid

    def add_all(self, docs) -> None:
        for d in docs:
            self.add(d)

    def _norm(self, field: str, docid: int) -> int:
        nl = self.field_norms.get(field, [])
        v = nl[docid] if docid < len(nl) else None
        return 0 if v is None else v

    # -- stats ---------------------------------------------------------
    def doc_freq(self, term: str, field: str = "content") -> int:
        return len(self.postings.get((field, term), ()))

    def total_term_freq(self, term: str, field: str = "content") -> int:
        return sum(tf for _, tf, _ in self.postings.get((field, term), ()))

    def scorer(self, field: str = "content"):
        from ..search.similarities import (
            SIMILARITIES,
            resolve_field_similarity,
        )

        dc = max(self.field_doc_count.get(field, 0), 1)
        st = max(self.field_sum_ttf.get(field, 0), 1)
        sim = resolve_field_similarity(self.similarity, field)
        if callable(sim) and not isinstance(sim, str):
            return sim(dc, st)  # configured similarity
        return SIMILARITIES[sim](dc, st, self.k1, self.b)

    # -- matching ------------------------------------------------------
    def _match(self, q: Query, scorer: bm25.BM25Scorer, boost: float = 1.0) -> dict[int, float]:
        """Return {docid: per-query float32 score}. Scores follow the
        per-scorer float discipline; sums over clauses in float64 then
        cast to float32 (see search/bm25.py). Leaf queries resolve
        their own field's scorer; ``scorer`` is the calling context's
        (kept for compound score plumbing)."""
        if isinstance(q, TermQuery):
            plist = self.postings.get((q.field, q.term), ())
            if not plist:
                return {}
            fscorer = self.scorer(q.field)
            out = {}
            if getattr(fscorer, "needs_ttf", False):
                # SimilarityBase family (LM/DFR): per-term collection
                # stats, not a precomputed weight (SimilarityBase.java
                # fillBasicStats → BasicSimScorer.score)
                df = len(plist)
                ttf = sum(tf for _, tf, _ in plist)
                for docid, tf, _ in plist:
                    s = fscorer.stats_partial(
                        np.array([tf]),
                        np.array([self._norm(q.field, docid)]),
                        boost * q.boost, df, ttf)[0]
                    out[docid] = float(s)
                return out
            w = fscorer.weight(len(plist), boost * q.boost)
            for docid, tf, _ in plist:
                s = fscorer.partial(
                    np.array([tf]), np.array([self._norm(q.field, docid)]), w)[0]
                out[docid] = float(s)
            return out

        if isinstance(q, PhraseQuery):
            return self._match_phrase(q, self.scorer(q.field), boost)

        if isinstance(q, MultiPhraseQuery):
            return self._match_multi_phrase(q, self.scorer(q.field), boost)

        if isinstance(q, CommonTermsQuery):
            dfs = {t: self.doc_freq(t, q.field) for t in q.terms}
            return self._match(
                build_common_terms(q, dfs, self.field_doc_count.get(q.field, 0)),
                scorer, boost)

        if isinstance(q, MatchAllDocsQuery):
            return {d: float(np.float32(boost * q.boost)) for d in range(self.doc_count)}

        if isinstance(q, MatchNoDocsQuery):
            return {}
        if isinstance(q, FieldExistsQuery):
            c = float(np.float32(boost * q.boost))
            nl = self.field_norms.get(q.field, [])
            return {d: c for d, v in enumerate(nl) if v is not None}

        if isinstance(q, ConstantScoreQuery):
            inner = self._match(q.query, scorer, 1.0)
            c = float(np.float32(boost * q.boost))
            return {d: c for d in inner}

        if isinstance(q, BooleanQuery):
            return self._match_boolean(q, scorer, boost)

        from ..search.intervals import IntervalQuery
        from ..search.spans import SpanQuery

        if isinstance(q, (SpanQuery, IntervalQuery)):
            return self._match_spans(q, boost)

        from ..search.term_automaton import TermAutomatonQuery

        if isinstance(q, TermAutomatonQuery):
            return self._match_term_automaton(q, boost)

        from ..search.fuzzy_like_this import (
            FuzzyLikeThisQuery,
            build_fuzzy_like_this,
            fuzzy_variant_score,
        )

        if isinstance(q, FuzzyLikeThisQuery):
            # in-memory vocabulary walk (the FuzzyTermsEnum role)
            def enum(field, term, max_edits, prefix_length):
                pref = term[:prefix_length]
                out = []
                for (f, t), plist in self.postings.items():
                    if f != field or not t.startswith(pref):
                        continue
                    if fuzzy_variant_score(term, t, max_edits) != float(
                            "-inf"):
                        out.append((t, len(plist)))
                return out

            rewritten = build_fuzzy_like_this(
                q, enum,
                lambda f, t: len(self.postings.get((f, t), ())),
                self.doc_count,
                q.analyzer or self.analyzer)
            return self._match(rewritten, scorer, boost)

        if isinstance(q, MultiTermQuery):
            qfield = getattr(q, "field", "content")
            terms = expand_terms(
                (t for f, t in self.postings.keys() if f == qfield), q)
            rewritten = self._rewrite_multiterm(q, terms, qfield)
            return self._match(rewritten, scorer, boost)

        if isinstance(q, SynonymQuery):
            return self._match_synonym(q, self.scorer(q.field), boost)

        if isinstance(q, DisjunctionMaxQuery):
            return self._match_dismax(q, scorer, boost)

        if isinstance(q, CoveringQuery):
            return self._match_covering(q, scorer, boost)

        if isinstance(q, BlendedTermQuery):
            # BlendedTermQuery.java:265-296: df = max member df, ttf =
            # sum member ttf, leaves score with the blended pair
            df = max((len(self.postings.get((f, t), ()))
                      for f, t, _b in q.terms), default=0)
            ttf = sum(sum(tf for _d, tf, _p in self.postings.get((f, t), ()))
                      for f, t, _b in q.terms)
            leaves = tuple(
                BlendedTermLeaf(f, t, df, ttf, b) for f, t, b in q.terms)
            if q.rewrite_method == "boolean":
                rewritten: Query = BooleanQuery(
                    tuple(BooleanClause(l, "SHOULD") for l in leaves),
                    boost=q.boost)
            else:
                rewritten = DisjunctionMaxQuery(leaves, q.tie_breaker, q.boost)
            return self._match(rewritten, scorer, boost)

        if isinstance(q, BlendedTermLeaf):
            plist = self.postings.get((q.field, q.term), ())
            if not plist or q.df == 0:
                return {}
            fscorer = self.scorer(q.field)
            out = {}
            if getattr(fscorer, "needs_ttf", False):
                for docid, tf, _ in plist:
                    s = fscorer.stats_partial(
                        np.array([tf]),
                        np.array([self._norm(q.field, docid)]),
                        boost * q.boost, q.df, q.ttf)[0]
                    out[docid] = float(s)
                return out
            w = fscorer.weight(q.df, boost * q.boost)
            for docid, tf, _ in plist:
                s = fscorer.partial(
                    np.array([tf]), np.array([self._norm(q.field, docid)]), w)[0]
                out[docid] = float(s)
            return out

        from ..search.feature import FeatureQuery

        if isinstance(q, FeatureQuery):
            return self._match_feature(q, boost)

        raise TypeError(f"unsupported query {type(q)}")

    def add_feature(self, docid: int, feature: str, value: float,
                    field: str = "features") -> None:
        """FeatureField write path: the encoded float value IS the
        posting tf (FeatureField.java:153-156); norms omitted."""
        from ..search.feature import encode_feature_value

        if not (0 <= docid < self.doc_count):
            raise ValueError(f"unknown docid {docid}")
        self.postings[(field, feature)].append(
            (docid, encode_feature_value(value), ()))

    def _match_feature(self, q, boost: float) -> dict[int, float]:
        """FeatureQuery.java scorer twin (float disciplines in
        search/feature.py; default satu pivot from df/ttf per
        FeatureField.java:508-520)."""
        from ..search.feature import compute_pivot, feature_scores

        plist = self.postings.get((q.field, q.feature), ())
        if not plist:
            return {}
        pivot = q.pivot
        if q.function == "satu" and pivot is None:
            df = len(plist)
            ttf = sum(tf for _d, tf, _p in plist)
            pivot = compute_pivot(df, ttf)
        w = float(boost * q.weight)
        docids = np.array([d for d, _tf, _p in plist], dtype=np.int64)
        tfs = np.array([tf for _d, tf, _p in plist], dtype=np.int64)
        scores = feature_scores(q.function, tfs, w, q.scaling_factor,
                                pivot, q.exponent)
        return {int(d): float(s) for d, s in zip(docids, scores)}

    def _match_covering(self, q: CoveringQuery, scorer, boost) -> dict[int, float]:
        """CoveringScorer.java:94-134: per-doc minMatch = max(1, value)
        from the LongValuesSource (``oracle_min_match``: docid -> int
        or None = doc has no value -> never matches); score = sum of
        matching sub-queries' scores."""
        mm = q.oracle_min_match
        if mm is None:
            raise ValueError("oracle CoveringQuery needs oracle_min_match")
        scoring = [self._match(sq, scorer, boost * q.boost) for sq in q.queries]
        counts: dict[int, int] = defaultdict(int)
        for m in scoring:
            for d in m:
                counts[d] += 1
        out = {}
        for d, c in counts.items():
            v = mm(d)
            if v is None or c < max(1, int(v)):
                continue
            clause_scores = [m[d] for m in scoring if d in m]
            out[d] = float(bm25.sum_scores_f32(
                np.array(clause_scores, dtype=np.float32)))
        return out

    @staticmethod
    def _rewrite_multiterm(q: MultiTermQuery, terms: list[str],
                           field: str = "content") -> Query:
        """CONSTANT_SCORE_REWRITE / SCORING_BOOLEAN_REWRITE
        (MultiTermQuery.java:94-126)."""
        inner = BooleanQuery(
            tuple(BooleanClause(TermQuery(t, field=field), "SHOULD")
                  for t in terms))
        if getattr(q, "rewrite", "constant_score") == "scoring_boolean":
            return BooleanQuery(inner.clauses, boost=q.boost)
        return ConstantScoreQuery(inner, boost=q.boost)

    def _match_synonym(self, q: SynonymQuery, scorer, boost) -> dict[int, float]:
        """Pseudo-term stats: df = max member df, freq = per-doc sum of
        member freqs; ONE similarity call (SynonymQuery.java:144-158,
        freq sum :446-455)."""
        plists = [self.postings.get((q.field, t), ()) for t in q.terms]
        df = max((len(p) for p in plists), default=0)
        if df == 0:
            return {}
        w = scorer.weight(df, boost * q.boost)
        freqs: dict[int, int] = defaultdict(int)
        for pl in plists:
            for docid, tf, _ in pl:
                freqs[docid] += tf
        out = {}
        for d, f in freqs.items():
            s = scorer.partial(
                np.array([f]), np.array([self._norm(q.field, d)]), w)[0]
            out[d] = float(s)
        return out

    def _match_dismax(self, q: DisjunctionMaxQuery, scorer, boost) -> dict[int, float]:
        """(float)(scoreMax + otherScoreSum * tieBreaker), otherScoreSum
        accumulated in double (DisjunctionMaxScorer.java:58-71)."""
        subs = [self._match(d, scorer, boost * q.boost) for d in q.disjuncts]
        docs = set().union(*(set(m) for m in subs)) if subs else set()
        tb = np.float64(np.float32(q.tie_breaker))
        out = {}
        for d in docs:
            ss = np.array([m[d] for m in subs if d in m], dtype=np.float64)
            mx = ss.max()
            other = ss.sum() - mx
            out[d] = float(np.float32(mx + other * tb))
        return out

    def _match_spans(self, q, boost: float) -> dict[int, float]:
        """Span/interval-query scoring (spans/SpanScorer.java:118-141;
        queries/intervals/IntervalScorer.java role): per doc, float32
        freq = Σ 1/(1+width|gaps) over the matches (search/spans.py or
        search/intervals.py enumeration), weight from the float32 sum
        of the idfs of every PRESENT term in the tree
        (SpanWeight.buildSimWeight → idfExplain(termStats[]))."""
        from ..search.intervals import (
            IntervalQuery,
            interval_freq,
            interval_terms,
        )
        from ..search.spans import span_freq, span_terms

        if isinstance(q, IntervalQuery):
            span_freq = interval_freq    # noqa: F811
            span_terms = interval_terms  # noqa: F811

        field = getattr(q, "field", "content")
        from ..search.spans import SpanQuery, expand_span_multiterm

        if isinstance(q, SpanQuery):
            # SpanMultiTermQueryWrapper rewrite against this index's
            # vocabulary (same shared expansion as the engine)
            q = expand_span_multiterm(
                q, sorted({t for (f, t) in self.postings if f == field}))
        scorer = self.scorer(field)
        if getattr(scorer, "needs_ttf", False):
            raise TypeError("span queries need a precomputed weight; "
                            "unsupported under LM/DFR similarities")
        if isinstance(q, SpanQuery):
            from ..search.spans import span_field_terms

            pairs = sorted(span_field_terms(q))
            keyer = None  # (field, term) keys
        else:
            pairs = sorted((field, t) for t in span_terms(q))
            keyer = "bare"
        plists = {p: self.postings.get(p, ()) for p in pairs}
        dfs = [len(plists[p]) for p in pairs if plists[p]]
        if not dfs:
            return {}
        idfs = [scorer.idf(df) for df in dfs]
        idf_sum = np.float32(np.sum(np.asarray(idfs, dtype=np.float64)))
        w = scorer.weight_from_idf_sum(idf_sum, boost * q.boost)
        # candidate docs: union of the tree's term postings
        by_doc: dict[int, dict] = {}
        for p in pairs:
            key = p[1] if keyer == "bare" else p
            for docid, _tf, pp in plists[p]:
                by_doc.setdefault(docid, {})[key] = np.asarray(
                    pp, dtype=np.int64)
        out = {}
        for d, pos in by_doc.items():
            freq = span_freq(q, pos)
            if freq > 0:
                s = scorer.partial(
                    np.array([freq]), np.array([self._norm(field, d)]), w)[0]
                out[d] = float(s)
        return out

    def _match_term_automaton(self, q, boost: float) -> dict[int, float]:
        """TermAutomatonQuery scoring (sandbox TermAutomatonScorer.java):
        disjunction over the automaton's terms; per doc, freq = DFA
        acceptances over the position-ordered token events
        (countMatches :225-341 via search/term_automaton.count_matches);
        weight = summed idf over the PRESENT terms (TermAutomatonWeight
        ctor :341-363)."""
        from ..search.term_automaton import count_matches

        det = q._check_finished()
        field = q.field
        scorer = self.scorer(field)
        if getattr(scorer, "needs_ttf", False):
            raise TypeError("TermAutomatonQuery needs a precomputed "
                            "weight; unsupported under LM/DFR "
                            "similarities")
        id_to_term = q.terms()
        plists = {tid: self.postings.get((field, t), ())
                  for tid, t in id_to_term.items()}
        dfs = [len(p) for p in plists.values() if p]
        if not dfs:
            return {}
        idfs = [scorer.idf(df) for df in dfs]
        idf_sum = np.float32(np.sum(np.asarray(idfs, dtype=np.float64)))
        w = scorer.weight_from_idf_sum(idf_sum, boost * q.boost)
        by_doc: dict[int, list[tuple[int, int]]] = {}
        for tid, plist in plists.items():
            for docid, _tf, pp in plist:
                by_doc.setdefault(docid, []).extend((p, tid) for p in pp)
        out = {}
        for d, events in by_doc.items():
            events.sort()
            freq = count_matches(events, det, q.any_id)
            if freq > 0:
                s = scorer.partial(
                    np.array([freq], dtype=np.float64),
                    np.array([self._norm(field, d)]), w)[0]
                out[d] = float(s)
        return out

    def _match_phrase(self, q: PhraseQuery, scorer, boost) -> dict[int, float]:
        """ExactPhraseMatcher (slop=0) / SloppyPhraseMatcher (slop>0)
        semantics: exact freq = number of positional alignments; sloppy
        freq = float32 sum of 1/(1+matchLength) over the greedy pq
        traversal (SloppyPhraseMatcher.java:119-152, PhraseScorer.java:
        68-77 — see search/sloppy.py); idf = sum of member idfs
        (BM25Similarity.java:172-181), one sim call on phrase freq."""
        if not q.terms:
            return {}
        plists = [self.postings.get((q.field, t)) for t in q.terms]
        if any(p is None for p in plists):
            return {}
        offs = q.effective_positions()
        # intersect docids
        doc_maps = [{d: pos for d, _, pos in pl} for pl in plists]
        common = set(doc_maps[0])
        for m in doc_maps[1:]:
            common &= set(m)
        # idf sum in float32 over member terms, weight from summed idf
        idfs = [scorer.idf(len(pl)) for pl in plists]
        idf_sum = np.float32(np.sum(np.asarray(idfs, dtype=np.float64)))
        w = scorer.weight_from_idf_sum(idf_sum, boost * q.boost)
        out = {}
        for d in common:
            if q.slop == 0:
                cand = np.asarray(doc_maps[0][d], dtype=np.int64) - offs[0]
                for m, off in zip(doc_maps[1:], offs[1:]):
                    nxt = np.asarray(m[d], dtype=np.int64) - off
                    cand = np.intersect1d(cand, nxt)
                    if cand.size == 0:
                        break
                freq = float(cand.size)
            else:
                freq = sloppy_freq([doc_maps[i][d] for i in range(len(q.terms))],
                                   offs, q.slop)
            if freq > 0:
                s = scorer.partial(
                    np.array([freq]), np.array([self._norm(q.field, d)]), w)[0]
                out[d] = float(s)
        return out

    def _match_multi_phrase(self, q: MultiPhraseQuery, scorer, boost) -> dict[int, float]:
        """MultiPhraseQuery (search/MultiPhraseQuery.java): each slot is
        the positional UNION of its terms' postings (UnionPostingsEnum);
        freq/matching then follow the exact/sloppy phrase machinery.
        Weight: idf summed over every member term with df > 0."""
        if not q.termss or any(not slot for slot in q.termss):
            return {}
        offs = q.effective_positions()
        # per-slot union: doc -> sorted positions
        slot_maps: list[dict[int, tuple[int, ...]]] = []
        for slot in q.termss:
            m: dict[int, list[int]] = defaultdict(list)
            for t in slot:
                for d, _tf, pos in self.postings.get((q.field, t), ()):
                    m[d].extend(pos)
            slot_maps.append({d: tuple(sorted(ps)) for d, ps in m.items()})
        if any(not m for m in slot_maps):
            return {}
        common = set(slot_maps[0])
        for m in slot_maps[1:]:
            common &= set(m)
        dfs = [self.doc_freq(t, q.field) for slot in q.termss for t in slot]
        idfs = [scorer.idf(df) for df in dfs if df > 0]
        idf_sum = np.float32(np.sum(np.asarray(idfs, dtype=np.float64)))
        w = scorer.weight_from_idf_sum(idf_sum, boost * q.boost)
        out = {}
        for d in common:
            if q.slop == 0:
                cand = np.asarray(slot_maps[0][d], dtype=np.int64) - offs[0]
                for m, off in zip(slot_maps[1:], offs[1:]):
                    nxt = np.asarray(m[d], dtype=np.int64) - off
                    cand = np.intersect1d(cand, nxt)
                    if cand.size == 0:
                        break
                freq = float(cand.size)
            else:
                freq = sloppy_freq([slot_maps[i][d] for i in range(len(q.termss))],
                                   offs, q.slop)
            if freq > 0:
                s = scorer.partial(
                    np.array([freq]), np.array([self._norm(q.field, d)]), w)[0]
                out[d] = float(s)
        return out

    def _match_boolean(self, q: BooleanQuery, scorer, boost) -> dict[int, float]:
        must = [c.query for c in q.clauses if c.occur == "MUST"]
        should = [c.query for c in q.clauses if c.occur == "SHOULD"]
        filt = [c.query for c in q.clauses if c.occur == "FILTER"]
        must_not = [c.query for c in q.clauses if c.occur == "MUST_NOT"]
        msm = q.minimum_should_match

        scoring = [self._match(sq, scorer, boost * q.boost) for sq in must + should]
        n_must = len(must)

        # candidate doc set
        if must or filt:
            sets = [set(m) for m in scoring[:n_must]]
            sets += [set(self._match(fq, scorer, 1.0)) for fq in filt]
            docs = set.intersection(*sets) if sets else set()
            if msm > 0:
                # applies even with zero SHOULD clauses: Lucene returns
                # no hits when optional scorers < minShouldMatch
                # (BooleanWeight.java:396)
                docs = {
                    d for d in docs
                    if sum(1 for m in scoring[n_must:] if d in m) >= msm
                }
        else:
            counts: dict[int, int] = defaultdict(int)
            for m in scoring:
                for d in m:
                    counts[d] += 1
            need = max(msm, 1)
            docs = {d for d, c in counts.items() if c >= need}

        for mq in must_not:
            excl = set(self._match(mq, scorer, 1.0))
            docs -= excl

        out = {}
        for d in docs:
            clause_scores = [m[d] for m in scoring if d in m]
            out[d] = float(bm25.sum_scores_f32(np.array(clause_scores, dtype=np.float32)))
        return out

    # -- search --------------------------------------------------------
    def search(self, q: Query, k: int = 10) -> list[TopDoc]:
        """Top-k by (score desc, docID asc) — HitQueue.java:76-81."""
        scorer = self.scorer()
        matches = self._match(q, scorer)
        hits = sorted(
            (TopDoc(d, s) for d, s in matches.items()), key=TopDoc.key
        )
        return hits[:k]

    def count(self, q: Query) -> int:
        return len(self._match(q, self.scorer()))
