"""DuckDB oracle SQL for the ``engine_*`` driver entries.

The grading driver runs each ``queries()`` entry on Spark AND its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row counts, schemas and an order-insensitive value hash.
These generators express the REAL engine's semantics — docid
assignment, StandardAnalyzer tokenization (the synthetic corpus is
single-space lowercase ASCII, so tokenization ≡ whitespace split +
stop filter, with stopword position gaps), SmallFloat norm
quantization, and Lucene's float32 BM25 discipline — in pure SQL.

Float fidelity: DuckDB ``REAL`` arithmetic is IEEE-754 float32 with
single rounding, bit-identical to numpy float32 / Java float (verified
empirically in tests). Every constant is emitted as the exact double
widening of the engine's float32 value, every intermediate matches the
engine's cast order (search/bm25.py; BM25Similarity.java:69-82,
184-226), so scores compare EXACTLY — no rounding tolerance needed.

Sloppy phrases use a recursive-CTE transliteration of the two-term
greedy traversal of SloppyPhraseMatcher (search/sloppy.py): the
traversal reduces to an alternating "anchor" walk — each round's
match-length is anchor − pred(opposite list, anchor), and the next
anchor is the least position of the opposite list beyond the current
anchor — with float32 freq accumulated along the chain in order.
"""

from __future__ import annotations

import numpy as np

from ..analysis import ENGLISH_STOP_WORDS
from ..util.smallfloat import byte4_to_int

# exact float32 constants, widened to double (bit-exact in SQL literals)
K1 = float(np.float32(1.2))
B_ = float(np.float32(0.75))
OMB = float(np.float32(np.float32(1.0) - np.float32(0.75)))
K1P1 = float(np.float32(np.float32(1.2) + np.float32(1.0)))

STOPS_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

# SmallFloat byte4 decode values (ascending); quantized doc length =
# greatest decode value <= dl (the encode truncates — smallfloat.py)
_DECODE = sorted({byte4_to_int(b) for b in range(256)})
_DECODE_SQL = ", ".join(f"({v})" for v in _DECODE)


def base_ctes() -> str:
    """Shared CTEs: corpus (engine docids), tok (stop-filtered tokens
    with gap positions), per-doc quantized-length norm cache, stats."""
    return f"""
  corpus AS (
    SELECT row_number() OVER (
             ORDER BY source, printf('doc/%09d', doc_id),
                      CAST(doc_id AS VARCHAR)) - 1 AS docid,
           source, text
    FROM documents
  ),
  rawtok AS (
    SELECT docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
    FROM corpus
  ),
  tok AS (
    SELECT docid, term, pos FROM rawtok WHERE term NOT IN ({STOPS_SQL})
  ),
  dl AS (
    SELECT c.docid, count(t.term) AS dl
    FROM corpus c LEFT JOIN tok t USING (docid) GROUP BY c.docid
  ),
  lt(v) AS (VALUES {_DECODE_SQL}),
  st AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sttf FROM dl),
  av AS (SELECT CAST(sttf / n AS REAL) AS avgdl FROM st),
  dc AS (
    -- cache[norm] = f32(k1 * f32((1-b) + f32(f32(b * len)/avgdl)))
    SELECT d.docid,
           CAST({K1!r}::DOUBLE AS REAL)
           * (CAST({OMB!r}::DOUBLE AS REAL)
              + (CAST({B_!r}::DOUBLE AS REAL)
                 * CAST((SELECT max(v) FROM lt WHERE v <= d.dl) AS REAL))
                / (SELECT avgdl FROM av)) AS cache
    FROM dl d
  )"""


def _idf32(df_expr: str) -> str:
    """f32 idf: (float) ln(1 + (n - df + 0.5)/(df + 0.5))."""
    return (f"CAST(ln(1 + ((SELECT n FROM st) - {df_expr} + 0.5)"
            f" / ({df_expr} + 0.5)) AS REAL)")


def term_score_ctes(pred: str, tag: str, tok: str = "tok",
                    dc: str = "dc", st: str = "st",
                    boost: float = 1.0) -> str:
    """Per-(term,doc) float32 BM25 partial scores for terms matching
    ``pred`` (a SQL predicate over ``term``) in the field whose token/
    norm-cache/stats CTEs are ``tok``/``dc``/``st``. Emits CTEs
    qdf_<tag>, tf_<tag>, ts_<tag>(docid, term, s REAL). Weight =
    f32(f32(k1p1 * boost) * idf) (BM25Similarity.java:222 with query
    boost; both f32 products are exact through a double intermediate)."""
    bf = float(np.float32(boost))
    w1 = f"CAST(CAST({K1P1!r}::DOUBLE AS REAL) * {bf!r}::DOUBLE AS REAL)"
    idf = (f"CAST(ln(1 + ((SELECT n FROM {st}) - df + 0.5)"
           f" / (df + 0.5)) AS REAL)")
    return f"""
  qdf_{tag} AS (
    SELECT term, count(*) AS df
    FROM (SELECT DISTINCT docid, term FROM {tok} WHERE {pred})
    GROUP BY term
  ),
  qw_{tag} AS (
    SELECT term, {w1} * {idf} AS w FROM qdf_{tag}
  ),
  tf_{tag} AS (
    SELECT docid, term, count(*) AS tf FROM {tok} WHERE {pred}
    GROUP BY docid, term
  ),
  ts_{tag} AS (
    SELECT t.docid, t.term,
           q.w * CAST(CAST(t.tf AS DOUBLE)
                      / (CAST(t.tf AS DOUBLE) + CAST(c.cache AS DOUBLE))
                 AS REAL) AS s
    FROM tf_{tag} t JOIN qw_{tag} q USING (term)
    JOIN {dc} c ON c.docid = t.docid
  )"""


def sum_topk_sql(tag: str, k: int = 10) -> str:
    """SHOULD-sum over ts_<tag> → top-k (score desc, docid asc) with the
    double-accumulate/float32-cast discipline."""
    return f"""
  SELECT docid, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM ts_{tag} GROUP BY docid
  ORDER BY score DESC, docid ASC LIMIT {k}"""


def bm25_topk(terms: tuple[str, ...], k: int = 10) -> str:
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return ("WITH " + base_ctes() + "," + term_score_ctes(pred, "q")
            + sum_topk_sql("q", k))


def bm25_bool_topk(should: tuple[str, ...], must: tuple[str, ...] = (),
                   must_not: tuple[str, ...] = (), k: int = 10) -> str:
    """General term-level boolean top-k: MUST terms all required (and
    scoring), SHOULD terms optional scoring, MUST_NOT excluded —
    BooleanQuery semantics (Boolean2ScorerSupplier.java:93-164,
    ReqExclScorer.java), float32 sum discipline as sum_topk_sql."""
    terms = tuple(must) + tuple(should)
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    where = ""
    if must_not:
        nt = ", ".join(f"'{t}'" for t in must_not)
        where = (f"\n  WHERE docid NOT IN "
                 f"(SELECT DISTINCT docid FROM tok WHERE term IN ({nt}))")
    having = ""
    if must:
        mt = ", ".join(f"'{t}'" for t in must)
        having = (f"\n  HAVING count(DISTINCT CASE WHEN term IN ({mt}) "
                  f"THEN term END) = {len(must)}")
    return ("WITH " + base_ctes() + "," + term_score_ctes(pred, "q") + f"""
  SELECT docid, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM ts_q{where}
  GROUP BY docid{having}
  ORDER BY score DESC, docid ASC LIMIT {k}""")


def wand_mix_topk(must: tuple[str, ...] = ("spark",),
                  should: tuple[str, ...] = ("vector",),
                  phrase: tuple[str, str] = ("big", "table"),
                  must_not: tuple[str, ...] = ("join",),
                  k: int = 10) -> str:
    """The compressed-path flagship mix: MUST term conjunction
    (BlockMaxConjunctionScorer.java role) + SHOULD terms + SHOULD exact
    phrase (PhraseScorer under ImpactsDISI) + MUST_NOT exclusion
    (ReqExclScorer.java), score = float32 of the double clause sum —
    identical discipline to bm25_bool_topk/parsed_query_topk."""
    terms = tuple(must) + tuple(should)
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    mt = ", ".join(f"'{t}'" for t in must)
    nt = ", ".join(f"'{t}'" for t in must_not)
    return ("WITH " + base_ctes()
            + "," + term_score_ctes(pred, "q")
            + "," + exact_phrase_ctes(phrase[0], phrase[1], "wp") + f"""
  , uni AS (
    SELECT docid, s FROM ts_q
    UNION ALL SELECT docid, s FROM ts_wp
  ),
  agg AS (
    SELECT docid, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
    FROM uni GROUP BY docid
  )
  SELECT a.docid, a.score FROM agg a
  WHERE {len(must)} = (SELECT count(DISTINCT term) FROM tok t
                       WHERE t.docid = a.docid AND t.term IN ({mt}))
    AND a.docid NOT IN (SELECT DISTINCT docid FROM tok WHERE term IN ({nt}))
  ORDER BY a.score DESC, a.docid ASC LIMIT {k}""")


def synonym_topk(members: tuple[str, ...], k: int = 10,
                 boost: float = 1.0) -> str:
    """SynonymQuery scored as ONE pseudo-term (SynonymQuery.java:
    144-158, freq sum :446-455): per-doc freq = SUM of member tfs,
    df = MAX of member dfs, one BM25 call — weight f32(k1p1*boost)*idf,
    partial w * f32(freq/(freq+cache)), same float discipline as
    term_score_ctes."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in members) + ")"
    bf = float(np.float32(boost))
    w1 = f"CAST(CAST({K1P1!r}::DOUBLE AS REAL) * {bf!r}::DOUBLE AS REAL)"
    idf = (f"CAST(ln(1 + ((SELECT n FROM st) - df + 0.5)"
           f" / (df + 0.5)) AS REAL)")
    return ("WITH " + base_ctes() + f""",
  mdf AS (
    SELECT term, count(*) AS df
    FROM (SELECT DISTINCT docid, term FROM tok WHERE {pred})
    GROUP BY term
  ),
  sdf AS (SELECT max(df) AS df FROM mdf),
  sw AS (SELECT {w1} * {idf} AS w FROM sdf),
  stf AS (
    SELECT docid, count(*) AS tf FROM tok WHERE {pred} GROUP BY docid
  )
  SELECT t.docid,
         CAST((SELECT w FROM sw)
              * CAST(CAST(t.tf AS DOUBLE)
                     / (CAST(t.tf AS DOUBLE) + CAST(c.cache AS DOUBLE))
                AS REAL) AS DOUBLE) AS score
  FROM stf t JOIN dc c ON c.docid = t.docid
  ORDER BY score DESC, t.docid ASC LIMIT {k}""")


def prefix_topk(prefix: str, k: int = 10) -> str:
    """PrefixQuery scoring_boolean rewrite: every matching dictionary
    term scores as a SHOULD TermQuery."""
    pred = f"term LIKE '{prefix}%'"
    return ("WITH " + base_ctes() + "," + term_score_ctes(pred, "q")
            + sum_topk_sql("q", k))


def exact_phrase_ctes(t1: str, t2: str, tag: str) -> str:
    """Exact 2-term phrase: freq = #adjacent alignments; weight from
    the float32 sum of member idfs (BM25Similarity.java:172-181)."""
    return f"""
  pdf_{tag} AS (
    SELECT
      (SELECT count(DISTINCT docid) FROM tok WHERE term = '{t1}') AS df1,
      (SELECT count(DISTINCT docid) FROM tok WHERE term = '{t2}') AS df2
  ),
  pw_{tag} AS (
    SELECT CAST({K1P1!r}::DOUBLE AS REAL)
           * CAST(CAST({_idf32('df1')} AS DOUBLE)
                  + CAST({_idf32('df2')} AS DOUBLE) AS REAL) AS w
    FROM pdf_{tag}
  ),
  pfreq_{tag} AS (
    SELECT a.docid, count(*) AS freq
    FROM (SELECT docid, pos FROM tok WHERE term = '{t1}') a
    JOIN (SELECT docid, pos FROM tok WHERE term = '{t2}') b
      ON b.docid = a.docid AND b.pos = a.pos + 1
    GROUP BY a.docid
  ),
  ts_{tag} AS (
    SELECT f.docid, 'PHRASE_{tag}' AS term,
           (SELECT w FROM pw_{tag})
           * CAST(CAST(f.freq AS DOUBLE)
                  / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE))
             AS REAL) AS s
    FROM pfreq_{tag} f JOIN dc c ON c.docid = f.docid
  )"""


TB_03 = float(np.float32(0.3))  # engine_dismax tie-breaker as float32


def phrase_topk(t1: str, t2: str, k: int = 10) -> str:
    """Exact-phrase leaf top-k (single scoring clause, no sum)."""
    return ("WITH " + base_ctes() + "," + exact_phrase_ctes(t1, t2, "p") + f"""
  SELECT docid, CAST(s AS DOUBLE) AS score FROM ts_p
  ORDER BY s DESC, docid ASC LIMIT {k}""")


def dismax_topk(k: int = 10) -> str:
    """DisjunctionMax(spark, query, "big table") tie=0.3:
    (float)(max + (sum - max) * tb), sum in double
    (DisjunctionMaxScorer.java:58-71 / executor._compile_dismax)."""
    return ("WITH " + base_ctes()
            + "," + term_score_ctes("term = 'spark'", "d1")
            + "," + term_score_ctes("term = 'query'", "d2")
            + "," + exact_phrase_ctes("big", "table", "d3") + f"""
  , uni AS (
    SELECT docid, s FROM ts_d1
    UNION ALL SELECT docid, s FROM ts_d2
    UNION ALL SELECT docid, s FROM ts_d3
  ),
  dm AS (
    SELECT docid, max(s) AS mx, sum(CAST(s AS DOUBLE)) AS sm
    FROM uni GROUP BY docid
  )
  SELECT docid,
         CAST(CAST(CAST(mx AS DOUBLE)
                   + (sm - CAST(mx AS DOUBLE)) * {TB_03!r}::DOUBLE AS REAL)
              AS DOUBLE) AS score
  FROM dm ORDER BY score DESC, docid ASC LIMIT {k}""")


def parsed_query_topk(k: int = 10) -> str:
    """'spark AND quer* OR "big table"~1 -zzzz' through the classic
    parser: MUST spark + MUST ConstantScore(prefix quer, score 1f)
    + SHOULD sloppy phrase slop=1 + MUST_NOT zzzz; score = float32 of
    the double clause sum (executor._compile_boolean)."""
    return ("WITH " + base_ctes()
            + "," + term_score_ctes("term = 'spark'", "m1")
            + "," + sloppy_phrase_ctes("big", "table", 1, "ph") + f"""
  , pquer AS (SELECT DISTINCT docid FROM tok WHERE term LIKE 'quer%'),
  csq AS (SELECT docid, CAST(1.0 AS REAL) AS s FROM pquer),
  uni AS (
    SELECT docid, s FROM ts_m1
    UNION ALL SELECT docid, s FROM csq
    UNION ALL SELECT docid, s FROM ts_ph
  ),
  agg AS (
    SELECT docid, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
    FROM uni GROUP BY docid
  )
  SELECT a.docid, a.score FROM agg a
  WHERE a.docid IN (SELECT docid FROM ts_m1)
    AND a.docid IN (SELECT docid FROM pquer)
    AND a.docid NOT IN (SELECT DISTINCT docid FROM tok WHERE term = 'zzzz')
  ORDER BY a.score DESC, a.docid ASC LIMIT {k}""")


def collapse_sql(terms: tuple[str, ...] = ("spark", "table"),
                 k_groups: int = 5, docs_per_group: int = 2) -> str:
    """collapse_topk over the OR query: best-per-group ranking
    (grouping/FirstPassGroupingCollector.java role)."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return ("WITH " + base_ctes() + "," + term_score_ctes(pred, "q") + f"""
  , scored AS (
    SELECT docid, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
    FROM ts_q GROUP BY docid
  ),
  j AS (
    SELECT s.docid, s.score, c.source AS repo
    FROM scored s JOIN corpus c USING (docid)
  ),
  ranked AS (
    SELECT repo, docid, score,
           row_number() OVER (PARTITION BY repo
                              ORDER BY score DESC, docid ASC) AS rank_in_group
    FROM j
  ),
  topg AS (
    SELECT repo,
           row_number() OVER (ORDER BY score DESC, docid ASC) AS group_rank
    FROM ranked WHERE rank_in_group = 1
  )
  SELECT r.repo, t.group_rank, r.docid, CAST(r.score AS DOUBLE) AS score,
         r.rank_in_group
  FROM ranked r JOIN topg t USING (repo)
  WHERE t.group_rank <= {k_groups} AND r.rank_in_group <= {docs_per_group}""")


def suggest_sql(prefix: str = "qu", n: int = 10) -> str:
    """Dictionary prefix completion weighted by df (suggest module)."""
    return ("WITH " + base_ctes() + f"""
  , d AS (
    SELECT term, count(DISTINCT docid) AS weight
    FROM tok WHERE term LIKE '{prefix}%' GROUP BY term
  )
  SELECT term, weight FROM d ORDER BY weight DESC, term ASC LIMIT {n}""")


def mlt_sql(docid: int = 1, max_terms: int = 15, min_tf: int = 1,
            min_df: int = 2, k: int = 10) -> str:
    """MoreLikeThis: top tf·idf terms of the doc → SHOULD disjunction
    (queries/mlt/MoreLikeThis.java createQueue role)."""
    return ("WITH " + base_ctes() + f"""
  , d1 AS (SELECT term, count(*) AS tf FROM tok WHERE docid = {docid}
           GROUP BY term),
  d1df AS (SELECT t.term, count(DISTINCT t.docid) AS df
           FROM tok t JOIN d1 USING (term) GROUP BY t.term),
  picked AS (
    SELECT d1.term FROM d1 JOIN d1df USING (term)
    WHERE d1.tf >= {min_tf} AND d1df.df >= {min_df}
    ORDER BY d1.tf * ln(1.0 + ((SELECT n FROM st) - d1df.df + 0.5)
                              / (d1df.df + 0.5)) DESC,
             d1.term ASC
    LIMIT {max_terms}
  )""" + "," + term_score_ctes("term IN (SELECT term FROM picked)", "q")
            + sum_topk_sql("q", k))


def sloppy_phrase_ctes(t1: str, t2: str, slop: int, tag: str,
                       off1: int = 0, off2: int = 1) -> str:
    """Two-term sloppy phrase (SloppyPhraseMatcher greedy traversal,
    search/sloppy.py) as a recursive anchor-walk CTE. Emits
    sfreq_<tag>(docid, freq REAL) with freq > 0 — matching docs only —
    and ts_<tag> scored like a phrase leaf."""
    return f"""
  pa_{tag} AS (SELECT docid, pos - {off1} AS p FROM tok WHERE term = '{t1}'),
  pb_{tag} AS (SELECT docid, pos - {off2} AS p FROM tok WHERE term = '{t2}'),
  chain_{tag} AS (
    -- anchor n_k = the `next` position of traversal round k; its list
    -- is the one NOT advanced that round. matchLength d_k =
    -- n_k - max(p <= n_k over the ADVANCED list) (the popped pp walks
    -- forward through every position <= next, shrinking the window).
    -- Next anchor = least position > n_k in the advanced list. On
    -- first-position ties the smaller query offset pops first, so the
    -- anchor belongs to the second slot's list ('B').
    WITH RECURSIVE walk(docid, n, lst, freq) AS (
      SELECT s.docid, s.n, s.lst,
             CASE WHEN s.d <= {slop}
                  THEN CAST(1.0 AS REAL) / CAST(1 + s.d AS REAL)
                  ELSE CAST(0.0 AS REAL) END AS freq
      FROM (
        SELECT b.docid, b.n, b.lst,
               b.n - (SELECT max(p) FROM (
                        SELECT p FROM pa_{tag} x
                        WHERE x.docid = b.docid AND b.lst = 'B'
                        UNION ALL
                        SELECT p FROM pb_{tag} y
                        WHERE y.docid = b.docid AND b.lst = 'A') pr
                      WHERE pr.p <= b.n) AS d
        FROM (
          SELECT a0.docid,
                 CASE WHEN a0.p > b0.p THEN a0.p ELSE b0.p END AS n,
                 CASE WHEN a0.p > b0.p THEN 'A' ELSE 'B' END AS lst
          FROM (SELECT docid, min(p) AS p FROM pa_{tag} GROUP BY docid) a0
          JOIN (SELECT docid, min(p) AS p FROM pb_{tag} GROUP BY docid) b0
            USING (docid)
        ) b
      ) s
      UNION ALL
      SELECT w.docid, nx.n, nx.lst,
             CASE WHEN nx.d <= {slop}
                  THEN w.freq + CAST(1.0 AS REAL) / CAST(1 + nx.d AS REAL)
                  ELSE w.freq END
      FROM walk w
      JOIN LATERAL (
        SELECT u.n, u.lst,
               u.n - (SELECT max(p) FROM (
                        SELECT p FROM pa_{tag} x
                        WHERE x.docid = w.docid AND u.lst = 'B'
                        UNION ALL
                        SELECT p FROM pb_{tag} y
                        WHERE y.docid = w.docid AND u.lst = 'A') pr
                      WHERE pr.p <= u.n) AS d
        FROM (
          SELECT min(p) AS n,
                 CASE w.lst WHEN 'A' THEN 'B' ELSE 'A' END AS lst
          FROM (
            SELECT p FROM pa_{tag} x
            WHERE x.docid = w.docid AND w.lst = 'B'
            UNION ALL
            SELECT p FROM pb_{tag} y
            WHERE y.docid = w.docid AND w.lst = 'A') c
          WHERE c.p > w.n
        ) u
        WHERE u.n IS NOT NULL
      ) nx ON TRUE
    )
    SELECT docid, freq FROM (
      SELECT docid, freq,
             row_number() OVER (PARTITION BY docid ORDER BY n DESC) AS rn
      FROM walk
    ) WHERE rn = 1
  ),
  sfreq_{tag} AS (SELECT docid, freq FROM chain_{tag} WHERE freq > 0),
  spdf_{tag} AS (
    SELECT
      (SELECT count(DISTINCT docid) FROM tok WHERE term = '{t1}') AS df1,
      (SELECT count(DISTINCT docid) FROM tok WHERE term = '{t2}') AS df2
  ),
  spw_{tag} AS (
    SELECT CAST({K1P1!r}::DOUBLE AS REAL)
           * CAST(CAST({_idf32('df1')} AS DOUBLE)
                  + CAST({_idf32('df2')} AS DOUBLE) AS REAL) AS w
    FROM spdf_{tag}
  ),
  ts_{tag} AS (
    SELECT f.docid, 'SLOPPY_{tag}' AS term,
           (SELECT w FROM spw_{tag})
           * CAST(CAST(f.freq AS DOUBLE)
                  / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE))
             AS REAL) AS s
    FROM sfreq_{tag} f JOIN dc c ON c.docid = f.docid
  )"""


def title_field_ctes() -> str:
    """CTEs for a `title` field = the documents `source` column (the
    multi-field driver entry indexes title=source, content=text):
    single lowered token at position 0; per-field dl/norm cache and
    collection stats — per-field collectionStatistics semantics
    (index/FieldInfo.java:31-71)."""
    return f"""
  ttok AS (
    SELECT docid, lower(source) AS term, 0 AS pos FROM corpus
    WHERE source IS NOT NULL AND lower(source) NOT IN ({STOPS_SQL})
  ),
  tdl AS (
    SELECT c.docid, count(t.term) AS dl
    FROM corpus c LEFT JOIN ttok t USING (docid)
    WHERE c.source IS NOT NULL GROUP BY c.docid
  ),
  tst AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sttf FROM tdl),
  tav AS (SELECT CAST(sttf / n AS REAL) AS avgdl FROM tst),
  tdc AS (
    SELECT d.docid,
           CAST({K1!r}::DOUBLE AS REAL)
           * (CAST({OMB!r}::DOUBLE AS REAL)
              + (CAST({B_!r}::DOUBLE AS REAL)
                 * CAST((SELECT max(v) FROM lt WHERE v <= d.dl) AS REAL))
                / (SELECT avgdl FROM tav)) AS cache
    FROM tdl d
  )"""


def edismax_topk(words: tuple[str, ...] = ("spark", "src3"),
                 qf: dict[str, float] | None = None,
                 tie: float = 0.3, k: int = 10) -> str:
    """edismax over (title=source, content=text): per word, a
    DisjunctionMax across fields with per-field boosts (tie-broken sum
    of the others); words combine as SHOULD (sum in double, f32 once)
    — search/components.py::edismax_query semantics."""
    qf = qf or {"content": 1.0, "title": 2.0}
    tb = float(np.float32(tie))
    parts = ["WITH " + base_ctes() + "," + title_field_ctes()]
    dm_ctes = []
    for i, w in enumerate(words):
        uni_branches = []
        for f in sorted(qf):
            tag = f"w{i}{f[0]}"
            tok, dc, st = (("ttok", "tdc", "tst") if f == "title"
                           else ("tok", "dc", "st"))
            parts.append("," + term_score_ctes(
                f"term = '{w}'", tag, tok=tok, dc=dc, st=st, boost=qf[f]))
            uni_branches.append(f"SELECT docid, s FROM ts_{tag}")
        uni = " UNION ALL ".join(uni_branches)
        dm_ctes.append(f"""
  dm_{i} AS (
    SELECT docid,
           CAST(CAST(max(s) AS DOUBLE)
                + (sum(CAST(s AS DOUBLE)) - CAST(max(s) AS DOUBLE))
                  * {tb!r}::DOUBLE AS REAL) AS s
    FROM ({uni}) GROUP BY docid
  )""")
    parts.append("," + ",".join(dm_ctes))
    all_dm = " UNION ALL ".join(
        f"SELECT docid, s FROM dm_{i}" for i in range(len(words)))
    parts.append(f"""
  SELECT docid, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM ({all_dm}) GROUP BY docid
  ORDER BY score DESC, docid ASC LIMIT {k}""")
    return "".join(parts)


def qparser_mix_topk(t1: str = "spark", t2: str = "vector",
                     tie: float = 0.3, l: int = 20, u: int = 60,
                     workers: int = 3, worker: int = 1,
                     k: int = 10) -> str:
    """{!bool must='{!maxscore tie}t1 t2'
              filter='{!frange l u}dl'
              filter='{!hash workers worker keys=commit}'}:

    * maxscore → DisjunctionMax(t1, t2) with tie (MaxScoreQParser.java
      :58-90), f32 per executor._compile_dismax;
    * frange → dl BETWEEN l AND u (ValueSourceRangeFilter, inclusive
      defaults);
    * hash → Java String.hashCode of the commit string (BytesHash →
      CharsRef.hashCode, HashQParserPlugin.java:292-305) with
      ``(h & 0x7FFFFFFF) % workers == worker`` (:212). The int32 wrap
      runs in BIGINT mod 2^32 (list_reduce over char codes); masking
      0x7FFFFFFF == mod 2^31 of the unsigned value, so no signed
      round-trip is needed for a single key.

    FILTER clauses gate but contribute 0 score; the MUST dismax is the
    whole score (executor._compile_boolean)."""
    tb = float(np.float32(tie))
    return ("WITH " + base_ctes()
            + "," + term_score_ctes(f"term = '{t1}'", "q1")
            + "," + term_score_ctes(f"term = '{t2}'", "q2") + f"""
  , cmt AS (
    SELECT row_number() OVER (
             ORDER BY source, printf('doc/%09d', doc_id),
                      CAST(doc_id AS VARCHAR)) - 1 AS docid,
           CAST(doc_id AS VARCHAR) AS commit
    FROM documents
  ),
  hsh AS (
    SELECT docid FROM cmt
    WHERE (list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_apply(string_split_regex(commit, ''),
                          x -> CAST(ascii(x) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 4294967296)
           % 2147483648) % {workers} = {worker}
  ),
  rng AS (SELECT docid FROM dl WHERE dl BETWEEN {l} AND {u}),
  uni AS (
    SELECT docid, s FROM ts_q1
    UNION ALL SELECT docid, s FROM ts_q2
  ),
  dm AS (
    SELECT docid,
           CAST(CAST(max(s) AS DOUBLE)
                + (sum(CAST(s AS DOUBLE)) - CAST(max(s) AS DOUBLE))
                  * {tb!r}::DOUBLE AS REAL) AS s
    FROM uni GROUP BY docid
  )
  SELECT docid, CAST(s AS DOUBLE) AS score
  FROM dm
  WHERE docid IN (SELECT docid FROM rng)
    AND docid IN (SELECT docid FROM hsh)
  ORDER BY score DESC, docid ASC LIMIT {k}""")
