"""Dictionary-driven CJK segmentation — the kuromoji / smartcn role.

The reference ships morphological analyzers for Japanese (kuromoji —
lucene/analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/
JapaneseTokenizer.java, a Viterbi lattice over the MeCab-IPADIC
lexicon), Korean (nori) and Chinese (smartcn —
lucene/analysis/smartcn/.../HMMChineseTokenizer.java, an HMM over a
bigram dictionary). Those lexicons are tens of MB of licensed
dictionary data this repo cannot embed; the repo's CJKAnalyzer bigram
chain (analysis/cjk.py) is the reference's own no-dictionary fallback.

This module provides the minimal viable dictionary segmenter the
round-3 VERDICT asked for: forward-maximum-matching (greedy
longest-match) over an EMBEDDED common-word lexicon, with
script-aware handling —

  * CJK script runs segment by longest dictionary match; unmatched
    ideographs fall back to single-character tokens (the smartcn
    single-char unknown-word behavior);
  * for Japanese, an unmatched KATAKANA run stays one token (kuromoji
    groups katakana unknown words by character class —
    JapaneseTokenizer's unknown-word handling via
    UnknownDictionary/CharacterDefinition);
  * non-CJK runs tokenize with the standard word grammar, so mixed
    latin/CJK text behaves like kuromoji's passthrough.

FMM is the classic baseline segmentation algorithm (it is what
smartcn's predecessors shipped); its known failure mode — crossing a
word boundary when a longer dictionary word shadows the true split —
is documented in the tests. The lexicons below are small curated sets
of common vocabulary (public common knowledge, not copied dictionary
data); real deployments drop in a full wordlist via the ``lexicon``
parameter — the algorithm does not change.

Usage: ``CustomAnalyzer(tokenizer=JapaneseTokenizer())`` — the §2.12
pluggable-analyzer seam, which runs on the distributed build path
(build_index(analyzer=...)).
"""

from __future__ import annotations

import re
import unicodedata

from .tokenizer import MAX_TOKEN_LENGTH, standard_tokenize

_CJK_RE = re.compile(
    "["
    "぀-ゟ"   # hiragana
    "゠-ヿ"   # katakana
    "一-鿿"   # CJK unified ideographs
    "㐀-䶿"   # ext A
    "가-힯"   # hangul syllables
    "]+")


def _is_katakana(ch: str) -> bool:
    return "゠" <= ch <= "ヿ"


#: small embedded Japanese lexicon: particles, copulas, common
#: nouns/verbs — enough for the golden sentences and to demonstrate
#: the algorithm; swap in a full IPADIC-style wordlist in production.
JA_LEXICON = frozenset("""
の は が を に で と も へ や から まで より です ます でした ました
する した して います いました ある いる ない なかった
これ それ あれ どれ ここ そこ どこ 私 僕 君 彼 彼女
日本 日本語 東京 大学 学校 学生 先生 会社 電車 駅 時間 今日 明日 昨日
言語 勉強 研究 科学 技術 情報 検索 索引 形態素 解析 辞書 単語 文章
食べる 食べた 飲む 行く 来る 見る 読む 書く 話す 聞く 作る 使う
すもも もも うち 猫 犬 鳥 魚 水 本 人 年 月 日 円 国 語
""".split())

#: small embedded Chinese lexicon (simplified), same caveat.
ZH_LEXICON = frozenset("""
我 你 他 她 我们 你们 他们 的 了 是 在 有 和 不 人 大 小
中国 北京 上海 大学 学生 老师 学校 公司 汉语 中文 英语
学习 研究 生命 起源 科学 技术 信息 检索 索引 分词 词典 单词 文章
喜欢 工作 生活 时间 今天 明天 昨天 年 月 日 国 家 朋友
搜索 引擎 数据 系统 计算 机器 语言 处理 自然
""".split())

#: small embedded Korean lexicon (nori role) — hangul FMM.
KO_LEXICON = frozenset("""
한국 서울 대학 학생 선생 학교 회사 한국어 언어 공부 연구
과학 기술 정보 검색 색인 형태소 분석 사전 단어 문장
나 너 우리 그 그녀 은 는 이 가 을 를 에 에서 와 과 도 의
""".split())


class DictSegmenter:
    """Forward-maximum-matching segmenter over a lexicon, pluggable
    as a ``CustomAnalyzer`` tokenizer: ``(text, max_token_length) ->
    list[str]``."""

    __name__ = "DictSegmenter"

    def __init__(self, lexicon, katakana_runs: bool = False,
                 max_word_len: int | None = None):
        self.lexicon = frozenset(lexicon)
        self.katakana_runs = katakana_runs
        self.max_word_len = max_word_len or (
            max((len(w) for w in self.lexicon), default=1))

    def _segment_run(self, run: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(run)
        while i < n:
            match = None
            for ln in range(min(self.max_word_len, n - i), 0, -1):
                cand = run[i:i + ln]
                if cand in self.lexicon:
                    match = cand
                    break
            if match is not None:
                out.append(match)
                i += len(match)
                continue
            if self.katakana_runs and _is_katakana(run[i]):
                j = i + 1
                while j < n and _is_katakana(run[j]) and \
                        run[i:j + 1] not in self.lexicon:
                    j += 1
                out.append(run[i:j])
                i = j
                continue
            out.append(run[i])  # unknown: single character
            i += 1
        return out

    def __call__(self, text: str,
                 max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
        text = unicodedata.normalize("NFKC", text or "")
        out: list[str] = []
        last = 0
        for m in _CJK_RE.finditer(text):
            if m.start() > last:
                out.extend(standard_tokenize(
                    text[last:m.start()], max_token_length))
            out.extend(self._segment_run(m.group()))
            last = m.end()
        if last < len(text):
            out.extend(standard_tokenize(text[last:], max_token_length))
        return out


def _is_hiragana(ch: str) -> bool:
    return "぀" <= ch <= "ゟ"


def default_costs(lexicon) -> dict[str, float]:
    """Unigram cost model from word-class heuristics (public common
    knowledge, no licensed frequency tables): single-character kana /
    hangul lexicon entries are function words (particles, copulas —
    the highest-frequency class, so the cheapest edges), everything
    else costs a base plus a per-character increment, which makes a
    compound slightly cheaper than its parts (日本語 beats 日本+語)
    while two frequent particles still beat one mid-frequency noun
    (も+も beats もも — the すもも lattice)."""
    costs: dict[str, float] = {}
    for w in lexicon:
        if len(w) == 1 and (_is_hiragana(w) or _is_katakana(w)
                            or "가" <= w <= "힯"):
            costs[w] = 1.5
        else:
            costs[w] = 2.0 + 0.7 * len(w)
    return costs


class ViterbiSegmenter:
    """Unigram-cost Viterbi lattice segmenter — the shape of
    kuromoji's lattice (ja/JapaneseTokenizer.java builds a Viterbi
    lattice over dictionary + unknown-word edges and backtracks the
    cheapest path; MeCab-IPADIC supplies its costs) with a heuristic
    unigram cost model instead of licensed dictionary costs.

    Fixes FMM's boundary-crossing failure: maximum matching commits to
    the longest word at each position (研究生|命|起源 when 研究生
    shadows 研究|生命|起源); the lattice instead scores every
    tokenization globally, so a shadowing long word loses to two
    in-lexicon words plus no unknown residue. Pluggable as a
    ``CustomAnalyzer`` tokenizer like :class:`DictSegmenter` (the FMM
    fallback, kept for lexicons without cost tiers)."""

    __name__ = "ViterbiSegmenter"

    #: cost of an unknown single character (smartcn single-char
    #: unknown-word behavior) — far above any lexicon word
    UNKNOWN_COST = 10.0
    #: cost of one whole unknown KATAKANA run (kuromoji groups
    #: katakana unknown words by character class)
    KATAKANA_RUN_COST = 5.0
    #: connection penalty for a function word directly following
    #: another function word — the one bigram fact the MeCab
    #: connection matrix encodes that a unigram model cannot live
    #: without: particles do not chain (すもも|も|もも|も|もも beats
    #: すもも|も|も|も|も|も|も)
    PARTICLE_CHAIN_PENALTY = 2.0

    def __init__(self, costs: dict[str, float],
                 katakana_runs: bool = False):
        self.costs = dict(costs)
        self.katakana_runs = katakana_runs
        self.max_word_len = max((len(w) for w in self.costs), default=1)
        self._particles = {w for w, c in self.costs.items()
                           if len(w) == 1 and c <= 1.6}

    def _segment_run(self, run: str) -> list[str]:
        n = len(run)
        inf = float("inf")
        # two lattice states per position: last edge was a function
        # word (1) or not (0) — the minimal connection-cost context
        best = [[inf, inf] for _ in range(n + 1)]
        best[0][0] = 0.0
        back: list[list[tuple[int, int]]] = [[(0, 0), (0, 0)]
                                             for _ in range(n + 1)]
        pen = self.PARTICLE_CHAIN_PENALTY

        def relax(i, s, j, cost, is_particle):
            cc = best[i][s] + cost + (pen if is_particle and s else 0.0)
            ns = 1 if is_particle else 0
            if cc < best[j][ns]:
                best[j][ns] = cc
                back[j][ns] = (i, s)

        for i in range(n):
            for s in (0, 1):
                if best[i][s] == inf:
                    continue
                for ln in range(1, min(self.max_word_len, n - i) + 1):
                    w = run[i:i + ln]
                    c = self.costs.get(w)
                    if c is not None:
                        relax(i, s, i + ln, c, w in self._particles)
                relax(i, s, i + 1, self.UNKNOWN_COST, False)
                if self.katakana_runs and _is_katakana(run[i]):
                    j = i + 1
                    while j < n and _is_katakana(run[j]):
                        j += 1
                    if j > i + 1:
                        relax(i, s, j, self.KATAKANA_RUN_COST, False)
        cuts = []
        i, s = n, (0 if best[n][0] <= best[n][1] else 1)
        while i > 0:
            cuts.append(i)
            i, s = back[i][s]
        cuts.append(0)
        cuts.reverse()
        return [run[a:b] for a, b in zip(cuts, cuts[1:])]

    def __call__(self, text: str,
                 max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
        text = unicodedata.normalize("NFKC", text or "")
        out: list[str] = []
        last = 0
        for m in _CJK_RE.finditer(text):
            if m.start() > last:
                out.extend(standard_tokenize(
                    text[last:m.start()], max_token_length))
            out.extend(self._segment_run(m.group()))
            last = m.end()
        if last < len(text):
            out.extend(standard_tokenize(text[last:], max_token_length))
        return out


def JapaneseTokenizer(lexicon=JA_LEXICON, costs=None,
                      viterbi: bool = True):
    """kuromoji-role segmenter (ja/JapaneseTokenizer.java stand-in):
    unigram-cost Viterbi lattice by default (FMM via
    ``viterbi=False``), whole-run katakana unknown words."""
    if not viterbi:
        return DictSegmenter(lexicon, katakana_runs=True)
    return ViterbiSegmenter(costs or default_costs(lexicon),
                            katakana_runs=True)


def SmartChineseTokenizer(lexicon=ZH_LEXICON, costs=None,
                          viterbi: bool = True):
    """smartcn-role segmenter (cn/smart/HMMChineseTokenizer.java
    stand-in): Viterbi lattice by default, single-char unknowns."""
    if not viterbi:
        return DictSegmenter(lexicon)
    return ViterbiSegmenter(costs or default_costs(lexicon))


def KoreanTokenizer(lexicon=KO_LEXICON, costs=None,
                    viterbi: bool = True):
    """nori-role segmenter (ko/KoreanTokenizer.java stand-in)."""
    if not viterbi:
        return DictSegmenter(lexicon)
    return ViterbiSegmenter(costs or default_costs(lexicon))
