"""Grounding dictionary build — PyOBO's grounder construction re-expressed
for batch: the reference feeds literal mappings (labels + synonyms) into
a Gilda-style lexical index (struct.py:2062-2100 `get_grounder`,
ner/api.py:30-58). Here the index is built once on the driver from the
(small) literal_mappings table and BROADCAST to executors — a map-side
join: the dictionary is ≪ the corpus, so the corpus never shuffles.

Text normalization mirrors Gilda's defaults: casefold + whitespace
collapse + dash folding (the reference delegates to ssslm/Gilda; we
implement the same folding so matches agree on the fixture corpus).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

_WS = re.compile(r"\s+")
_DASH = re.compile(r"[‐-―−-]")

# Greek letter folding as in Gilda's normalization (public algorithm).
_GREEK = {
    "α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta", "ε": "epsilon",
    "κ": "kappa", "λ": "lambda", "μ": "mu", "σ": "sigma", "τ": "tau",
    "ω": "omega",
}


def fold_text(s: str) -> str:
    """Gilda-style folding: NFKC, casefold, greek→name, dashes→space,
    whitespace collapse."""
    s = unicodedata.normalize("NFKC", s).casefold()
    for g, name in _GREEK.items():
        s = s.replace(g, name)
    s = _DASH.sub(" ", s)
    return _WS.sub(" ", s).strip()


# Predicate → match priority: exact labels outrank exact synonyms outrank
# related synonyms (Gilda scoring hierarchy; reference's get_best_match
# returns the top-scored candidate, ner/normalizer.py:55).
PREDICATE_SCORE = {
    "rdfs:label": 1.0,
    "oboInOwl:hasExactSynonym": 0.9,
    "oboInOwl:hasNarrowSynonym": 0.7,
    "oboInOwl:hasBroadSynonym": 0.7,
    "oboInOwl:hasRelatedSynonym": 0.5,
}


@dataclass
class AhoCorasick:
    """Token-level Aho-Corasick automaton over folded token sequences.

    Pure-python, picklable (broadcastable). States are dicts; patterns are
    token tuples so multi-word synonyms match across token boundaries
    without substring false-positives. Built once per dictionary, reused
    across all Arrow batches on each executor.
    """

    goto: list[dict[str, int]] = field(default_factory=lambda: [{}])
    fail: list[int] = field(default_factory=lambda: [0])
    # output[state] = list of (n_tokens, curie, score)
    output: list[list[tuple[int, str, float]]] = field(default_factory=lambda: [[]])
    _built: bool = False

    def add(self, tokens: tuple[str, ...], curie: str, score: float) -> None:
        state = 0
        for tok in tokens:
            nxt = self.goto[state].get(tok)
            if nxt is None:
                nxt = len(self.goto)
                self.goto[state][tok] = nxt
                self.goto.append({})
                self.fail.append(0)
                self.output.append([])
            state = nxt
        self.output[state].append((len(tokens), curie, score))

    def build(self) -> None:
        from collections import deque

        queue: deque[int] = deque()
        for s in self.goto[0].values():
            self.fail[s] = 0
            queue.append(s)
        while queue:
            r = queue.popleft()
            for tok, s in self.goto[r].items():
                queue.append(s)
                f = self.fail[r]
                while f and tok not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(tok, 0) if self.goto[f].get(tok, 0) != s else 0
                self.output[s] = self.output[s] + self.output[self.fail[s]]
        self._built = True

    def search(self, tokens: list[str]):
        """Yield (start, end_exclusive, curie, score) over a token list."""
        state = 0
        for i, tok in enumerate(tokens):
            while state and tok not in self.goto[state]:
                state = self.fail[state]
            state = self.goto[state].get(tok, 0)
            for n, curie, score in self.output[state]:
                yield (i - n + 1, i + 1, curie, score)


def build_automaton(entries: list[tuple[str, str, str]]) -> AhoCorasick:
    """entries: (text, curie, predicate). Folds text, scores by predicate."""
    ac = AhoCorasick()
    for text, curie, predicate in entries:
        folded = fold_text(text)
        if not folded:
            continue
        score = PREDICATE_SCORE.get(predicate, 0.5)
        ac.add(tuple(folded.split(" ")), curie, score)
    ac.build()
    return ac


@dataclass
class HybridMatcher:
    """Hot-path matcher: single-token patterns resolved by one dict lookup
    per token (the overwhelmingly common case for label dictionaries);
    multi-token patterns fall back to the Aho-Corasick automaton. Both
    paths yield identical (start, end, curie, score) tuples, so semantics
    match build_automaton exactly — this is purely a constant-factor
    optimization of the Python hot loop inside the Arrow UDF."""

    single: dict[str, list[tuple[str, float]]] = field(default_factory=dict)
    multi: AhoCorasick | None = None

    def search(self, tokens: list[str]):
        single = self.single
        for i, tok in enumerate(tokens):
            hits = single.get(tok)
            if hits:
                for curie, score in hits:
                    yield (i, i + 1, curie, score)
        if self.multi is not None:
            yield from self.multi.search(tokens)


def build_matcher(entries: list[tuple[str, str, str]]) -> HybridMatcher:
    """entries: (text, curie, predicate) → HybridMatcher."""
    m = HybridMatcher()
    multi_entries = []
    for text, curie, predicate in entries:
        folded = fold_text(text)
        if not folded:
            continue
        score = PREDICATE_SCORE.get(predicate, 0.5)
        toks = folded.split(" ")
        if len(toks) == 1:
            m.single.setdefault(toks[0], []).append((curie, score))
        else:
            multi_entries.append((toks, curie, score))
    if multi_entries:
        ac = AhoCorasick()
        for toks, curie, score in multi_entries:
            ac.add(tuple(toks), curie, score)
        ac.build()
        m.multi = ac
    return m


class _ClosureBox:
    """Broadcast-compatible wrapper (.value) for environments without a
    SparkContext (Spark Connect): the object rides in the UDF closure
    instead — same executor-side API, pickled per task batch instead of
    torrent-broadcast once. Correctness identical; use real broadcast
    when available."""

    def __init__(self, value):
        self.value = value


def broadcast_matcher(spark, matcher_obj):
    """Broadcast the matcher if the session has a SparkContext; fall back
    to closure capture under Spark Connect."""
    try:
        return spark.sparkContext.broadcast(matcher_obj)
    except Exception:  # noqa: BLE001 — Connect: no sparkContext
        return _ClosureBox(matcher_obj)


def dictionary_entries(
    literal_mappings_df, skip_obsolete_df=None
) -> list[tuple[str, str, str]]:
    """Collect the literal_mappings table into automaton entries.

    skip_obsolete_df: optional (prefix, identifier) frame — anti-joined
    out first (api/names.py:332-341 skip_obsolete).

    NOTE: this is the ONLY collect in the grounding pipeline, and it is
    over the dictionary (≈10^6 rows for all of OBO — fits on the driver),
    never over the corpus.
    """
    df = literal_mappings_df
    if skip_obsolete_df is not None:
        df = df.join(
            skip_obsolete_df.select("prefix", "identifier"),
            on=["prefix", "identifier"],
            how="left_anti",
        )
    rows = df.select("text", "prefix", "identifier", "predicate").collect()
    return [
        (r["text"], f"{r['prefix']}:{r['identifier']}", r["predicate"]) for r in rows
    ]
