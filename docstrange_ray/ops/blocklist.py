"""Multi-pattern blocklist tagging (Aho-Corasick 1975).

The RefinedWeb / FineWeb curation step: tag every document with how
many blocklist terms it contains (URL/word banned lists, UT1-style)
so a downstream filter can drop or down-weight. One automaton walk
finds ALL occurrences of ALL patterns — including overlapping ones
and patterns nested inside other patterns ("he" inside "she") — in
O(len(text) + matches), independent of pattern count.

Scale shape: the automaton is built ONCE per actor in ``__init__``
(the stateful-stage pattern: goto/fail/output construction is
per-worker setup, never per batch) and the scan is shuffle-free —
one streaming pass over the corpus, no exchange at any size. The
per-character walk is the irreducible kernel of multi-pattern
matching (no vectorized equivalent exists for overlapping
multi-pattern counts); the actor pool is the parallelism.

Determinism/oracle: counts use OCCURRENCE semantics — every start
position where a pattern matches counts, overlapping included
("aa" occurs twice in "aaa") — which the SQL oracle reproduces with
a position scan (``substr(lower(text), i, len(p)) = p``), unlike
``replace()``-based counting which is non-overlapping. Matching is
case-insensitive (text and patterns lowercased), codepoint-based on
both sides (DuckDB ``substr``/``len`` are character-based).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa


class AhoCorasick:
    """Classic goto/fail/output automaton over unicode codepoints."""

    def __init__(self, patterns: list[str]):
        if not patterns:
            raise ValueError("empty pattern list")
        if any(not p for p in patterns):
            raise ValueError("empty pattern")
        self.patterns = [p.lower() for p in patterns]
        # trie: list of dicts (char -> state); output: pattern ids ending here
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for pid, pat in enumerate(self.patterns):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].append(pid)
        # BFS fail links; merge output sets along fail chains so a
        # single state lookup yields every pattern ending at this
        # position (the "hers" state also reports "he"... no — "hers"
        # reports "s"-suffix patterns; nested-suffix patterns like
        # "she" -> "he" are the case this merge exists for)
        fail = [0] * len(goto)
        q = deque()
        for ch, s in goto[0].items():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in goto[s].items():
                q.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                out[t] = out[t] + out[fail[t]]
        self._goto = goto
        self._fail = fail
        self._out = out

    def count(self, text: str) -> np.ndarray:
        """Occurrence count per pattern (overlaps included)."""
        counts = np.zeros(len(self.patterns), dtype=np.int64)
        goto, fail, out = self._goto, self._fail, self._out
        s = 0
        for ch in text.lower():
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for pid in out[s]:
                counts[pid] += 1
        return counts


class BlocklistTagger:
    """Actor-pool stage: (doc_id, text) -> (doc_id, n_matches,
    n_distinct) under a fixed blocklist. Automaton built once per
    actor; scan per batch."""

    def __init__(self, patterns: list[str]):
        self.ac = AhoCorasick(patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        n_matches = np.empty(len(texts), dtype=np.int64)
        n_distinct = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            c = self.ac.count(t or "")
            n_matches[i] = c.sum()
            n_distinct[i] = int((c > 0).sum())
        return pa.Table.from_arrays(
            [ids,
             pa.array(n_matches, type=pa.int64()),
             pa.array(n_distinct, type=pa.int64())],
            names=["doc_id", "n_matches", "n_distinct"],
        )


def blocklist_tags(ds, patterns: list[str], concurrency=(1, 8),
                   batch_size: int = 2048):
    """Tag the corpus against ``patterns``: shuffle-free actor-pool
    scan, automaton built once per actor. The pattern list rides
    inside the cloudpickled class (``stages.bind_actor``, the repo's
    ray#53727 discipline) rather than as object-store ctor args."""
    from docstrange_ray.stages import bind_actor

    return ds.map_batches(
        bind_actor(BlocklistTagger, patterns=list(patterns)),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size,
    )
