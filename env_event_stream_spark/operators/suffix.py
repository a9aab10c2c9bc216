"""Suffix-automaton longest-common-substring (the byte-exact
longest-match rung above the token-seeded doc_exactsubstr_spans).

Two DELIBERATELY independent implementations of one contract (the
_mmr_select / _cep_timed_scan discipline):

- ``suffix_automaton_lcs`` — the ENGINE side: Blumer et al. (1985)
  online suffix-automaton construction over string ``a`` (O(|a|)
  states/transitions), then a single matching walk over ``b``
  tracking the longest match ending at each position (O(|b|)).
  Linear time, the asymptotics that survive long documents.
- ``lcs_bisect`` — the ORACLE side: binary search on the answer
  length L (common-substring existence is monotone in L) with a
  substring-SET membership probe per step — O((|a|+|b|) * L log L)
  of C-speed slicing, no automaton code shared.

Contract (pinned by a hypothesis fuzz in tests/test_suffix_lcs.py):
returns (lcs_len, start_a, start_b) where start_b is the SMALLEST
0-based start in ``b`` of any longest common substring and start_a is
``a.find(...)`` of that exact substring (smallest start in ``a``);
(0, -1, -1) when the strings share no character.

Reference analog: none (the reference's src/*.ts is a pub/sub broker
with no text analytics); this extends SURVEY §2.11's dedup family
with the Lee et al. (arXiv:2107.06499) byte-exact semantics.
"""

from __future__ import annotations


def build_suffix_automaton(a: str) -> tuple[list, list, list]:
    """Suffix-automaton states of ``a`` — (sa_len, sa_link, trans).

    Split out of suffix_automaton_lcs (r16, guide §4.5 "heavyweight
    init once"): the build is the expensive half (state allocation +
    clone copying), and a candidate-pair table hash-partitioned on
    id_a solves ~6 pairs per distinct ``a`` — building once per
    group instead of once per pair removes ~5/6 of the construction
    work with a bit-identical op stream (pure memoization)."""
    sa_len = [0]
    sa_link = [-1]
    trans: list[dict] = [{}]
    last = 0
    for ch in a:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = trans[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    return (sa_len, sa_link, trans)


def automaton_lcs_walk(
    auto: tuple[list, list, list], a: str, b: str
) -> tuple[int, int, int]:
    """Walk ``b`` through a prebuilt automaton of ``a`` (same walk,
    same tie-breaks as suffix_automaton_lcs — which is now exactly
    build + this walk)."""
    sa_len, sa_link, trans = auto
    v = 0
    length = 0
    best = 0
    best_end = -1
    for j, ch in enumerate(b):
        while v and ch not in trans[v]:
            v = sa_link[v]
            length = sa_len[v]
        if ch in trans[v]:
            v = trans[v][ch]
            length += 1
        else:
            v = 0
            length = 0
        if length > best:  # first time the max is reached -> the
            best = length  # smallest start (starts increase with j)
            best_end = j
    if best == 0:
        return (0, -1, -1)
    start_b = best_end - best + 1
    return (best, a.find(b[start_b : start_b + best]), start_b)


def suffix_automaton_lcs(a: str, b: str) -> tuple[int, int, int]:
    """Longest common substring via the suffix automaton of ``a``."""
    return automaton_lcs_walk(build_suffix_automaton(a), a, b)


def lcs_bisect(a: str, b: str) -> tuple[int, int, int]:
    """Same contract, independent algorithm: binary search on the
    length + substring-set probe (smallest start_b by construction:
    the probe scans b left to right)."""

    def probe(length: int) -> int | None:
        if length > min(len(a), len(b)):
            return None
        sub = {a[i : i + length] for i in range(len(a) - length + 1)}
        for j in range(len(b) - length + 1):
            if b[j : j + length] in sub:
                return j
        return None

    lo, hi = 0, min(len(a), len(b))
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if probe(mid) is not None:
            lo = mid
        else:
            hi = mid - 1
    if lo == 0:
        return (0, -1, -1)
    j = probe(lo)
    assert j is not None
    return (lo, a.find(b[j : j + lo]), j)
