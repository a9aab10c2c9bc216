"""Structural gate over bounded fixpoint loops (VERDICT r13 task 3).

The hazard class: a ``for _ in range(k)`` loop that ``break``s on
convergence but, when k iterations are NOT enough, falls through to
the readout with partially-propagated state — wrong answers with no
signal. ``connected_components`` raises at the cap
(operators/graph.py) and the r13 vectorized ER sweep does too
(analytics_queries.er_threshold_sensitivity, for/else raise); this
test makes the rule STRUCTURAL so no future convergence loop can ship
without choosing a documented side of the line:

- **fixpoint loops** (the result is only correct at convergence —
  label propagation, connected components, k-core peeling) MUST raise
  when the cap exits with work remaining (a for/else raise, or a
  post-loop raise when the loop returns on convergence);
- **anytime loops** (every iteration count yields a VALID model —
  Lloyd's k-means, gradient trainers; the break is purely a cost
  optimization and the oracle replays the same trainer) are
  allowlisted here BY NAME with that reason.

The AST walk flags every range-for containing a top-level ``break``
in non-test package source; each must carry an ``else`` whose body
raises, or appear in ANYTIME_CONVERGENCE_BREAKS. A SECOND walk covers
the other guarded shape the first cannot see (r14 review catch):
loops that ``return`` on convergence — the statements AFTER such a
loop are only reachable via cap-exhaustion, so one of them must be a
``raise`` (connected_components / k_core), or the site must be
allowlisted as a search loop whose exhaustion is a valid not-found
outcome. A new unlisted site fails this test with instructions,
exactly like plan_lint's allowlists.
"""

from __future__ import annotations

import ast
import os

import pytest

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "env_event_stream_spark",
)

# (module-relative path, enclosing function) -> why an early break is
# safe without a raise. Only ANYTIME algorithms belong here: breaking
# early (or not at all) must yield a valid result either way.
ANYTIME_CONVERGENCE_BREAKS = {
    # Lloyd's k-means on a bounded driver-side sample: centroids after
    # ANY number of iterations are a valid codebook; the break just
    # skips no-op iterations. Since r15 the oracle side retrains with
    # the INDEPENDENT pure-Python twins in operators/kmeans_oracle —
    # both trainer pairs share the rounded-fixpoint stop rule, so they
    # break at the same iteration (bit-for-bit parity pinned by
    # tests/test_kmeans_oracle_independence.py).
    ("operators/similarity.py", "train_ivf_centroids"),
    ("operators/similarity.py", "_pq_kmeans"),
    ("operators/kmeans_oracle.py", "spherical_kmeans_py"),
    ("operators/kmeans_oracle.py", "pq_kmeans_py"),
    # BPE merge learning: k is a TARGET vocab size, not a convergence
    # cap — the break fires only when the corpus has no adjacent pairs
    # left to merge, and "all learnable merges" is the correct output
    # (standard BPE semantics; both trainers share the break so the
    # Spark path and its pure-Python oracle stop at the same rank).
    ("operators/bpe.py", "learn_merges"),
    ("operators/bpe.py", "learn_merges_py"),
}

# (module-relative path, enclosing function) -> why a range-for that
# RETURNS mid-loop needs no post-loop raise: exhausting the range is
# a legitimate outcome, not a missed fixpoint.
SEARCH_LOOP_RETURNS = {
    # substring-set probe: scans b left-to-right, returns the first
    # hit; falling through means "this length has no common
    # substring", and the caller's contract is an explicit None.
    ("operators/suffix.py", "probe"),
}


def _range_for_nodes(tree: ast.AST):
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.For)
            and isinstance(node.iter, ast.Call)
            and isinstance(node.iter.func, ast.Name)
            and node.iter.func.id == "range"
        ):
            yield node


def _has_toplevel_break(loop: ast.For) -> bool:
    """Break directly in this loop's body (not in a nested loop)."""

    class Finder(ast.NodeVisitor):
        found = False

        def visit_Break(self, node):  # noqa: N802
            self.found = True

        # a break inside a nested loop binds to THAT loop
        def visit_For(self, node):  # noqa: N802
            pass

        def visit_While(self, node):  # noqa: N802
            pass

        def visit_FunctionDef(self, node):  # noqa: N802
            pass

    f = Finder()
    for stmt in loop.body:
        f.visit(stmt)
    return f.found


def _orelse_raises(loop: ast.For) -> bool:
    return any(isinstance(s, ast.Raise) for s in loop.orelse)


def _has_toplevel_return(loop: ast.For) -> bool:
    """Return directly in this loop's body (not in a nested loop or
    nested function)."""

    class Finder(ast.NodeVisitor):
        found = False

        def visit_Return(self, node):  # noqa: N802
            self.found = True

        def visit_For(self, node):  # noqa: N802
            pass

        def visit_While(self, node):  # noqa: N802
            pass

        def visit_FunctionDef(self, node):  # noqa: N802
            pass

    f = Finder()
    for stmt in loop.body:
        f.visit(stmt)
    return f.found


def _raise_follows(tree: ast.AST, loop: ast.For) -> bool:
    """True if a top-level ``raise`` statement follows the loop in
    its enclosing statement list (the only path reachable when a
    return-on-convergence loop exhausts its cap)."""
    for node in ast.walk(tree):
        for field in ("body", "orelse", "finalbody"):
            stmts = getattr(node, field, None)
            if isinstance(stmts, list) and loop in stmts:
                after = stmts[stmts.index(loop) + 1 :]
                return any(isinstance(s, ast.Raise) for s in after)
    return False


def _enclosing_function(tree: ast.AST, loop: ast.For) -> str:
    """Name of the INNERMOST function whose span contains the loop."""
    best, best_span = "<module>", float("inf")
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            end = max(getattr(node, "end_lineno", node.lineno), node.lineno)
            if node.lineno <= loop.lineno <= end:
                span = end - node.lineno
                if span < best_span:
                    best, best_span = node.name, span
    return best


def _package_sources():
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in files:
            if fn.endswith(".py"):
                path = os.path.join(root, fn)
                yield os.path.relpath(path, PKG).replace(os.sep, "/"), path


def test_every_convergence_break_is_guarded_or_anytime():
    violations = []
    seen_allowed = set()
    for rel, path in _package_sources():
        with open(path, encoding="utf-8") as fh:
            tree = ast.parse(fh.read(), filename=path)
        for loop in _range_for_nodes(tree):
            if not _has_toplevel_break(loop):
                continue
            fn = _enclosing_function(tree, loop)
            if _orelse_raises(loop):
                continue
            if (rel, fn) in ANYTIME_CONVERGENCE_BREAKS:
                seen_allowed.add((rel, fn))
                continue
            violations.append(f"{rel}:{loop.lineno} in {fn}()")
    assert not violations, (
        "bounded range-loop breaks on convergence without a cap guard: "
        + "; ".join(violations)
        + " — add a for/else raise (fixpoint loop: non-convergence is "
        "a wrong answer) or, ONLY if any iteration count yields a "
        "valid result, allowlist it in ANYTIME_CONVERGENCE_BREAKS "
        "with the anytime rationale"
    )
    stale = ANYTIME_CONVERGENCE_BREAKS - seen_allowed
    assert not stale, (
        f"stale ANYTIME_CONVERGENCE_BREAKS entries (site moved or "
        f"renamed — keep the allowlist honest): {sorted(stale)}"
    )


def test_every_convergence_return_has_postloop_raise_or_is_search():
    violations = []
    seen_allowed = set()
    for rel, path in _package_sources():
        with open(path, encoding="utf-8") as fh:
            tree = ast.parse(fh.read(), filename=path)
        for loop in _range_for_nodes(tree):
            if not _has_toplevel_return(loop):
                continue
            fn = _enclosing_function(tree, loop)
            if (rel, fn) in SEARCH_LOOP_RETURNS:
                seen_allowed.add((rel, fn))
                continue
            if not _raise_follows(tree, loop):
                violations.append(f"{rel}:{loop.lineno} in {fn}()")
    assert not violations, (
        "range-loop returns on convergence but nothing raises after "
        "the loop (cap exhaustion would fall through silently): "
        + "; ".join(violations)
        + " — add a post-loop raise (fixpoint loop) or, ONLY if "
        "range exhaustion is a valid not-found outcome, allowlist it "
        "in SEARCH_LOOP_RETURNS with the rationale"
    )
    stale = SEARCH_LOOP_RETURNS - seen_allowed
    assert not stale, (
        f"stale SEARCH_LOOP_RETURNS entries (site moved or renamed — "
        f"keep the allowlist honest): {sorted(stale)}"
    )


def test_er_threshold_sensitivity_raises_on_long_chain(spark, monkeypatch):
    """The vectorized min-label loop caps at 10 iterations; a match
    graph whose diameter exceeds that MUST raise (parity with
    connected_components), never emit stats off partially-propagated
    labels. Fixture: a 30-node path graph (diameter 29 — min-label
    moves one hop per iteration), every edge scored above the top
    threshold so it survives all five gates."""
    from pyspark.sql import functions as F

    from env_event_stream_spark import analytics_queries as aq

    def chain_pairs(spark_, sf_dir_):
        rows = [(f"n{i:02d}", f"n{i + 1:02d}", 10) for i in range(29)]
        return spark_.createDataFrame(
            rows, "k1 string, k2 string, score int"
        ).withColumn("score", F.col("score").cast("int"))

    monkeypatch.setattr(aq, "_er_scored_pairs", chain_pairs)
    with pytest.raises(RuntimeError, match="did not converge"):
        aq.er_threshold_sensitivity(spark, "/nonexistent").collect()


def test_er_threshold_sensitivity_converges_on_short_chain(spark, monkeypatch):
    """Control: the same synthetic shape UNDER the cap (diameter 3)
    converges and emits one stats row per threshold."""
    from pyspark.sql import functions as F

    from env_event_stream_spark import analytics_queries as aq

    def chain_pairs(spark_, sf_dir_):
        rows = [(f"n{i}", f"n{i + 1}", 10) for i in range(3)]
        return spark_.createDataFrame(
            rows, "k1 string, k2 string, score int"
        ).withColumn("score", F.col("score").cast("int"))

    monkeypatch.setattr(aq, "_er_scored_pairs", chain_pairs)
    out = aq.er_threshold_sensitivity(spark, "/nonexistent").collect()
    assert len(out) == len(aq._ER_THRESHOLDS)
    # one 4-node component at every threshold (all edges score 10);
    # hard indexing so a schema rename fails loudly, never vacuously
    for row in out:
        assert row["n_clusters"] == 1
        assert row["n_nodes"] == 4
