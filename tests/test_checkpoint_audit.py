"""Allowlist audit of raw ``.localCheckpoint(`` call sites.

The plan lint (``plans.unpartitioned_windows_over_unaggregated_input``)
exempts checkpoint scans (RDDScanExec) on the invariant that in this repo a
localCheckpoint is always a BOUNDED intermediate — a value histogram, a
k-row moment table, an edge/pair list, or a per-iteration loop state whose
lineage must be cut. Corpus-volume multi-consumer intermediates (exploded
token streams, per-doc/per-session/per-vector tables, signature tables)
must instead use ``functions.persist_corpus`` — persist keeps the lineage
(recoverable after executor loss) and spills instead of pinning O(corpus)
rows on executor-local storage (the r6 ADVICE medium; verified fixed r7).

This test pins the audited raw call-site counts per module. A NEW
``.localCheckpoint(`` site fails here with instructions: either it caches a
corpus-volume table (use ``persist_corpus``), or it is a genuinely bounded
table / iterative loop state (use ``functions.checkpoint_bounded(df,
bound=...)`` with the boundedness claim, or bump the audited count below
with a comment in the same commit explaining the bound).

Audit record (r7) of what the remaining raw sites are:
- iterative loop states needing lineage cuts: dedup_clusters labels,
  MMR/conformal selections, markov iterates, BFS frontiers, image dedup
  label propagation, IRLS/beta steps;
- value-domain histograms and k-row moment tables feeding global
  cumulative windows (stats_tests, analytics, mlprep, sketches ddsketch);
- bounded edge/pair/grid tables (token graph edges, zone maps, bigram
  count tables, thresholded near-dup pair lists);
- sliced fixtures bounded by an explicit doc_id cap (language-id eval
  frames).
"""

from __future__ import annotations

import os
import re

import pytest

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tscd_datalake_adapter_spark",
)

# module (relative to the package) -> audited raw localCheckpoint sites
AUDITED: dict[str, int] = {
    "functions/__init__.py": 1,  # the checkpoint_bounded helper itself
    # r7 second-session re-audit: market_basket baskets (per order) and
    # rfm purch (per user) were corpus-volume → persist_corpus
    # r11 optimization: croston's 40-step recursive CTE became one
    # single-partition mapInPandas fold — its pre-recursion checkpoint
    # site (bounded ≤40-row series) is gone with the recursion
    "operators/analytics.py": 19,
    "operators/dedup.py": 4,
    # r12: markov_removal_attribution's expression-unrolled recursion
    # (pivot row + every-2-steps + out: 4 sites) and
    # markov_stationary_distribution's matrix + per-iteration cuts
    # (2 sites) became applyInPandas folds over the bounded matrices
    "operators/history.py": 1,
    "operators/io.py": 1,
    "operators/mining.py": 3,
    # r7 second-session re-audit: conformal base (|orders| rows) and the
    # funnel's s1/s2 (per user) were corpus-volume → persist_corpus
    "operators/mlprep.py": 11,
    # r12: image_dedup_clusters' propagation loop (edges + labels +
    # per-round state, 3 sites) became one union-find task — no
    # checkpoints left in multimodal.py
    "operators/pipeline.py": 1,
    "operators/relational.py": 1,
    "operators/sampling.py": 1,
    # r12: mmr's per-pick selection checkpoints (2 sites) folded into one
    # applyInPandas greedy chain over the bounded page
    "operators/similarity.py": 5,
    "operators/sketches.py": 2,
    "operators/stats_tests.py": 16,
    # r8: pagerank/BFS symmetrized edge lists and the shared
    # _cooccurrence_edges moved to persist_corpus (threshold-derived,
    # scale with corpus co-occurrence density — r7 ADVICE); verified
    # every caller still materializes the cache exactly once
    # r12: pagerank's degs checkpoint folded into the persisted edge
    # cache (deg attached via a src window at cache-build time)
    "operators/text.py": 13,
}

_CALL = re.compile(r"\.localCheckpoint\(")


def _count(path: str) -> int:
    with open(path, encoding="utf-8") as f:
        return len(_CALL.findall(f.read()))


@pytest.mark.smoke
def test_no_unaudited_localcheckpoint_sites():
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            n = _count(path)
            if n:
                found[os.path.relpath(path, PKG)] = n
    assert found == AUDITED, (
        "raw .localCheckpoint( call sites changed.\n"
        f"found   = {found}\n"
        f"audited = {AUDITED}\n"
        "A checkpoint truncates lineage and pins rows on executor-local "
        "storage. If the table grows with corpus volume (token stream, "
        "per-doc/session/vector rows, signatures), use "
        "functions.persist_corpus instead. If it is genuinely bounded "
        "(histogram, k-row moments, loop state), use "
        "functions.checkpoint_bounded(df, bound=...) or update AUDITED "
        "here with the bound documented at the call site."
    )


@pytest.mark.smoke
def test_corpus_cache_helper_is_memory_and_disk():
    from pyspark import StorageLevel

    # the helper's contract: spillable AND recomputable (lineage kept)
    import inspect

    from tscd_datalake_adapter_spark.functions import persist_corpus

    src = inspect.getsource(persist_corpus)
    assert "MEMORY_AND_DISK" in src
    assert StorageLevel.MEMORY_AND_DISK is not None


def test_checkpoint_bounded_requires_claim():
    from tscd_datalake_adapter_spark.functions import checkpoint_bounded

    with pytest.raises(ValueError):
        checkpoint_bounded(None, "")
    with pytest.raises(ValueError):
        checkpoint_bounded(None, None)  # type: ignore[arg-type]
