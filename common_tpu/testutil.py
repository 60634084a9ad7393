"""Exact-posterior test machinery — the reference's crown-jewel methodology.

Rebuild of ``common:microscopes/common/testutil.py``: enumerate all set
partitions of n entities (n ≲ 10), compute the exact posterior over
partitions by brute force (EPPF + marginal likelihoods), run a sampler,
bin its sampled canonical partitions, and assert the empirical distribution
is KL-close to the exact one with escalating sample counts.  This catches
CRP-bookkeeping bugs that moment checks miss (SURVEY.md §4).

All enumeration is host-side numpy; scoring delegates to the framework's
jitted score functions so the oracle also cross-checks the scan-based
bookkeeping against direct scoring of each partition.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, Tuple

import numpy as np

from common_tpu import validator


def permutation_iter(n: int) -> Iterator[Tuple[int, ...]]:
    """Enumerate all set partitions of {0..n-1} in canonical form.

    Canonical form: assignment vector where group ids appear in order of
    first occurrence (restricted growth strings). Count = Bell(n).
    Backed by the native enumerator (common_tpu/native) when available;
    this pure-Python recursion is the fallback and the cross-check.
    """
    validator.validate_positive(n, "n")
    from common_tpu import native

    if n > 2 and native.available():
        for row in native.enumerate_partitions(n):
            yield tuple(int(v) for v in row)
        return

    def rec(prefix, maxg):
        if len(prefix) == n:
            yield tuple(prefix)
            return
        for g in range(maxg + 2):
            yield from rec(prefix + [g], max(maxg, g))

    yield from rec([0], 0)


def permutation_canonical(assignment) -> Tuple[int, ...]:
    """Relabel an assignment vector to canonical (first-occurrence) form."""
    relabel: Dict[int, int] = {}
    out = []
    for a in np.asarray(assignment).tolist():
        if a not in relabel:
            relabel[a] = len(relabel)
        out.append(relabel[a])
    return tuple(out)


def canonicalize_batch(assignments) -> list:
    """Canonicalize a [S, n] batch of assignment vectors to tuples.

    Native-accelerated (one C call for the whole trace) — use this instead
    of per-row permutation_canonical when binning long MCMC traces."""
    from common_tpu import native

    out = native.canonicalize_batch(assignments)
    return [tuple(int(v) for v in row) for row in out]


def dist_on_all_clusterings(score_fn: Callable, n: int):
    """Exact posterior over all canonical partitions of n entities.

    score_fn(assignment tuple) -> joint log score (EPPF + marginal lik).
    Returns (partitions list, normalized probability array).
    """
    parts = list(permutation_iter(n))
    scores = np.array([float(score_fn(p)) for p in parts])
    return parts, scores_to_probs(scores)


def scores_to_probs(scores) -> np.ndarray:
    """Normalize log scores into a probability vector (logsumexp)."""
    scores = np.asarray(scores, dtype=np.float64)
    m = scores.max()
    p = np.exp(scores - m)
    return p / p.sum()


def kl(p, q) -> float:
    """KL(p || q) for discrete dists (q floored to avoid inf)."""
    p = np.asarray(p, np.float64)
    q = np.maximum(np.asarray(q, np.float64), 1e-12)
    mask = p > 0
    return float(np.sum(p[mask] * (np.log(p[mask]) - np.log(q[mask]))))


def assert_discrete_dist_approx(
    sample_fn: Callable[[int], Iterable],
    dist: Dict[Tuple, float] | Tuple,
    ntries: int = 5,
    nsamples: int = 1000,
    kl_tol: float = 5e-2,
    growth: float = 2.0,
) -> float:
    """Assert that sampled partitions match an exact discrete distribution.

    sample_fn(nsamples) -> iterable of hashable outcomes (canonical
    partitions).  dist: {outcome: prob} (or (outcomes, probs)).  Retries
    with escalating sample counts — the reference's convergence-loop
    methodology (testutil.py assert_discrete_dist_approx).
    Returns the final KL on success; raises AssertionError on failure.
    """
    if not isinstance(dist, dict):
        outcomes, probs = dist
        dist = {o: float(pr) for o, pr in zip(outcomes, probs)}

    last_kl = np.inf
    for trial in range(ntries):
        n = int(nsamples * growth**trial)
        counts: Dict = {}
        total = 0
        for s in sample_fn(n):
            counts[s] = counts.get(s, 0) + 1
            total += 1
        support = list(dist)
        p = np.array([dist[o] for o in support])
        q = np.array([counts.get(o, 0) / total for o in support])
        # mass sampled outside exact support is a hard bookkeeping bug
        extra = 1.0 - q.sum()
        if extra > 0.01:
            raise AssertionError(
                f"{extra:.1%} of sampled mass outside the exact support; "
                f"offending outcomes: "
                f"{[o for o in counts if o not in dist][:5]}"
            )
        last_kl = kl(p, q)
        if last_kl < kl_tol:
            return last_kl
    raise AssertionError(
        f"KL(exact || sampled) = {last_kl:.4f} >= {kl_tol} after {ntries} tries"
    )
