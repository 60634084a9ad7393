"""Inference runner — kernel-config driven sweep loop.

Reference analog: the `runner` layer of the reference ecosystem
(`kernels:microscopes/kernels/runner.py` [MED]): takes a model definition,
a dataview, an initialized latent state and a *kernel config* — an ordered
list like ``[('assign', {}), ('grid_feature_hp', spec), ('theta', {})]`` —
and applies each kernel once per iteration.

TPU-native design: the whole iteration loop is one `lax.scan` under `jit`
(per-iteration keys via fold_in), optionally collecting the assignment
vector and joint score trace on-device; multi-chain execution is a `vmap`
over a batched state (see parallel/), not a multiprocessing pool.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from common_tpu import state as state_mod
from common_tpu import validator
from common_tpu.kernels import gibbs
from common_tpu.state import MixtureState


def _k_assign(state, data, key, **kw):
    return gibbs.assign_resample(state, data, key, m=kw.get("m", 1))


def _k_assign_resample(state, data, key, **kw):
    return gibbs.assign_resample(state, data, key, m=kw.get("m", 2))


def _k_assign_fixed(state, data, key, **kw):
    return gibbs.assign_resample(state, data, key, m=1)


def _k_assign_blocked(state, data, key, **kw):
    from common_tpu.kernels import blocked

    return blocked.sweep(state, data, key)


def _k_assign_blocked_fused(state, data, key, **kw):
    from common_tpu.kernels import blocked

    return blocked.sweep_fused(state, data, key, **kw)


def _k_grid_feature_hp(state, data, key, **kw):
    return gibbs.hp(state, kw["specs"], key)


def _k_grid_cluster_hp(state, data, key, **kw):
    return gibbs.cluster_hp(state, kw["prior"], kw["grid"], key)


def _k_ew_cluster_hp(state, data, key, **kw):
    return gibbs.cluster_hp_escobar_west(
        state, key, kw.get("a", 1.0), kw.get("b", 1.0)
    )


def _k_theta(state, data, key, **kw):
    return gibbs.theta(state, key)


def _k_slice_theta(state, data, key, **kw):
    from common_tpu.kernels import slice_ as slice_mod

    return slice_mod.theta(state, key, **kw)


def _k_slice_hp(state, data, key, **kw):
    from common_tpu.kernels import slice_ as slice_mod

    return slice_mod.hp(state, data, key, **kw)


def _k_nuts_hp(state, data, key, **kw):
    from common_tpu.kernels import hmc

    return hmc.hp(state, data, key, **kw)


def _k_nuts_cluster_hp(state, data, key, **kw):
    from common_tpu.kernels import hmc

    return hmc.cluster_hp(state, key, kw.pop("prior"), **kw)


def _k_nuts_theta(state, data, key, **kw):
    from common_tpu.kernels import hmc

    return hmc.theta(state, key, **kw)


KERNELS: Dict[str, Callable] = {
    "assign": _k_assign,
    "assign_resample": _k_assign_resample,
    "assign_fixed": _k_assign_fixed,
    "assign_blocked": _k_assign_blocked,
    "assign_blocked_fused": _k_assign_blocked_fused,
    "grid_feature_hp": _k_grid_feature_hp,
    "grid_cluster_hp": _k_grid_cluster_hp,
    "ew_cluster_hp": _k_ew_cluster_hp,
    "theta": _k_theta,
    "slice_theta": _k_slice_theta,
    "slice_hp": _k_slice_hp,
    "nuts_hp": _k_nuts_hp,
    "nuts_cluster_hp": _k_nuts_cluster_hp,
    "nuts_theta": _k_nuts_theta,
}


def normalize_config(kernel_config: Sequence) -> Tuple[Tuple[str, dict], ...]:
    """Accept ['assign'] or [('assign', {...})] mixes (reference format)."""
    out: List[Tuple[str, dict]] = []
    for entry in kernel_config:
        if isinstance(entry, str):
            name, kw = entry, {}
        else:
            name, kw = entry
        validator.validate_one_of(name, KERNELS, "kernel name")
        out.append((name, dict(kw)))
    return tuple(out)


def make_step(kernel_config: Sequence, data) -> Callable:
    """Compose a kernel config into one jit-able `step(state, key) -> state`."""
    config = normalize_config(kernel_config)

    def step(state: MixtureState, key) -> MixtureState:
        for i, (name, kw) in enumerate(config):
            state = KERNELS[name](state, data, jax.random.fold_in(key, i), **kw)
        return state

    return step


@partial(jax.jit, static_argnames=("step", "niters", "collect_assignments"))
def _run_scan(state, key, step, niters, collect_assignments):
    def body(st, t):
        st = step(st, jax.random.fold_in(key, t))
        out = {
            "score": state_mod.score_joint(st),
            "k_active": jnp.sum(st.counts > 0),
            "counts": st.counts,
        }
        if collect_assignments:
            out["assignments"] = st.assignments
        return st, out

    return jax.lax.scan(body, state, jnp.arange(niters))


class runner:
    """Reference-parity runner: r = runner(defn, data, state, config);
    r.run(key, niters).  Traces (assignments, joint score) are collected
    on-device and exposed as host arrays.

    jsonl_path: optional structured per-sweep observability (SURVEY.md
    §5.5 rebuild item) — one JSON line per sweep with the joint log-score,
    active-cluster count, occupancy histogram, and (on each run() call)
    running ESS/split-R̂ of the score trace.
    """

    def __init__(self, defn, data, state: MixtureState, kernel_config,
                 jsonl_path: str | None = None):
        self._defn = defn
        self._data = data
        self._state = state
        self._config = normalize_config(kernel_config)
        self._step = make_step(self._config, data)
        self._assignment_trace = []
        self._score_trace = []
        self._jsonl_path = jsonl_path
        self._sweep_idx = 0

    def run(self, key, niters: int = 1, collect: bool = True):
        validator.validate_positive(niters, "niters")
        self._state, trace = _run_scan(
            self._state, key, self._step, int(niters), collect
        )
        if collect:
            import numpy as np

            self._assignment_trace.append(np.asarray(trace["assignments"]))
            self._score_trace.append(np.asarray(trace["score"]))
        if self._jsonl_path is not None:
            self._write_jsonl(trace)
        self._warn_if_saturated()
        return self._state

    def _write_jsonl(self, trace):
        import json

        import numpy as np

        from common_tpu.utils import diagnostics

        scores = np.asarray(trace["score"])
        k_active = np.asarray(trace["k_active"])
        counts = np.asarray(trace["counts"])
        full = self.score_trace
        ess = (
            float(diagnostics.ess(full)) if full.shape[-1] >= 4 else None
        )
        with open(self._jsonl_path, "a") as f:
            for i in range(scores.shape[0]):
                occ = counts[i][counts[i] > 0]
                f.write(json.dumps({
                    "sweep": self._sweep_idx,
                    "score_joint": float(scores[i]),
                    "k_active": int(k_active[i]),
                    "occupancy": np.sort(occ)[::-1].tolist(),
                    "ess": ess if i == scores.shape[0] - 1 else None,
                }) + "\n")
                self._sweep_idx += 1

    def _warn_if_saturated(self):
        import warnings

        if bool(state_mod.is_saturated(self._state)):
            warnings.warn(
                f"all {self._state.k_max} cluster slots are occupied: the "
                "CRP can no longer open new clusters and the truncation "
                "may bias the posterior. Re-pad with "
                "common_tpu.state.repad(state, new_k_max) and rebuild the "
                "runner.",
                RuntimeWarning,
                stacklevel=3,
            )

    def get_latent(self) -> MixtureState:
        return self._state

    @property
    def assignment_trace(self):
        import numpy as np

        return (
            np.concatenate(self._assignment_trace)
            if self._assignment_trace
            else np.zeros((0, self._state.n), np.int32)
        )

    @property
    def score_trace(self):
        import numpy as np

        return (
            np.concatenate(self._score_trace)
            if self._score_trace
            else np.zeros((0,))
        )


def run_chain(state, data, key, niters, kernel_config, collect_assignments=True):
    """Functional one-shot: returns (final_state, trace dict of [T, ...])."""
    step = make_step(kernel_config, data)
    return _run_scan(state, key, step, int(niters), collect_assignments)
