"""State serialization / checkpoint-resume.

Reference analog: ``common:src/io/schema.proto`` +
``group_manager::serialize()`` — protobuf persistence of the assignment
vector, per-group counts, packed suffstats and hypers, surfaced in Python
as ``state.serialize()`` / ``deserialize``.

TPU-native design (SURVEY.md §5.4): the state is already a pytree of
arrays, so persistence is an npz archive keyed by leaf path plus a JSON
metadata header (likelihood names, fixed flag, shapes).  `extra` carries
anything needed for bit-exact resume (PRNG key, iteration counter) —
checkpointed chains resume identically because all randomness is
fold_in-derived from the saved key.
"""

from __future__ import annotations

import io as _io
import json
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from common_tpu import validator
from common_tpu.state import MixtureState

_META_KEY = "__meta__"


def _flatten(state: MixtureState, extra: Optional[Dict[str, Any]] = None):
    arrays: Dict[str, np.ndarray] = {
        "assignments": np.asarray(state.assignments),
        "counts": np.asarray(state.counts),
    }
    for k, v in state.cluster_hp.items():
        arrays[f"cluster_hp.{k}"] = np.asarray(v)
    for f, stats_f in enumerate(state.stats):
        for k, v in stats_f.items():
            arrays[f"stats.{f}.{k}"] = np.asarray(v)
    for f, hyper_f in enumerate(state.hypers):
        for k, v in hyper_f.items():
            arrays[f"hypers.{f}.{k}"] = np.asarray(v)
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(
            jax.random.key_data(v) if _is_key(v) else v
        )
    meta = {
        "lik_names": list(state.lik_names),
        "fixed": bool(state.fixed),
        "stat_keys": [sorted(s) for s in state.stats],
        "hyper_keys": [sorted(h) for h in state.hypers],
        "cluster_hp_keys": sorted(state.cluster_hp),
        "extra_keys": sorted(extra) if extra else [],
        "key_extras": [k for k, v in (extra or {}).items() if _is_key(v)],
        "version": 1,
    }
    return arrays, meta


def _is_key(v) -> bool:
    try:
        return jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def serialize(state: MixtureState, extra: Optional[Dict[str, Any]] = None) -> bytes:
    """state -> bytes (reference parity: state.serialize())."""
    arrays, meta = _flatten(state, extra)
    buf = _io.BytesIO()
    np.savez(buf, **arrays, **{_META_KEY: np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)})
    return buf.getvalue()


def deserialize(blob: bytes) -> Tuple[MixtureState, Dict[str, Any]]:
    """bytes -> (state, extra)."""
    import jax.numpy as jnp

    with np.load(_io.BytesIO(blob)) as z:
        meta = json.loads(bytes(z[_META_KEY].tobytes()).decode())
        validator.validate_one_of(meta["version"], (1,), "checkpoint version")
        state = MixtureState(
            assignments=jnp.asarray(z["assignments"]),
            counts=jnp.asarray(z["counts"]),
            cluster_hp={
                k: jnp.asarray(z[f"cluster_hp.{k}"])
                for k in meta["cluster_hp_keys"]
            },
            stats=tuple(
                {k: jnp.asarray(z[f"stats.{f}.{k}"]) for k in keys}
                for f, keys in enumerate(meta["stat_keys"])
            ),
            hypers=tuple(
                {k: jnp.asarray(z[f"hypers.{f}.{k}"]) for k in keys}
                for f, keys in enumerate(meta["hyper_keys"])
            ),
            lik_names=tuple(meta["lik_names"]),
            fixed=meta["fixed"],
        )
        extra = {}
        for k in meta["extra_keys"]:
            v = z[f"extra.{k}"]
            if k in meta["key_extras"]:
                extra[k] = jax.random.wrap_key_data(jnp.asarray(v))
            else:
                extra[k] = jnp.asarray(v)
    return state, extra


def save(path: str, state: MixtureState, extra: Optional[Dict[str, Any]] = None):
    with open(path, "wb") as f:
        f.write(serialize(state, extra))


def load(path: str) -> Tuple[MixtureState, Dict[str, Any]]:
    with open(path, "rb") as f:
        return deserialize(f.read())
