"""IRM link prediction: impute held-out cells of a block-structured graph.

Run: python examples/irm_links.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)  # run from a bare checkout: python examples/<name>.py

import numpy as np
import jax

from common_tpu import models, relational as irm
from common_tpu.data.sparse import sparse_ndarray_dataview
from common_tpu.runner import runner

n = 30
rng = np.random.default_rng(3)
z_true = np.repeat(np.arange(3), n // 3)
probs = np.where(z_true[:, None] == z_true[None, :], 0.9, 0.1)
rel = (rng.random((n, n)) < probs).astype(np.float32)
missing = rng.random((n, n)) < 0.15          # held out for prediction

defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=8)
views = irm.as_views([sparse_ndarray_dataview(dense=rel, missing_mask=missing)])
s = irm.initialize(defn, views, jax.random.key(0), cluster_hps=[{"alpha": 1.0}])

r = runner(defn, views, s, [("assign", {}), ("ew_domain_alpha", {})])
out = r.run(jax.random.key(1), 25)

held = np.argwhere(missing).astype(np.int32)
p = np.asarray(irm.predict_missing(out, 0, held, (0.0, 1.0)))
acc = ((p[:, 1] > 0.5) == (probs[held[:, 0], held[:, 1]] > 0.5)).mean()
print(f"domains found = {int(np.asarray(out.ngroups(0)))}  "
      f"held-out link accuracy = {acc:.3f}  ({len(held)} cells)")
