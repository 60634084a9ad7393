"""Topic modelling two ways: HDP-LDA Gibbs and online variational LDA.

Run: python examples/lda_topics.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)  # run from a bare checkout: python examples/<name>.py

import numpy as np
import jax

from common_tpu import topic
from common_tpu.data.variadic import variadic_dataview
from common_tpu.runner import runner

rng = np.random.default_rng(1)
V, KB = 30, 3
rows = [rng.choice(np.arange((d % KB) * 10, (d % KB + 1) * 10), size=30)
        for d in range(200)]
view = variadic_dataview(rows)
data = topic.token_data(view)

# --- HDP-LDA: blocked Gibbs + concentration resampling via the runner ---
state = topic.initialize(view, 10, V, jax.random.key(0), eta=0.1)
ppl0 = float(topic.perplexity(state, data))
r = runner(None, data, state, [("assign_blocked", {}), ("concentrations", {})])
out = r.run(jax.random.key(1), 50)
print(f"HDP Gibbs:  perplexity {ppl0:.1f} -> "
      f"{float(topic.perplexity(out, data)):.1f}  "
      f"topics = {int(np.asarray(out.active_topics()))}  "
      f"alpha = {float(out.hypers['alpha']):.2f}")

# --- online variational LDA (SVI) on the same corpus ---
counts = topic.svi.doc_term_matrix(view, V)
post = topic.svi.init(8, V, jax.random.key(2), alpha=0.5, eta=0.1)
p0 = float(topic.svi.perplexity(post, counts))
post = topic.svi.fit_svi(post, counts, jax.random.key(3),
                         n_iters=200, batch_size=32)
print(f"LDA SVI:    perplexity {p0:.1f} -> "
      f"{float(topic.svi.perplexity(post, counts)):.1f}")
