"""Infinite Relational Model — the `irm` sibling-repo capability,
rebuilt on common_tpu's likelihood/suffstat machinery.

Public surface:
  model_definition, RelationDefinition, initialize, IRMState,
  score_assignment / score_likelihood / score_joint,
  kernels.assign (exact collapsed Gibbs), kernels.sweep (blocked).
"""

from common_tpu.relational import kernels  # noqa: F401
from common_tpu.relational.state import (  # noqa: F401
    IRMDefinition,
    IRMState,
    RelationDefinition,
    RelView,
    as_views,
    initialize,
    model_definition,
    pred_logpdf,
    predict_missing,
    score_assignment,
    score_joint,
    score_likelihood,
)
