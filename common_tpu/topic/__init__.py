"""HDP-LDA topic modelling — the `lda` sibling-repo capability."""

from common_tpu.topic.hdp import (  # noqa: F401
    HDPState,
    TokenData,
    blocked_sweep,
    collapsed_sweep,
    crt_sample,
    initialize,
    make_sharded_sweep,
    perplexity,
    sample_beta,
    sample_concentrations,
    score_joint,
    shard_corpus,
    blocked_sweep_dense,
    make_sharded_sweep_dense,
    shard_dense_corpus,
    dense_token_data,
    densify_corpus,
    token_data,
)
from common_tpu.topic import svi  # noqa: F401
