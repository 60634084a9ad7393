"""Online variational LDA: bound ascent under CAVI, topic recovery,
minibatch SVI improvement, held-out perplexity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu.data.variadic import variadic_dataview
from common_tpu.topic import svi as lda


def _block_corpus(n_docs=120, doc_len=40, kb=3, v_per=8, seed=0):
    r = np.random.default_rng(seed)
    V = kb * v_per
    rows, truth = [], []
    for d in range(n_docs):
        t = d % kb
        truth.append(t)
        vocab = np.arange(t * v_per, (t + 1) * v_per)
        rows.append(r.choice(vocab, size=doc_len))
    return rows, np.array(truth), V


def test_doc_term_matrix():
    rows, _, V = _block_corpus(n_docs=10, doc_len=12)
    counts = np.asarray(lda.doc_term_matrix(variadic_dataview(rows), V))
    assert counts.shape == (10, V)
    assert counts.sum() == 10 * 12
    for d, row in enumerate(rows):
        np.testing.assert_array_equal(
            counts[d], np.bincount(row, minlength=V)
        )


def test_cavi_bound_ascends_and_recovers_topics():
    rows, truth, V = _block_corpus()
    counts = lda.doc_term_matrix(variadic_dataview(rows), V)
    post = lda.init(6, V, jax.random.key(0), alpha=0.5, eta=0.1)
    post, bounds = lda.fit_cavi(post, counts, n_iters=30)
    bounds = np.asarray(bounds)
    assert np.isfinite(bounds).all()
    assert bounds[-1] > bounds[0]
    # near-monotone ascent (tiny numerical dips tolerated)
    assert (np.diff(bounds) > -1e-2 * np.abs(bounds[:-1])).all(), bounds
    # each true vocab block is owned by some topic
    topics = np.asarray(post.topics())
    big = np.asarray(post.lam.sum(axis=-1)) > V  # topics with real mass
    blocks = topics[big].reshape(big.sum(), 3, -1).sum(axis=-1)
    assert (blocks.max(axis=1) > 0.9).all()
    # mapped doc accuracy via gamma from one E-step
    elog_beta = lda._dir_elog(post.lam)
    gamma, _ = lda._e_step(elog_beta, counts, post.alpha, 25)
    zhat = np.asarray(jnp.argmax(gamma, -1))
    mapping = {k: np.bincount(truth[zhat == k]).argmax()
               for k in np.unique(zhat)}
    acc = np.mean([mapping[z] == t for z, t in zip(zhat, truth)])
    assert acc > 0.95, acc


def test_minibatch_svi_improves_heldout():
    rows, _, V = _block_corpus(n_docs=200, doc_len=30, seed=1)
    counts = lda.doc_term_matrix(variadic_dataview(rows), V)
    train, test = counts[:160], counts[160:]
    post = lda.init(6, V, jax.random.key(0), alpha=0.5, eta=0.1)
    ppl0 = float(lda.perplexity(post, test))
    post = lda.fit_svi(post, train, jax.random.key(1),
                       n_iters=200, batch_size=16)
    ppl1 = float(lda.perplexity(post, test))
    assert ppl1 < 0.6 * ppl0, (ppl0, ppl1)
    # much better than uniform over the vocab
    assert ppl1 < 0.7 * V, ppl1


def test_validators():
    with pytest.raises(ValueError):
        lda.init(0, 10, jax.random.key(0))
    rows, _, V = _block_corpus(n_docs=8, doc_len=5)
    counts = lda.doc_term_matrix(variadic_dataview(rows), V)
    post = lda.init(4, V, jax.random.key(0))
    with pytest.raises(ValueError):
        lda.fit_svi(post, counts, jax.random.key(1), 5, 4, kappa=0.3)


def test_lda_posterior_checkpoint_roundtrip():
    import tempfile, os

    from common_tpu import io as ctio

    rows, _, V = _block_corpus(n_docs=12, doc_len=8)
    counts = lda.doc_term_matrix(variadic_dataview(rows), V)
    post = lda.init(4, V, jax.random.key(0))
    post, _ = lda.fit_cavi(post, counts, n_iters=3)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "lda.ckpt")
        ctio.checkpoint.save(path, post)
        post2, extra = ctio.checkpoint.load(path)
    assert type(post2).__name__ == "LDAPosterior"
    np.testing.assert_array_equal(np.asarray(post.lam), np.asarray(post2.lam))
    np.testing.assert_array_equal(np.asarray(post.alpha), np.asarray(post2.alpha))
    b1 = float(lda.bound(post, counts))
    b2 = float(lda.bound(post2, counts))
    assert b1 == b2
