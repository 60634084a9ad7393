"""HDP-LDA tests: exact z-enumeration oracle for the collapsed sampler,
CRT table-count distribution vs the exact Stirling pmf, beta resampling,
blocked-sweep recovery, and the token-sharded sweep on the virtual mesh."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as sp_logsumexp

from common_tpu import parallel, testutil
from common_tpu import topic
from common_tpu.data.variadic import variadic_dataview


def _tiny_corpus():
    """2 docs x 3 tokens, V=2."""
    rows = [np.array([0, 0, 1]), np.array([1, 1, 0])]
    view = variadic_dataview(rows)
    data = topic.token_data(view)
    return view, data


def _state_with_z(state, data, z):
    import dataclasses

    dk, kw, kt = topic.hdp._counts(
        jnp.asarray(z, jnp.int32), data, state.n_docs, state.n_topics,
        state.vocab_size,
    )
    return dataclasses.replace(
        state, z=jnp.asarray(z, jnp.int32), doc_topic=dk, topic_word=kw,
        topic_total=kt,
    )


def test_collapsed_matches_z_enumeration():
    """With beta fixed, the collapsed sampler's stationary distribution
    over full z vectors must match brute-force enumeration of K^T states."""
    import dataclasses

    view, data = _tiny_corpus()
    K = 2
    state = topic.initialize(view, K, 2, jax.random.key(0),
                             alpha=0.8, eta=0.5)
    state = dataclasses.replace(
        state, beta=jnp.asarray([0.5, 0.3, 0.2])
    )

    combos, scores = [], []
    for z in itertools.product(range(K), repeat=6):
        s = _state_with_z(state, data, z)
        combos.append(z)
        scores.append(float(topic.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def chain(s, key, n):
        def body(st, k):
            st = topic.collapsed_sweep(st, data, k)
            return st, st.z

        return jax.lax.scan(body, s, jax.random.split(key, n))

    cache = {}

    def sample_fn(n):
        if n not in cache:
            s0 = _state_with_z(
                state, data,
                np.asarray(
                    jax.random.randint(
                        jax.random.key(len(cache) + 3), (6,), 0, K
                    )
                ),
            )
            _, zs = chain(s0, jax.random.key(len(cache)), n + 100)
            cache[n] = [tuple(int(v) for v in z) for z in np.asarray(zs)[100:]]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


@pytest.mark.slow
def test_crt_matches_stirling_pmf():
    """CRT(5, a): P(m) = |s(5,m)| a^m / (a)_5 — exact Stirling pmf."""
    n, a = 5, 1.3
    stirling = np.array([24.0, 50.0, 35.0, 10.0, 1.0])  # |s(5, m)|, m=1..5
    pmf = stirling * a ** np.arange(1, 6)
    pmf /= pmf.sum()

    draws = []
    for i in range(60):
        m = topic.crt_sample(
            jax.random.key(i), jnp.full(200, n), jnp.asarray(a), n
        )
        draws.append(np.asarray(m))
    draws = np.concatenate(draws)
    freq = np.bincount(draws, minlength=6)[1:6] / len(draws)
    assert np.abs(freq - pmf).max() < 0.01, (freq, pmf)


def test_crt_edge_cases():
    # zero counts -> zero tables; count 1 -> exactly one table
    m = topic.crt_sample(jax.random.key(0), jnp.asarray([0, 1, 3]),
                         jnp.asarray(2.0), 3)
    m = np.asarray(m)
    assert m[0] == 0 and m[1] == 1 and 1 <= m[2] <= 3


def test_sample_beta_tracks_table_mass():
    """Topics with many tables get large beta; dead topics get little."""
    import dataclasses

    view, data = _tiny_corpus()
    state = topic.initialize(view, 4, 2, jax.random.key(0))
    # all six tokens on topic 0
    state = _state_with_z(state, data, np.zeros(6, np.int32))
    betas = []
    for i in range(200):
        betas.append(np.asarray(
            topic.sample_beta(state, jax.random.key(i)).beta
        ))
    mean_beta = np.stack(betas).mean(0)
    assert mean_beta[0] > 0.5, mean_beta
    assert mean_beta[1:4].max() < 0.2, mean_beta


def _synthetic_corpus(n_docs=120, doc_len=40, v_per_topic=8, kb=3, seed=0):
    """Topics with disjoint vocabularies — unambiguous recovery target."""
    r = np.random.default_rng(seed)
    V = v_per_topic * kb
    doc_topic = r.integers(0, kb, n_docs)
    rows = []
    for d in range(n_docs):
        k = doc_topic[d]
        # 85% from own topic's vocab block, 15% noise
        own = r.integers(k * v_per_topic, (k + 1) * v_per_topic, doc_len)
        noise = r.integers(0, V, doc_len)
        take_noise = r.random(doc_len) < 0.15
        rows.append(np.where(take_noise, noise, own))
    return rows, doc_topic, V


@pytest.mark.slow
def test_blocked_sweep_recovers_topics():
    rows, doc_topic, V = _synthetic_corpus()
    view = variadic_dataview(rows)
    data = topic.token_data(view)
    state = topic.initialize(view, 10, V, jax.random.key(0),
                             alpha=0.5, gamma=1.0, eta=0.1)
    ppl0 = float(topic.perplexity(state, data))

    def run(state, key, n=80):
        for i in range(n):
            k = jax.random.fold_in(key, i)
            state = topic.blocked_sweep(state, data, jax.random.fold_in(k, 0))
            state = topic.sample_beta(state, jax.random.fold_in(k, 1),
                                      max_count=64)
        return state

    state = run(state, jax.random.key(1))
    ppl1 = float(topic.perplexity(state, data))
    assert ppl1 < 0.6 * ppl0, (ppl0, ppl1)

    # many-to-one mapped accuracy: each inferred topic votes for the true
    # topic of the docs it dominates (tolerates benign topic splits)
    zhat = np.asarray(jnp.argmax(state.doc_topic, axis=-1))
    mapping = {}
    for k in np.unique(zhat):
        true_of_k = doc_topic[zhat == k]
        mapping[k] = np.bincount(true_of_k).argmax()
    acc = np.mean([mapping[z] == t for z, t in zip(zhat, doc_topic)])
    assert acc > 0.95, acc
    # topic-word structure: each true vocab block is owned by topics whose
    # mass concentrates there
    kw = np.asarray(state.topic_word)
    big = kw.sum(axis=1) > 100
    blocks = kw[big].reshape(big.sum(), 3, -1).sum(axis=-1)
    purity = blocks.max(axis=1) / blocks.sum(axis=1)
    assert (purity > 0.8).all(), purity


def test_sharded_sweep_matches_invariants(cpu_devices):
    rows, doc_topic, V = _synthetic_corpus(n_docs=40, doc_len=24, seed=1)
    total = sum(len(r) for r in rows)
    pad = -(-total // 8) * 8
    view = variadic_dataview(rows, pad_to=pad)
    data = topic.token_data(view)

    mesh = parallel.make_mesh(chains=1, data=8, devices=cpu_devices[:8])
    with jax.default_device(cpu_devices[0]):
        state = topic.initialize(view, 8, V, jax.random.key(0), eta=0.1)
        sstate, sdata = topic.shard_corpus(mesh, state, data)
        sweep = topic.make_sharded_sweep(mesh, sstate, sdata)
        for i in range(30):
            k = jax.random.fold_in(jax.random.key(2), i)
            sstate = sweep(sstate, sdata, jax.random.fold_in(k, 0))
            sstate = topic.sample_beta(sstate, jax.random.fold_in(k, 1),
                                       max_count=32)
        # invariants: count tables consistent with z
        dk, kw, kt = topic.hdp._counts(
            sstate.z, sdata, state.n_docs, state.n_topics, V
        )
        assert np.allclose(np.asarray(dk), np.asarray(sstate.doc_topic))
        assert np.allclose(np.asarray(kw), np.asarray(sstate.topic_word))
        assert float(jnp.sum(sstate.topic_total)) == total
        # mixing actually reduced perplexity
        ppl = float(topic.perplexity(sstate, sdata))
        state2 = topic.initialize(view, 8, V, jax.random.key(9), eta=0.1)
        assert ppl < 0.8 * float(topic.perplexity(state2, sdata))


def test_concentration_resampling_matches_quadrature():
    """alpha and gamma Gibbs moves vs quadrature on a state where the CRT
    table counts are deterministic (every doc-topic count is 0 or 1, so
    m_dk == doc_topic exactly and the conditionals have closed forms)."""
    import dataclasses

    from scipy.special import gammaln as sgammaln

    D, K, V = 8, 6, 5
    a, b = 1.5, 0.5
    # each doc uses exactly 3 distinct topics once; every topic is used
    dt = np.zeros((D, K), np.float32)
    for d in range(D):
        dt[d, [d % K, (d + 1) % K, (d + 2) % K]] = 1.0
    n_d = 3.0
    m_tot = float(dt.sum())      # 24 tables
    kplus = K                    # all topics hold tables

    state = topic.HDPState(
        z=jnp.zeros(int(m_tot), jnp.int32),
        beta=jnp.full(K + 1, 1.0 / (K + 1)),
        doc_topic=jnp.asarray(dt),
        topic_word=jnp.zeros((K, V)),
        topic_total=jnp.asarray(dt.sum(0)),
        hypers={"alpha": jnp.asarray(1.0), "gamma": jnp.asarray(1.0),
                "eta": jnp.asarray(0.1)},
    )

    @jax.jit
    def chain(s, key):
        def body(st, k):
            st = topic.hdp._sample_concentrations_jit(
                st, k, 1, a, b, a, b
            )
            return st, (st.hypers["alpha"], st.hypers["gamma"])

        return jax.lax.scan(body, s, jax.random.split(key, 8000))[1]

    alphas, gammas = (np.asarray(t)[2000:] for t in chain(state, jax.random.key(1)))

    grid = np.linspace(1e-3, 60, 60001)

    # p(alpha | m··, n_d) ∝ Gamma(a,b) alpha^m·· Π_d Γ(alpha)/Γ(alpha+n_d)
    logp_a = (
        (a - 1) * np.log(grid) - b * grid
        + m_tot * np.log(grid)
        + D * (sgammaln(grid) - sgammaln(grid + n_d))
    )
    wa = np.exp(logp_a - logp_a.max()); wa /= wa.sum()
    mean_a = float((grid * wa).sum())
    var_a = float(((grid - mean_a) ** 2 * wa).sum())
    assert abs(alphas.mean() - mean_a) < 0.25 * np.sqrt(var_a), (
        alphas.mean(), mean_a,
    )
    assert abs(alphas.var() / var_a - 1.0) < 0.35, (alphas.var(), var_a)

    # p(gamma | K+, m··) ∝ Gamma(a,b) gamma^K+ Γ(gamma)/Γ(gamma+m··)
    logp_g = (
        (a - 1) * np.log(grid) - b * grid
        + kplus * np.log(grid)
        + sgammaln(grid) - sgammaln(grid + m_tot)
    )
    wg = np.exp(logp_g - logp_g.max()); wg /= wg.sum()
    mean_g = float((grid * wg).sum())
    var_g = float(((grid - mean_g) ** 2 * wg).sum())
    assert abs(gammas.mean() - mean_g) < 0.25 * np.sqrt(var_g), (
        gammas.mean(), mean_g,
    )
    assert abs(gammas.var() / var_g - 1.0) < 0.35, (gammas.var(), var_g)


@pytest.mark.slow
def test_concentrations_in_inference_loop():
    """End-to-end: concentration resampling inside a blocked-sweep loop
    keeps hypers positive/finite and still recovers topic structure."""
    rows, doc_topic, V = _synthetic_corpus(n_docs=60, doc_len=30, seed=3)
    view = variadic_dataview(rows)
    data = topic.token_data(view)
    state = topic.initialize(view, 10, V, jax.random.key(0),
                             alpha=1.0, gamma=1.0, eta=0.1)
    ppl0 = float(topic.perplexity(state, data))
    for i in range(50):
        k = jax.random.fold_in(jax.random.key(5), i)
        state = topic.blocked_sweep(state, data, jax.random.fold_in(k, 0))
        state = topic.sample_concentrations(
            state, jax.random.fold_in(k, 1), max_count=64
        )
    assert float(state.hypers["alpha"]) > 0
    assert float(state.hypers["gamma"]) > 0
    assert np.isfinite(float(topic.score_joint(state)))
    assert float(topic.perplexity(state, data)) < 0.7 * ppl0


def test_hdp_runner_integration():
    """runner() drives HDPState through a kernel config (reference runner
    parity for the lda repo), with JSONL observability."""
    import json
    import os
    import tempfile

    from common_tpu.runner import runner

    rows, doc_topic, V = _synthetic_corpus(n_docs=40, doc_len=20, seed=5)
    view = variadic_dataview(rows)
    data = topic.token_data(view)
    state = topic.initialize(view, 8, V, jax.random.key(0), eta=0.1)
    ppl0 = float(topic.perplexity(state, data))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "sweeps.jsonl")
        r = runner(None, data, state,
                   [("assign_blocked", {}), ("concentrations", {})],
                   jsonl_path=path)
        out = r.run(jax.random.key(1), 40)
        lines = [json.loads(l) for l in open(path)]

    assert len(lines) == 40
    assert all(np.isfinite(l["score_joint"]) for l in lines)
    assert float(topic.perplexity(out, data)) < 0.7 * ppl0
    assert np.isfinite(r.score_trace).all()
    assert r.assignment_trace.shape == (40, data.words.shape[0])
    assert float(out.hypers["alpha"]) > 0


def test_hdp_runner_rejects_unknown_kernel():
    rows, _, V = _synthetic_corpus(n_docs=10, doc_len=10)
    view = variadic_dataview(rows)
    state = topic.initialize(view, 4, V, jax.random.key(0))
    from common_tpu.runner import runner

    with pytest.raises(ValueError):
        runner(None, topic.token_data(view), state, [("grid_feature_hp", {})])


def test_sharded_sweep_matches_z_enumeration(cpu_devices):
    """Distributional agreement for the token-sharded sweep: with beta
    fixed, its stationary distribution over z must match brute-force
    enumeration (the phi/theta blocked Gibbs on the mesh targets the
    same collapsed p(z | w, beta) = exp(score_joint))."""
    import dataclasses

    rows = [np.array([0, 0, 1]), np.array([1, 1, 0])]
    K = 2
    # pad token axis to 8 so it shards over the 8-device mesh
    view = variadic_dataview(rows, pad_to=8)
    data = topic.token_data(view)
    state = topic.initialize(view, K, 2, jax.random.key(0),
                             alpha=0.8, eta=0.5)
    state = dataclasses.replace(state, beta=jnp.asarray([0.5, 0.3, 0.2]))
    real = np.asarray(data.mask) > 0
    assert real.sum() == 6

    combos, scores = [], []
    for z6 in itertools.product(range(K), repeat=6):
        zfull = np.zeros(8, np.int32)
        zfull[real] = z6
        s = _state_with_z(state, data, zfull)
        combos.append(z6)
        scores.append(float(topic.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    mesh = parallel.make_mesh(chains=1, data=8, devices=cpu_devices[:8])
    cache = {}

    def sample_fn(n):
        if n not in cache:
            with jax.default_device(cpu_devices[0]):
                zr = np.zeros(8, np.int32)
                zr[real] = np.asarray(
                    jax.random.randint(
                        jax.random.key(len(cache) + 3), (6,), 0, K
                    )
                )
                s0 = _state_with_z(state, data, zr)
                sstate, sdata = topic.shard_corpus(mesh, s0, data)
                sweep = topic.make_sharded_sweep(mesh, sstate, sdata)

                from functools import partial as _partial

                @_partial(jax.jit, static_argnames=("steps",))
                def chain(s, key, steps):
                    def body(st, k):
                        return sweep(st, sdata, k), st.z

                    return jax.lax.scan(
                        body, s, jax.random.split(key, steps)
                    )[1]

                zs = np.asarray(
                    chain(sstate, jax.random.key(len(cache)), n + 100)
                )
            cache[n] = [tuple(int(v) for v in z[real]) for z in zs[100:]]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_blocked_dense_matches_z_enumeration():
    """blocked_sweep_dense (rectangular doc-major fast path) has the same
    stationary z distribution as enumeration, beta fixed."""
    import dataclasses

    words = jnp.asarray([[0, 0, 1], [1, 1, 0]], jnp.int32)  # [D=2, L=3]
    mask = jnp.ones((2, 3))
    data = topic.dense_token_data(words, mask)
    K = 2
    state = topic.initialize(data, K, 2, jax.random.key(0),
                             alpha=0.8, eta=0.5, n_docs=2)
    state = dataclasses.replace(state, beta=jnp.asarray([0.5, 0.3, 0.2]))

    combos, scores = [], []
    for z in itertools.product(range(K), repeat=6):
        s = _state_with_z(state, data, z)
        combos.append(z)
        scores.append(float(topic.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def chain(s, key, n):
        def body(st, k):
            st = topic.blocked_sweep_dense(st, words, mask, k, doc_chunk=1)
            return st, st.z

        return jax.lax.scan(body, s, jax.random.split(key, n))

    cache = {}

    def sample_fn(n):
        if n not in cache:
            s0 = _state_with_z(
                state, data,
                np.asarray(jax.random.randint(
                    jax.random.key(len(cache) + 7), (6,), 0, K
                )),
            )
            _, zs = chain(s0, jax.random.key(len(cache) + 60), n + 100)
            cache[n] = [tuple(int(v) for v in z) for z in np.asarray(zs)[100:]]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_blocked_dense_masked_tokens_inert():
    """Padding tokens keep their z and contribute to no count table."""
    r = np.random.default_rng(3)
    words = jnp.asarray(r.integers(0, 10, (5, 4)), jnp.int32)
    mask = jnp.asarray((r.uniform(size=(5, 4)) < 0.7), jnp.float32)
    data = topic.dense_token_data(words, mask)
    s = topic.initialize(data, 3, 10, jax.random.key(0), n_docs=5)
    s2 = topic.blocked_sweep_dense(s, words, mask, jax.random.key(1))
    z0 = np.asarray(s.z).reshape(5, 4)
    z1 = np.asarray(s2.z).reshape(5, 4)
    m = np.asarray(mask)
    assert (z1[m == 0] == z0[m == 0]).all()
    assert float(np.asarray(s2.doc_topic).sum()) == float(m.sum())
    assert float(np.asarray(s2.topic_word).sum()) == float(m.sum())


def test_sharded_dense_matches_z_enumeration(cpu_devices):
    """Doc-sharded dense sweep on the 8-device mesh: same stationary z
    distribution as enumeration, beta fixed (2 docs over 2 shards)."""
    import dataclasses

    from common_tpu import parallel

    words = jnp.asarray([[0, 0, 1], [1, 1, 0]], jnp.int32)
    mask = jnp.ones((2, 3))
    data = topic.dense_token_data(words, mask)
    K = 2
    state = topic.initialize(data, K, 2, jax.random.key(0),
                             alpha=0.8, eta=0.5, n_docs=2)
    state = dataclasses.replace(state, beta=jnp.asarray([0.5, 0.3, 0.2]))

    combos, scores = [], []
    for z in itertools.product(range(K), repeat=6):
        s = _state_with_z(state, data, z)
        combos.append(z)
        scores.append(float(topic.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    mesh = parallel.make_mesh(chains=1, data=2, devices=cpu_devices[:2])
    cache = {}

    def sample_fn(n):
        if n not in cache:
            with jax.default_device(cpu_devices[0]):
                s0 = _state_with_z(
                    state, data,
                    np.asarray(jax.random.randint(
                        jax.random.key(len(cache) + 3), (6,), 0, K
                    )),
                )
                s0, w_s, m_s = topic.shard_dense_corpus(
                    mesh, s0, words, mask
                )
                sweep = topic.make_sharded_sweep_dense(mesh, s0, w_s, m_s)

                from functools import partial

                @partial(jax.jit, static_argnames=("n",))
                def chain(s, key, n):
                    def body(st, k):
                        st = sweep(st, w_s, m_s, k)
                        return st, st.z

                    return jax.lax.scan(body, s, jax.random.split(key, n))

                _, zs = chain(s0, jax.random.key(len(cache) + 40), n + 100)
            cache[n] = [tuple(int(v) for v in z) for z in np.asarray(zs)[100:]]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_blocked_chunked_matches_z_enumeration():
    """The chunked blocked sweep (config-4 memory path) has the same
    stationary z distribution as brute-force enumeration, beta fixed."""
    import dataclasses

    view, data = _tiny_corpus()
    K = 2
    state = topic.initialize(view, K, 2, jax.random.key(0),
                             alpha=0.8, eta=0.5)
    state = dataclasses.replace(state, beta=jnp.asarray([0.5, 0.3, 0.2]))

    combos, scores = [], []
    for z in itertools.product(range(K), repeat=6):
        s = _state_with_z(state, data, z)
        combos.append(z)
        scores.append(float(topic.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def chain(s, key, n):
        def body(st, k):
            st = topic.blocked_sweep(st, data, k, chunk=4)  # 6 tokens -> 2 chunks
            return st, st.z

        return jax.lax.scan(body, s, jax.random.split(key, n))

    cache = {}

    def sample_fn(n):
        if n not in cache:
            s0 = _state_with_z(
                state, data,
                np.asarray(jax.random.randint(
                    jax.random.key(len(cache) + 11), (6,), 0, K
                )),
            )
            _, zs = chain(s0, jax.random.key(len(cache) + 50), n + 100)
            cache[n] = [tuple(int(v) for v in z) for z in np.asarray(zs)[100:]]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_densify_corpus_bridge():
    """Ragged variadic corpus -> dense [D, L] + mask: padding inert,
    dense sweep counts match the ragged token count."""
    from common_tpu.data.variadic import variadic_dataview

    rows = [np.array([3, 1, 4]), np.array([1, 5]), np.array([9, 2, 6, 5])]
    view = variadic_dataview(rows)
    words, mask = topic.densify_corpus(view)
    assert words.shape == (3, 4)
    assert float(np.asarray(mask).sum()) == 9
    data = topic.dense_token_data(words, mask)
    s = topic.initialize(data, 2, 10, jax.random.key(0), n_docs=3)
    s2 = topic.blocked_sweep_dense(s, words, mask, jax.random.key(1))
    assert float(np.asarray(s2.topic_total).sum()) == 9
    assert float(np.asarray(s2.doc_topic).sum()) == 9
    # truncation path
    w2, m2 = topic.densify_corpus(view, max_len=3)
    assert w2.shape == (3, 3) and float(np.asarray(m2).sum()) == 8
