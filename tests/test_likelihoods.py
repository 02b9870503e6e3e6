"""Likelihood heads vs closed-form scipy references (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from deepsensornz_tpu.models.likelihoods import (
    BernoulliGamma,
    HeteroscedasticGaussian,
    LowRankGaussian,
    SpikesBeta,
    _softplus,
    get_likelihood,
)


def softplus(x):
    return np.log1p(np.exp(x)) + 1e-6


def test_cnp_matches_scipy(rng):
    B, M = 2, 5
    raw = rng.normal(size=(B, M, 2)).astype(np.float32)
    y = rng.normal(size=(B, M, 1)).astype(np.float32)
    mask = np.ones((B, M), np.float32)
    lik = HeteroscedasticGaussian(dim_y=1)
    got = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    mu = raw[..., 0]
    sigma = softplus(raw[..., 1])
    want = -st.norm.logpdf(y[..., 0], mu, sigma).mean()
    # TPU transcendentals round differently than scipy/f64
    rel = 1e-5 if jax.default_backend() == "cpu" else 5e-3
    assert got == pytest.approx(want, rel=rel)


def test_cnp_mask_equivalence(rng):
    """Padded batch NLL == ragged NLL."""
    lik = HeteroscedasticGaussian(dim_y=1)
    raw = rng.normal(size=(1, 4, 2)).astype(np.float32)
    y = rng.normal(size=(1, 4, 1)).astype(np.float32)
    full = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.ones((1, 4))))
    rawp = np.concatenate([raw, rng.normal(size=(1, 3, 2)).astype(np.float32)], 1)
    yp = np.concatenate([y, np.full((1, 3, 1), 9.0, np.float32)], 1)
    maskp = np.concatenate([np.ones((1, 4)), np.zeros((1, 3))], 1)
    padded = float(lik.nll(jnp.asarray(rawp), jnp.asarray(yp), jnp.asarray(maskp)))
    assert padded == pytest.approx(full, rel=1e-6)


def test_gnp_zero_rank_factors_match_diagonal(rng):
    M, R = 6, 4
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = np.zeros((1, M, lik.num_params()), np.float32)
    raw[..., 0] = rng.normal(size=(1, M))
    raw[..., 1] = rng.normal(size=(1, M))
    y = rng.normal(size=(1, M, 1)).astype(np.float32)
    mask = np.ones((1, M), np.float32)
    got = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    mu = raw[..., 0]
    var = softplus(raw[..., 1])  # gnp's 2nd channel is a VARIANCE
    want = -st.norm.logpdf(y[..., 0], mu, np.sqrt(var)).mean()
    assert got == pytest.approx(want, rel=1e-4)


def test_gnp_matches_dense_mvn(rng):
    M, R = 5, 3
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = rng.normal(size=(1, M, lik.num_params())).astype(np.float32)
    y = rng.normal(size=(1, M, 1)).astype(np.float32)
    mask = np.ones((1, M), np.float32)
    got = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    mu = raw[0, :, 0]
    var = softplus(raw[0, :, 1])
    F = raw[0, :, 2:] / np.sqrt(R)
    cov = np.diag(var) + F @ F.T
    want = -st.multivariate_normal.logpdf(y[0, :, 0], mu, cov) / M
    assert got == pytest.approx(want, rel=1e-4)


def test_gnp_mask_equivalence(rng):
    M, R = 4, 3
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = rng.normal(size=(1, M, lik.num_params())).astype(np.float32)
    y = rng.normal(size=(1, M, 1)).astype(np.float32)
    full = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.ones((1, M))))
    pad = 3
    rawp = np.concatenate([raw, rng.normal(size=(1, pad, lik.num_params())).astype(np.float32)], 1)
    yp = np.concatenate([y, np.full((1, pad, 1), 5.0, np.float32)], 1)
    maskp = np.concatenate([np.ones((1, M)), np.zeros((1, pad))], 1)
    padded = float(lik.nll(jnp.asarray(rawp), jnp.asarray(yp), jnp.asarray(maskp)))
    assert padded == pytest.approx(full, rel=1e-4)


def test_gnp_mean_std_and_samples(rng):
    M, R = 8, 4
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = rng.normal(size=(1, M, lik.num_params())).astype(np.float32)
    mean, std = lik.mean_std(jnp.asarray(raw))
    samples = lik.sample(jnp.asarray(raw), jax.random.key(0), 4000)
    emp_mean = np.asarray(samples).mean(0)
    emp_std = np.asarray(samples).std(0)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(emp_std, np.asarray(std), rtol=0.12)


def test_bernoulli_gamma_matches_scipy(rng):
    lik = BernoulliGamma(dim_y=1)
    raw = rng.normal(size=(1, 6, 3)).astype(np.float32)
    y = np.abs(rng.normal(size=(1, 6, 1))).astype(np.float32)
    y[0, :2, 0] = 0.0  # dry points
    mask = np.ones((1, 6), np.float32)
    got = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    p = 1 / (1 + np.exp(-raw[..., 0]))
    k = softplus(raw[..., 1])
    rate = softplus(raw[..., 2])
    ll = np.where(
        y[..., 0] > 1e-6,
        np.log(p) + st.gamma.logpdf(np.maximum(y[..., 0], 1e-6), k, scale=1 / rate),
        np.log(1 - p),
    )
    assert got == pytest.approx(-ll.mean(), rel=1e-4)


def test_bernoulli_gamma_moments(rng):
    lik = BernoulliGamma(dim_y=1)
    raw = rng.normal(size=(1, 4, 3)).astype(np.float32)
    mean, std = lik.mean_std(jnp.asarray(raw))
    samples = np.asarray(lik.sample(jnp.asarray(raw), jax.random.key(1), 20000))
    np.testing.assert_allclose(samples.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(samples.std(0), np.asarray(std), rtol=0.1)
    assert (samples >= 0).all()


def test_spikes_beta_matches_scipy(rng):
    lik = SpikesBeta(dim_y=1)
    raw = rng.normal(size=(1, 6, 5)).astype(np.float32)
    y = rng.random((1, 6, 1)).astype(np.float32)
    y[0, 0, 0] = 0.0
    y[0, 1, 0] = 1.0
    mask = np.ones((1, 6), np.float32)
    got = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    e = np.exp(raw[..., :3] - raw[..., :3].max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    alpha = softplus(raw[..., 3])
    beta = softplus(raw[..., 4])
    yv = y[..., 0]
    ll = np.where(
        yv < 1e-6,
        np.log(probs[..., 0]),
        np.where(
            yv > 1 - 1e-6,
            np.log(probs[..., 1]),
            np.log(probs[..., 2])
            + st.beta.logpdf(np.clip(yv, 1e-6, 1 - 1e-6), alpha, beta),
        ),
    )
    assert got == pytest.approx(-ll.mean(), rel=1e-3)


def test_spikes_beta_samples_bounded(rng):
    lik = SpikesBeta(dim_y=1)
    raw = rng.normal(size=(1, 4, 5)).astype(np.float32)
    s = np.asarray(lik.sample(jnp.asarray(raw), jax.random.key(2), 5000))
    assert (s >= 0).all() and (s <= 1).all()
    mean, std = lik.mean_std(jnp.asarray(raw))
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.04)
    np.testing.assert_allclose(s.std(0), np.asarray(std), atol=0.04)


def test_factory_channel_counts():
    assert get_likelihood("cnp").num_params() == 2
    assert get_likelihood("gnp", rank=32).num_params() == 34
    assert get_likelihood("bernoulli-gamma").num_params() == 3
    assert get_likelihood("cnp-spikes-beta").num_params() == 5


def test_gnp_survives_variance_collapse(rng):
    """Training can drive the noise variance toward zero; the floored
    capacitance must stay finite (NaN Cholesky observed on hardware)."""
    import jax

    M, R = 256, 64
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = rng.normal(size=(1, M, lik.num_params())).astype(np.float32)
    raw[..., 1] = -50.0  # softplus → ~0 variance
    raw[..., 2:] *= 30.0  # large factors
    y = rng.normal(size=(1, M, 1)).astype(np.float32)
    mask = np.ones((1, M), np.float32)
    nll = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    assert np.isfinite(nll)
    g = jax.grad(lambda r: lik.nll(r, jnp.asarray(y), jnp.asarray(mask)))(
        jnp.asarray(raw))
    assert np.isfinite(np.asarray(g)).all()
    mean, std = lik.mean_std(jnp.asarray(raw))
    assert (np.asarray(std) > 0).all() and np.isfinite(np.asarray(std)).all()


def test_gnp_nll_bounded_below(rng):
    """With the variance floor and non-negative quad, per-target NLL cannot
    fall below the analytic floor 0.5·(log floor + log 2π) ≈ −3.69 — the
    degenerate 'NLL −900' cancellation regime is closed."""
    floor = 0.5 * (np.log(1e-4) + np.log(2 * np.pi))
    M, R = 128, 64
    lik = LowRankGaussian(dim_y=1, rank=R)
    for seed in range(5):
        r2 = np.random.default_rng(seed)
        raw = (r2.standard_normal((1, M, lik.num_params())) * 15).astype(np.float32)
        y = r2.standard_normal((1, M, 1)).astype(np.float32)
        nll = float(lik.nll(jnp.asarray(raw), jnp.asarray(y),
                            jnp.ones((1, M), np.float32)))
        assert nll >= floor - 1e-3, (seed, nll)


def test_gnp_capacitance_overflow_fallback(rng):
    """Factors large enough to break the f32 Cholesky must fall back to the
    diagonal likelihood (finite NLL and grads), not NaN."""
    import jax

    M, R = 192, 64
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = rng.normal(size=(1, M, lik.num_params())).astype(np.float32)
    raw[..., 1] = -50.0        # variance at the floor
    raw[..., 2:] = rng.normal(size=(1, M, R)).astype(np.float32) * 1e4
    y = rng.normal(size=(1, M, 1)).astype(np.float32)
    mask = np.ones((1, M), np.float32)
    nll = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    assert np.isfinite(nll)
    g = jax.grad(lambda r: lik.nll(r, jnp.asarray(y), jnp.asarray(mask)))(
        jnp.asarray(raw))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("name,kw", [
    ("cnp", {}),
    ("gnp", {"rank": 4}),
    ("bernoulli-gamma", {}),
    ("cnp-spikes-beta", {}),
])
def test_fully_masked_task_contributes_nothing(rng, name, kw):
    """A fully-masked (batch-padding) task must not shift the batch NLL —
    neither by a constant (gnp's 0.5·log 2π) nor by diluting the mean."""
    from deepsensornz_tpu.models.likelihoods import get_likelihood

    lik = get_likelihood(name, dim_y=1, **kw)
    M = 12
    raw = jnp.asarray(rng.normal(size=(1, M, lik.num_params())), jnp.float32)
    if name in ("bernoulli-gamma", "cnp-spikes-beta"):
        y = jnp.asarray(rng.uniform(0.05, 0.9, size=(1, M, 1)), jnp.float32)
    else:
        y = jnp.asarray(rng.normal(size=(1, M, 1)), jnp.float32)
    mask = jnp.ones((1, M), jnp.float32)
    solo = float(lik.nll(raw, y, mask))

    # append a fully-masked clone task
    raw2 = jnp.concatenate([raw, raw], 0)
    y2 = jnp.concatenate([y, y], 0)
    mask2 = jnp.concatenate([mask, jnp.zeros_like(mask)], 0)
    padded = float(lik.nll(raw2, y2, mask2))
    assert padded == pytest.approx(solo, rel=1e-6)


def test_cdf_bounds_all_heads():
    """cdf_bounds: within [0,1], monotone in y, matches the empirical CDF
    of the head's own sampler (the contract behind randomized-PIT)."""
    import jax
    import jax.numpy as jnp

    from deepsensornz_tpu.models.likelihoods import get_likelihood

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    B, M = 2, 5
    for name in ("cnp", "gnp", "bernoulli-gamma", "cnp-spikes-beta"):
        lik = get_likelihood(name, dim_y=1)
        raw = jnp.asarray(rng.normal(size=(B, M, lik.num_params())), jnp.float32)
        ys = jnp.asarray(rng.uniform(0.05, 0.9, size=(B, M, 1)), jnp.float32)
        lo, hi = lik.cdf_bounds(raw, ys)
        lo, hi = np.asarray(lo), np.asarray(hi)
        assert (lo >= -1e-6).all() and (hi <= 1 + 1e-6).all()
        assert (hi >= lo - 1e-6).all()
        # monotone: F at a larger y dominates
        lo2, hi2 = lik.cdf_bounds(raw, ys + 0.05)
        assert (np.asarray(hi2) >= hi - 1e-5).all()
        # empirical check against the head's own sampler (mid-point of the
        # bracket for mixed heads)
        s = np.asarray(lik.sample(raw, key, 4000))[..., 0]  # (n, B, M)
        emp = (s <= np.asarray(ys)[..., 0][None]).mean(0)
        mid = 0.5 * (lo + hi)[..., 0]
        np.testing.assert_allclose(emp, mid, atol=0.06)

    # point masses: bernoulli-gamma at y=0 brackets exactly [0, 1-p]
    lik = get_likelihood("bernoulli-gamma")
    raw = jnp.asarray(rng.normal(size=(1, 3, 3)), jnp.float32)
    lo, hi = lik.cdf_bounds(raw, jnp.zeros((1, 3, 1)))
    p = jax.nn.sigmoid(raw[..., 0])
    np.testing.assert_allclose(np.asarray(lo)[..., 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(hi)[..., 0],
                               1.0 - np.asarray(p), atol=1e-5)


def test_rescale_raw_all_heads():
    """rescale_raw: mean unchanged, spread ×s, point masses untouched —
    verified against each head's own moments and sampler."""
    import jax
    import jax.numpy as jnp

    from deepsensornz_tpu.models.likelihoods import get_likelihood

    rng = np.random.default_rng(1)
    s = jnp.asarray(2.0, jnp.float32)
    # Gaussian heads: TOTAL std scales exactly by s, mean unchanged
    for name in ("cnp", "gnp"):
        lik = get_likelihood(name, dim_y=1)
        raw = jnp.asarray(rng.normal(size=(2, 6, lik.num_params())), jnp.float32)
        raw2 = lik.rescale_raw(raw, s)
        m1, sd1 = lik.mean_std(raw)
        m2, sd2 = lik.mean_std(raw2)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(sd2) / np.maximum(np.asarray(sd1), 1e-9), 2.0,
            rtol=1e-3, err_msg=name)
        # identity at s=1
        raw1 = lik.rescale_raw(raw, jnp.asarray(1.0, jnp.float32))
        _, sd3 = lik.mean_std(raw1)
        np.testing.assert_allclose(np.asarray(sd3), np.asarray(sd1),
                                   rtol=2e-4, err_msg=name)

    # Mixed heads: the BODY spread scales (point masses cannot), body mean
    # fixed — check the component distributions directly
    lik = get_likelihood("bernoulli-gamma")
    raw = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
    raw2 = lik.rescale_raw(raw, s)
    p1, k1, r1 = lik._split(raw)
    p2, k2, r2 = lik._split(raw2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k2 / r2), np.asarray(k1 / r1),
                               rtol=1e-3)  # gamma mean fixed
    np.testing.assert_allclose(                     # gamma std x2
        np.asarray(jnp.sqrt(k2) / r2) / np.asarray(jnp.sqrt(k1) / r1), 2.0,
        rtol=1e-3)

    lik = get_likelihood("cnp-spikes-beta")
    raw = jnp.asarray(rng.normal(size=(2, 6, 5)), jnp.float32)
    # concentrated body (α+β ≫ 1): the ×s spread scaling is asymptotic in
    # the concentration (the +1 in the Beta variance denominator); at tiny
    # α+β the map is still monotone-widening, which is all the PIT
    # bisection fit needs
    raw = raw.at[..., 3:5].add(4.0)
    raw2 = lik.rescale_raw(raw, s)
    pr1, a1, b1 = lik._split(raw)
    pr2, a2, b2 = lik._split(raw2)
    np.testing.assert_allclose(np.asarray(a2 / (a2 + b2)),
                               np.asarray(a1 / (a1 + b1)), rtol=1e-3)
    v1 = np.asarray(a1 * b1 / (jnp.square(a1 + b1) * (a1 + b1 + 1.0)))
    v2 = np.asarray(a2 * b2 / (jnp.square(a2 + b2) * (a2 + b2 + 1.0)))
    # x4 variance up to the +1 denominator term
    np.testing.assert_allclose(np.sqrt(v2 / v1), 2.0, rtol=0.35)

    # point masses preserved: bernoulli-gamma dry probability identical
    lik = get_likelihood("bernoulli-gamma")
    raw = jnp.asarray(rng.normal(size=(1, 4, 3)), jnp.float32)
    raw2 = lik.rescale_raw(raw, s)
    np.testing.assert_allclose(np.asarray(raw2[..., 0]),
                               np.asarray(raw[..., 0]))
    # spikes-beta spike logits identical
    lik = get_likelihood("cnp-spikes-beta")
    raw = jnp.asarray(rng.normal(size=(1, 4, 5)), jnp.float32)
    raw2 = lik.rescale_raw(raw, s)
    np.testing.assert_allclose(np.asarray(raw2[..., :3]),
                               np.asarray(raw[..., :3]))


# --------------------------------------------------------------------------
# CRPS (proper scoring; Validate.crps builds on these)
# --------------------------------------------------------------------------


def test_crps_gaussian_known_value(rng):
    """CRPS(N(0,1), 0) = 2φ(0) − 1/√π ≈ 0.23370 (Gneiting & Raftery 2007)."""
    lik = HeteroscedasticGaussian(dim_y=1)
    from deepsensornz_tpu.models.likelihoods import _inv_softplus

    raw = np.zeros((1, 1, 2), np.float32)
    raw[..., 1] = np.asarray(_inv_softplus(jnp.asarray(1.0)))  # sigma = 1
    got = float(lik.crps(jnp.asarray(raw), jnp.zeros((1, 1, 1)), None)[0, 0, 0])
    want = 2.0 / np.sqrt(2 * np.pi) - 1.0 / np.sqrt(np.pi)
    assert got == pytest.approx(want, rel=1e-4)


def test_crps_gaussian_closed_form_matches_sampled(rng):
    """The base class's sampled energy-form estimator converges to the
    Gaussian closed form."""
    from deepsensornz_tpu.models.likelihoods import Likelihood

    B, M = 2, 4
    raw = rng.normal(size=(B, M, 2)).astype(np.float32)
    y = rng.normal(size=(B, M, 1)).astype(np.float32)
    lik = HeteroscedasticGaussian(dim_y=1)
    closed = np.asarray(lik.crps(jnp.asarray(raw), jnp.asarray(y), None))
    sampled = np.asarray(Likelihood.crps(
        lik, jnp.asarray(raw), jnp.asarray(y), jax.random.key(0), n=4096))
    np.testing.assert_allclose(sampled, closed, rtol=0.08, atol=0.02)


def test_crps_gnp_marginal(rng):
    """gnp CRPS uses the low-rank-inclusive marginal std."""
    R, B, M = 3, 2, 4
    lik = LowRankGaussian(dim_y=1, rank=R)
    raw = rng.normal(size=(B, M, lik.num_params())).astype(np.float32) * 0.3
    y = rng.normal(size=(B, M, 1)).astype(np.float32)
    got = np.asarray(lik.crps(jnp.asarray(raw), jnp.asarray(y), None))
    mu, std = (np.asarray(a) for a in lik.mean_std(jnp.asarray(raw)))
    z = (y - mu) / std
    want = std * (z * (2 * st.norm.cdf(z) - 1) + 2 * st.norm.pdf(z)
                  - 1 / np.sqrt(np.pi))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_crps_is_proper_for_gaussian(rng):
    """A matched predictive scores better (lower expected CRPS) than a
    biased or overconfident one against the same truth draws."""
    lik = HeteroscedasticGaussian(dim_y=1)
    from deepsensornz_tpu.models.likelihoods import _inv_softplus

    n = 4000
    y = rng.normal(size=(1, n, 1)).astype(np.float32)  # truth ~ N(0, 1)

    def score(mu, sigma):
        raw = np.zeros((1, n, 2), np.float32)
        raw[..., 0] = mu
        raw[..., 1] = float(np.asarray(_inv_softplus(jnp.asarray(sigma))))
        return float(np.mean(np.asarray(
            lik.crps(jnp.asarray(raw), jnp.asarray(y), None))))

    s_true = score(0.0, 1.0)
    assert s_true < score(1.0, 1.0)   # biased mean
    assert s_true < score(0.0, 0.2)   # overconfident
    assert s_true < score(0.0, 3.0)   # underconfident


def test_crps_sampled_mixed_heads_finite(rng):
    """Sampled CRPS stays finite and non-negative-in-expectation for the
    point-mass heads (the estimator is unbiased, so tiny negatives per
    point are possible; means must be positive)."""
    B, M = 2, 6
    for lik, k in ((BernoulliGamma(), 3), (SpikesBeta(), 5)):
        raw = rng.normal(size=(B, M, k)).astype(np.float32)
        y = np.abs(rng.normal(size=(B, M, 1))).astype(np.float32)
        if isinstance(lik, SpikesBeta):
            y = np.clip(y, 0.0, 1.0)
        got = np.asarray(lik.crps(jnp.asarray(raw), jnp.asarray(y),
                                  jax.random.key(1), n=256))
        assert np.isfinite(got).all()
        assert float(got.mean()) > 0.0
