"""Likelihood heads: parameter layout, masked NLL, moments, sampling.

Rebuilds the four output distributions the reference selects per variable
(``nzdownscale/dataprocess/config.py:162-169``):

- ``cnp``             — heteroscedastic diagonal Gaussian,
- ``gnp``             — low-rank + diagonal multivariate Gaussian (joint
                        prediction over all targets; reference default,
                        ``config.py:2685-2689``),
- ``bernoulli-gamma`` — mixed point-mass-at-0 + Gamma body (precipitation),
- ``cnp-spikes-beta`` — point masses at {0, 1} + Beta body (humidity).

Every head consumes a raw parameter block of shape (..., M, K) produced by
the ConvNP decoder, a target block (..., M, dy) and a validity mask
(..., M). NLLs are **per-target normalised** over valid targets — parity
with ``model.loss_fn(task, normalise=True)`` (``train.py:370``). Padded
targets contribute exactly zero, which is what makes fixed-shape batches
(replacing the reference's station-count bucketing, ``train.py:448-475``)
semantically identical to ragged ones.

All math is float32; the low-rank Gaussian uses a Woodbury/Cholesky solve on
the small R×R capacitance matrix so cost is O(M·R²), never O(M³).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_EPS = 1e-6
_LOG_2PI = 1.8378770664093453


def _softplus(x):
    return jax.nn.softplus(x) + _EPS


def _inv_softplus(y):
    """Inverse of ``_softplus`` (traced-safe): x with softplus(x)+eps = y."""
    z = jnp.maximum(y - _EPS, 1e-8)
    # log(expm1(z)) is stable below ~20; above, softplus(x) ≈ x
    return jnp.where(z < 20.0, jnp.log(jnp.expm1(jnp.maximum(z, 1e-8))), z)


@dataclasses.dataclass(frozen=True)
class Likelihood:
    """Interface: subclasses define layout + math for one output family."""

    dim_y: int = 1

    name: str = "base"

    def num_params(self) -> int:
        raise NotImplementedError

    def nll(self, raw: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Mean negative log-likelihood per valid target. raw: (B,M,K)."""
        raise NotImplementedError

    def mean_std(self, raw: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Predictive mean and std, shapes (..., M, dy)."""
        raise NotImplementedError

    def sample(self, raw: jnp.ndarray, rng: jax.Array, n: int) -> jnp.ndarray:
        """n joint samples, shape (n, ..., M, dy)."""
        raise NotImplementedError

    def cdf_bounds(self, raw: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(F(y⁻), F(y)) of the predictive distribution at each target —
        the two coincide for continuous heads and bracket the point masses
        of the mixed heads. Powers the randomized-PIT calibration diagnostic
        (``Validate.pit_stats``): u ~ U(F(y⁻), F(y)) is Uniform(0,1) iff
        the predictive distribution is calibrated, for ANY head — the
        z-score diagnostic is only meaningful for Gaussian heads."""
        raise NotImplementedError

    def rescale_raw(self, raw: jnp.ndarray, s) -> jnp.ndarray:
        """Reparameterise ``raw`` so the predictive SPREAD scales by ``s``
        with the mean unchanged — the post-hoc recalibration map behind the
        model artifact's ``std_scale``. Exact per head: Gaussian σ·s;
        low-rank (√var)·s and factors·s; Gamma body k/s², rate/s² (mean
        k/rate fixed); Beta body α/s², β/s² (mean α/(α+β) fixed, std ≈ ×s).
        Point masses (dry probability, humidity spikes) are untouched.
        Applied by Predictor / AR / pit_stats, NEVER during training."""
        raise NotImplementedError

    def crps(self, raw: jnp.ndarray, y: jnp.ndarray, rng: jax.Array,
             n: int = 64) -> jnp.ndarray:
        """Marginal CRPS per target point, shape (..., M, dy), in the
        head's (normalised) units — a PROPER score of the full predictive
        distribution (RMSE only scores the mean; the reference's notebooks
        eyeball calibration but never score it,
        ``validation_notebook.py:422-492``).

        Default: the sample-based energy form
        ``CRPS(F, y) = E|X−y| − ½·E|X−X′|`` with the unbiased pairwise
        U-statistic computed from SORTED samples in O(n log n):
        ``Σ_{i≠j}|x_i−x_j| / (n(n−1)) = 2·Σ_k (2k−n+1)·x_(k) / (n(n−1))``
        (k zero-based). Gaussian heads override with the closed form.
        Valid for the mixed heads too (point masses just repeat samples).
        """
        xs = self.sample(raw, rng, n)  # (n, ..., M, dy)
        term1 = jnp.mean(jnp.abs(xs - y.astype(jnp.float32)[None]), axis=0)
        xs_sorted = jnp.sort(xs, axis=0)
        k = jnp.arange(n, dtype=jnp.float32)
        w = (2.0 * k - n + 1.0) / (n * (n - 1.0))
        pair = jnp.tensordot(w, xs_sorted, axes=(0, 0))
        return term1 - pair

    @staticmethod
    def _gaussian_crps(mu, sigma, y):
        """Closed-form CRPS of N(mu, sigma²) at y (Gneiting & Raftery 2007):
        σ·[z(2Φ(z)−1) + 2φ(z) − 1/√π]."""
        z = (y.astype(jnp.float32) - mu) / sigma
        phi = jnp.exp(-0.5 * jnp.square(z)) / jnp.sqrt(2.0 * jnp.pi)
        Phi = jax.scipy.stats.norm.cdf(z)
        return sigma * (z * (2.0 * Phi - 1.0) + 2.0 * phi
                        - 1.0 / jnp.sqrt(jnp.pi))

    def _norm(self, pointwise_nll: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # batch mean weighted by per-task validity: fully-masked tasks
        # (batch padding, `parallel/mesh.py::pad_batch_to_multiple`) must
        # contribute nothing — neither a constant nor a dilution — so the
        # reported loss matches the unpadded batch exactly
        m = mask.astype(jnp.float32)
        n_valid = jnp.sum(m, axis=-1)
        per_task = jnp.sum(pointwise_nll * m, axis=-1) / jnp.maximum(n_valid, 1.0)
        has_valid = (n_valid > 0).astype(jnp.float32)
        return jnp.sum(per_task * has_valid) / jnp.maximum(jnp.sum(has_valid), 1.0)


# ---------------------------------------------------------------------------
# cnp — heteroscedastic diagonal Gaussian
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HeteroscedasticGaussian(Likelihood):
    name: str = "cnp"

    def num_params(self) -> int:
        return 2 * self.dim_y

    def _split(self, raw):
        mu = raw[..., : self.dim_y]
        sigma = _softplus(raw[..., self.dim_y: 2 * self.dim_y])
        return mu, sigma

    def nll(self, raw, y, mask):
        mu, sigma = self._split(raw)
        z = (y.astype(jnp.float32) - mu) / sigma
        point = 0.5 * (jnp.square(z) + 2.0 * jnp.log(sigma) + _LOG_2PI)
        return self._norm(jnp.sum(point, axis=-1), mask)

    def mean_std(self, raw):
        return self._split(raw)

    def sample(self, raw, rng, n):
        mu, sigma = self._split(raw)
        eps = jax.random.normal(rng, (n,) + mu.shape, dtype=jnp.float32)
        return mu[None] + sigma[None] * eps

    def cdf_bounds(self, raw, y):
        mu, sigma = self._split(raw)
        f = jax.scipy.stats.norm.cdf(y.astype(jnp.float32), mu, sigma)
        return f, f

    def crps(self, raw, y, rng=None, n=0):
        mu, sigma = self._split(raw)
        return self._gaussian_crps(mu, sigma, y)

    def rescale_raw(self, raw, s):
        dy = self.dim_y
        mu = raw[..., :dy]
        sigma = _softplus(raw[..., dy: 2 * dy]) * s
        return jnp.concatenate([mu, _inv_softplus(sigma)], axis=-1)


# ---------------------------------------------------------------------------
# gnp — low-rank + diagonal multivariate Gaussian (joint over targets)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LowRankGaussian(Likelihood):
    """Σ = diag(σ²) + FFᵀ with F ∈ R^{M·dy × R}. Woodbury NLL, O(M·R²)."""

    rank: int = 64
    name: str = "gnp"

    def num_params(self) -> int:
        return self.dim_y * (2 + self.rank)

    def _split(self, raw):
        dy, r = self.dim_y, self.rank
        mu = raw[..., :dy]
        # noise VARIANCE after softplus, floored: keeps FᵀD⁻¹F conditioned
        # in f32 (unfloored training collapsed the noise and produced NaN
        # Cholesky factors on hardware) — consistent across NLL/moments/
        # sampling so the floor IS the model
        var = jnp.maximum(_softplus(raw[..., dy: 2 * dy]), 1e-4)
        fac = raw[..., 2 * dy:].reshape(raw.shape[:-1] + (dy, r)) / jnp.sqrt(float(r))
        return mu, var, fac

    def _flatten(self, raw, mask):
        """Flatten (…,M,dy) → (…, M·dy) with mask-neutralised pads."""
        mu, var, fac = self._split(raw)
        m = mask.astype(jnp.float32)[..., None]
        B = raw.shape[:-2]
        M = raw.shape[-2]
        n = M * self.dim_y
        mu = (mu * m).reshape(B + (n,))
        var = jnp.where(m > 0, var, 1.0).reshape(B + (n,))
        fac = (fac * m[..., None]).reshape(B + (n, self.rank))
        mflat = jnp.broadcast_to(m, m.shape[:-1] + (self.dim_y,)).reshape(B + (n,))
        return mu, var, fac, mflat

    def nll(self, raw, y, mask):
        mu, var, fac, mflat = self._flatten(raw, mask)
        B = raw.shape[:-2]
        yf = (y.astype(jnp.float32).reshape(B + (-1,)) ) * mflat
        r = (yf - mu) * mflat
        dinv = 1.0 / var
        dinv_r = dinv * r
        ft_dinv_r = jnp.einsum("...nr,...n->...r", fac, dinv_r)
        cap = jnp.einsum(
            "...nr,...n,...ns->...rs", fac, dinv, fac,
            preferred_element_type=jnp.float32,
        )
        # scale-invariant jitter keeps the Cholesky PSD under f32 rounding
        diag_scale = 1.0 + jnp.mean(jnp.diagonal(cap, axis1=-2, axis2=-1),
                                    axis=-1, keepdims=True)[..., None]
        eye = jnp.eye(self.rank, dtype=jnp.float32)
        cap = cap + eye * (1.0 + 1e-6 * diag_scale)
        # the capacitance can exceed f32 Cholesky conditioning when learned
        # factors grow against a floored noise (condition ~1/ε_f32) —
        # detect failure on a probe pass and fall back to the DIAGONAL-only
        # likelihood for that task. The second cholesky runs on a sanitised
        # input so NaN never enters the differentiated graph (where() would
        # otherwise leak NaN cotangents from the unselected branch).
        probe = jnp.linalg.cholesky(cap)
        cap_ok = jnp.all(
            jnp.isfinite(jnp.diagonal(probe, axis1=-2, axis2=-1)), axis=-1
        )
        cap_safe = jnp.where(cap_ok[..., None, None], cap, eye)
        chol = jnp.linalg.cholesky(cap_safe)
        sol = jax.scipy.linalg.cho_solve((chol, True), ft_dinv_r[..., None])[..., 0]
        # quad = rᵀΣ⁻¹r is mathematically ≥ 0; when FFᵀ dominates the noise
        # the Woodbury form subtracts two nearly-equal large numbers and f32
        # cancellation can push it (very) negative — an exploitable hole the
        # optimizer dives into (observed: "NLL −900"). Clamp to the cone.
        corr = jnp.where(cap_ok, jnp.sum(ft_dinv_r * sol, axis=-1), 0.0)
        quad = jnp.maximum(jnp.sum(r * dinv_r, axis=-1) - corr, 0.0)
        logdet_lr = jnp.where(
            cap_ok,
            2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1),
            0.0,
        )
        logdet = jnp.sum(jnp.log(var) * mflat, axis=-1) + logdet_lr
        n_valid_raw = jnp.sum(mflat, axis=-1)
        n_valid = jnp.maximum(n_valid_raw, 1.0)
        # use the RAW count for the 2π constant so a fully-masked (padded)
        # task contributes exactly zero rather than 0.5·log 2π, and weight
        # the batch mean by per-task validity (same reason as `_norm`)
        nll = 0.5 * (quad + logdet + n_valid_raw * _LOG_2PI)
        has_valid = (n_valid_raw > 0).astype(jnp.float32)
        per_task = nll / n_valid
        return jnp.sum(per_task * has_valid) / jnp.maximum(jnp.sum(has_valid), 1.0)

    def mean_std(self, raw):
        mu, var, fac = self._split(raw)
        std = jnp.sqrt(var + jnp.sum(jnp.square(fac), axis=-1))
        return mu, std

    def sample(self, raw, rng, n):
        mu, var, fac = self._split(raw)
        k1, k2 = jax.random.split(rng)
        e1 = jax.random.normal(k1, (n,) + mu.shape, jnp.float32)
        e2 = jax.random.normal(k2, (n,) + raw.shape[:-2] + (self.rank,), jnp.float32)
        corr = jnp.einsum("...mdr,s...r->s...md", fac, e2)
        return mu[None] + jnp.sqrt(var)[None] * e1 + corr

    def cdf_bounds(self, raw, y):
        # MARGINAL predictive cdf (per-target; the joint structure enters
        # the NLL, not the pointwise calibration diagnostic)
        mu, std = self.mean_std(raw)
        f = jax.scipy.stats.norm.cdf(y.astype(jnp.float32), mu, std)
        return f, f

    def crps(self, raw, y, rng=None, n=0):
        # marginal CRPS: each target's marginal is Gaussian with the
        # low-rank-inclusive std from mean_std (joint structure enters the
        # NLL, not the pointwise score — same stance as cdf_bounds)
        mu, std = self.mean_std(raw)
        return self._gaussian_crps(mu, std, y)

    def rescale_raw(self, raw, s):
        dy, r = self.dim_y, self.rank
        mu = raw[..., :dy]
        # var·s² and factors·s scale the whole covariance by s² (marginal
        # std ×s, correlation structure preserved); the 1e-4 noise floor in
        # _split re-applies downstream
        var = jnp.maximum(_softplus(raw[..., dy: 2 * dy]), 1e-4) * jnp.square(s)
        fac = raw[..., 2 * dy:] * s  # raw factors are linear (÷√r in _split)
        return jnp.concatenate([mu, _inv_softplus(var), fac], axis=-1)


# ---------------------------------------------------------------------------
# bernoulli-gamma — precipitation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BernoulliGamma(Likelihood):
    """P(y=0)=1-p; y>0 ~ Gamma(k, rate). dim_y must be 1."""

    name: str = "bernoulli-gamma"

    def num_params(self) -> int:
        return 3 * self.dim_y

    def _split(self, raw):
        p = jax.nn.sigmoid(raw[..., 0])
        k = _softplus(raw[..., 1])
        rate = _softplus(raw[..., 2])
        return p, k, rate

    def nll(self, raw, y, mask):
        p, k, rate = self._split(raw)
        yv = y[..., 0].astype(jnp.float32)
        wet = yv > _EPS
        y_safe = jnp.maximum(yv, _EPS)
        log_gamma = (
            k * jnp.log(rate) + (k - 1.0) * jnp.log(y_safe) - rate * y_safe
            - jax.lax.lgamma(k)
        )
        log_p = jnp.log(jnp.clip(p, _EPS, 1 - _EPS))
        log_1mp = jnp.log(jnp.clip(1.0 - p, _EPS, 1 - _EPS))
        point = -jnp.where(wet, log_p + log_gamma, log_1mp)
        return self._norm(point, mask)

    def mean_std(self, raw):
        p, k, rate = self._split(raw)
        mean_wet = k / rate
        var_wet = k / jnp.square(rate)
        mean = p * mean_wet
        var = p * var_wet + p * (1.0 - p) * jnp.square(mean_wet)
        return mean[..., None], jnp.sqrt(var)[..., None]

    def sample(self, raw, rng, n):
        p, k, rate = self._split(raw)
        k1, k2 = jax.random.split(rng)
        wet = jax.random.bernoulli(k1, jnp.broadcast_to(p, (n,) + p.shape))
        gam = jax.random.gamma(k2, jnp.broadcast_to(k, (n,) + k.shape)) / rate[None]
        return (jnp.where(wet, gam, 0.0))[..., None]

    def cdf_bounds(self, raw, y):
        p, k, rate = self._split(raw)
        yv = y[..., 0].astype(jnp.float32)
        dry = yv <= _EPS
        y_safe = jnp.maximum(yv, _EPS)
        # F(y) = (1−p) + p·P(k, rate·y) for y > 0; point mass 1−p at 0
        gamma_cdf = jax.lax.igamma(k, rate * y_safe)
        f_wet = (1.0 - p) + p * gamma_cdf
        lo = jnp.where(dry, 0.0, f_wet)
        hi = jnp.where(dry, 1.0 - p, f_wet)
        return lo[..., None], hi[..., None]

    def rescale_raw(self, raw, s):
        # Gamma(k/s², rate/s²): mean k/rate unchanged, std × s; the dry
        # probability (a point mass, already PIT-exact) is untouched
        s2 = jnp.square(s)
        k = _softplus(raw[..., 1]) / s2
        rate = _softplus(raw[..., 2]) / s2
        return jnp.stack(
            [raw[..., 0], _inv_softplus(k), _inv_softplus(rate)], axis=-1)

    def body_interval(self, raw):
        """(F_lo, F_hi) of the continuous (Gamma) body in cdf space:
        [1−p, 1]. Body-conditional PIT (u − F_lo)/(F_hi − F_lo) isolates
        the part a spread rescale can actually calibrate."""
        p = jax.nn.sigmoid(raw[..., 0])
        return (1.0 - p)[..., None], jnp.ones_like(p)[..., None]


# ---------------------------------------------------------------------------
# cnp-spikes-beta — bounded humidity in [0, 1]
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SpikesBeta(Likelihood):
    """Mixture: spike at 0 (w.p. p0), spike at 1 (w.p. p1), Beta(α,β) body."""

    name: str = "cnp-spikes-beta"

    def num_params(self) -> int:
        return 5 * self.dim_y

    def _split(self, raw):
        logits = raw[..., :3]
        probs = jax.nn.softmax(logits, axis=-1)  # (p0, p1, p_body)
        alpha = _softplus(raw[..., 3])
        beta = _softplus(raw[..., 4])
        return probs, alpha, beta

    def nll(self, raw, y, mask):
        probs, alpha, beta = self._split(raw)
        yv = jnp.clip(y[..., 0].astype(jnp.float32), 0.0, 1.0)
        at0 = yv < _EPS
        at1 = yv > 1.0 - _EPS
        y_safe = jnp.clip(yv, _EPS, 1.0 - _EPS)
        betaln = (
            jax.lax.lgamma(alpha) + jax.lax.lgamma(beta) - jax.lax.lgamma(alpha + beta)
        )
        log_beta_pdf = (
            (alpha - 1.0) * jnp.log(y_safe) + (beta - 1.0) * jnp.log1p(-y_safe) - betaln
        )
        lp = jnp.log(jnp.clip(probs, _EPS, 1.0))
        point = -jnp.where(
            at0, lp[..., 0], jnp.where(at1, lp[..., 1], lp[..., 2] + log_beta_pdf)
        )
        return self._norm(point, mask)

    def mean_std(self, raw):
        probs, alpha, beta = self._split(raw)
        mean_body = alpha / (alpha + beta)
        var_body = alpha * beta / (jnp.square(alpha + beta) * (alpha + beta + 1.0))
        mean = probs[..., 1] + probs[..., 2] * mean_body
        ex2 = probs[..., 1] + probs[..., 2] * (var_body + jnp.square(mean_body))
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
        return mean[..., None], jnp.sqrt(var)[..., None]

    def sample(self, raw, rng, n):
        probs, alpha, beta = self._split(raw)
        k1, k2 = jax.random.split(rng)
        comp = jax.random.categorical(
            k1, jnp.log(jnp.clip(probs, _EPS, 1.0)), shape=(n,) + probs.shape[:-1]
        )
        body = jax.random.beta(
            k2, jnp.broadcast_to(alpha, (n,) + alpha.shape),
            jnp.broadcast_to(beta, (n,) + beta.shape),
        )
        out = jnp.where(comp == 0, 0.0, jnp.where(comp == 1, 1.0, body))
        return out[..., None]

    def cdf_bounds(self, raw, y):
        probs, alpha, beta = self._split(raw)
        p0, p1, pb = probs[..., 0], probs[..., 1], probs[..., 2]
        yv = jnp.clip(y[..., 0].astype(jnp.float32), 0.0, 1.0)
        at0 = yv < _EPS
        at1 = yv > 1.0 - _EPS
        y_safe = jnp.clip(yv, _EPS, 1.0 - _EPS)
        beta_cdf = jax.scipy.special.betainc(alpha, beta, y_safe)
        f_body = p0 + pb * beta_cdf
        lo = jnp.where(at0, 0.0, jnp.where(at1, p0 + pb, f_body))
        hi = jnp.where(at0, p0, jnp.where(at1, 1.0, f_body))
        return lo[..., None], hi[..., None]

    def rescale_raw(self, raw, s):
        # Beta(α/s², β/s²): mean α/(α+β) unchanged, std ≈ × s (exact up to
        # the +1 in the Beta variance denominator); spike masses untouched
        s2 = jnp.square(s)
        alpha = _softplus(raw[..., 3]) / s2
        beta = _softplus(raw[..., 4]) / s2
        return jnp.concatenate(
            [raw[..., :3], _inv_softplus(alpha)[..., None],
             _inv_softplus(beta)[..., None]], axis=-1)

    def body_interval(self, raw):
        """(F_lo, F_hi) of the continuous (Beta) body in cdf space:
        [p0, p0 + p_body] (the cdf jumps p0 at 0 and p1 at 1)."""
        probs, _, _ = self._split(raw)
        lo = probs[..., 0]
        hi = probs[..., 0] + probs[..., 2]
        return lo[..., None], hi[..., None]


_REGISTRY = {
    "cnp": HeteroscedasticGaussian,
    "het": HeteroscedasticGaussian,
    "gnp": LowRankGaussian,
    "lowrank": LowRankGaussian,
    "bernoulli-gamma": BernoulliGamma,
    "cnp-spikes-beta": SpikesBeta,
}


def get_likelihood(name: str, dim_y: int = 1, **kw) -> Likelihood:
    """Factory by reference likelihood name (``config.py:162-169``)."""
    cls = _REGISTRY[name]
    return cls(dim_y=dim_y, **kw)
