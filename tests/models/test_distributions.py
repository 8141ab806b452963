"""Distribution tests: log-prob/entropy math vs closed forms and sampling."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from imitation_tpu.models.distributions import (
    Categorical,
    DiagGaussian,
    SquashedGaussian,
)


class TestCategorical:
    def test_log_prob_matches_softmax(self):
        logits = jnp.asarray([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
        d = Categorical(logits=logits)
        lp = d.log_prob(jnp.asarray([1, 2]))
        expected = np.log(
            np.exp(np.asarray(logits))
            / np.exp(np.asarray(logits)).sum(-1, keepdims=True)
        )
        np.testing.assert_allclose(np.asarray(lp), [expected[0, 1], expected[1, 2]], rtol=1e-5)

    def test_entropy_uniform(self):
        d = Categorical(logits=jnp.zeros((1, 4)))
        np.testing.assert_allclose(float(d.entropy()[0]), np.log(4), rtol=1e-5)

    def test_sample_distribution(self):
        logits = jnp.asarray([np.log([0.7, 0.2, 0.1])])
        d = Categorical(logits=jnp.broadcast_to(logits, (20000, 3)))
        samples = np.asarray(d.sample(jax.random.key(0)))
        freq = np.bincount(samples, minlength=3) / len(samples)
        np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)

    def test_kl_self_zero(self):
        d = Categorical(logits=jnp.asarray([[1.0, 2.0]]))
        np.testing.assert_allclose(float(d.kl(d)[0]), 0.0, atol=1e-7)


class TestDiagGaussian:
    def test_log_prob_matches_scipy(self):
        mean = jnp.asarray([[0.5, -1.0]])
        log_std = jnp.asarray([0.1, -0.3])
        d = DiagGaussian(mean=mean, log_std=log_std)
        x = jnp.asarray([[0.7, -1.2]])
        lp = float(d.log_prob(x)[0])
        expected = sum(
            sps.norm.logpdf(xv, loc=m, scale=np.exp(s))
            for xv, m, s in zip([0.7, -1.2], [0.5, -1.0], [0.1, -0.3])
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-5)

    def test_entropy_matches_scipy(self):
        log_std = jnp.asarray([0.2, -0.5])
        d = DiagGaussian(mean=jnp.zeros((1, 2)), log_std=log_std)
        expected = sum(sps.norm.entropy(scale=np.exp(s)) for s in [0.2, -0.5])
        np.testing.assert_allclose(float(d.entropy()[0]), expected, rtol=1e-5)

    def test_sample_moments(self):
        d = DiagGaussian(
            mean=jnp.full((50000, 1), 2.0), log_std=jnp.asarray([np.log(0.5)])
        )
        s = np.asarray(d.sample(jax.random.key(1)))
        np.testing.assert_allclose(s.mean(), 2.0, atol=0.02)
        np.testing.assert_allclose(s.std(), 0.5, atol=0.02)


class TestSquashedGaussian:
    def test_samples_in_bounds(self):
        d = SquashedGaussian(
            mean=jnp.zeros((1000, 2)), log_std=jnp.zeros((1000, 2))
        )
        acts, lp = d.sample_and_log_prob(jax.random.key(0))
        a = np.asarray(acts)
        assert (np.abs(a) < 1.0).all()
        assert np.isfinite(np.asarray(lp)).all()

    def test_log_prob_consistency(self):
        """log_prob(action) agrees with the value from sample_and_log_prob."""
        d = SquashedGaussian(
            mean=jnp.asarray([[0.3, -0.2]]), log_std=jnp.asarray([[-1.0, -0.5]])
        )
        acts, lp_sampled = d.sample_and_log_prob(jax.random.key(2))
        lp_eval = d.log_prob(acts)
        np.testing.assert_allclose(
            np.asarray(lp_eval), np.asarray(lp_sampled), rtol=1e-3, atol=1e-3
        )

    def test_integrates_to_one_1d(self):
        """Numerically integrate the squashed density over (-1, 1)."""
        d = SquashedGaussian(mean=jnp.asarray([[0.2]]), log_std=jnp.asarray([[-0.5]]))
        xs = np.linspace(-0.999, 0.999, 4001, dtype=np.float32)
        probs = np.exp(
            np.asarray(d.log_prob(jnp.asarray(xs[:, None])))
        )
        integral = np.trapezoid(probs, xs)
        np.testing.assert_allclose(integral, 1.0, atol=5e-3)
