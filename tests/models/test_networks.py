"""Network/normalizer tests (reference tests/util/test_networks.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.models import networks


def _apply_norm(layer, x_batches):
    """Feeds batches with update_stats=True, returns (variables, normalize_fn)."""
    variables = layer.init(jax.random.key(0), x_batches[0])
    for b in x_batches:
        _, mutated = layer.apply(
            variables, b, update_stats=True, mutable=["stats"]
        )
        variables = {**variables, "stats": mutated["stats"]}
    return variables


class TestRunningNorm:
    def test_matches_full_batch_stats(self):
        rng = np.random.default_rng(0)
        data = rng.normal(3.0, 2.0, size=(100, 4)).astype(np.float32)
        layer = networks.RunningNorm(num_features=4)
        batches = [jnp.asarray(data[i : i + 20]) for i in range(0, 100, 20)]
        variables = _apply_norm(layer, batches)
        stats = variables["stats"]
        np.testing.assert_allclose(
            np.asarray(stats["running_mean"]), data.mean(0), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(stats["running_var"]), data.var(0), rtol=1e-3
        )
        assert int(stats["count"]) == 100

    def test_normalizes_output(self):
        rng = np.random.default_rng(1)
        data = rng.normal(5.0, 3.0, size=(200, 2)).astype(np.float32)
        layer = networks.RunningNorm(num_features=2)
        variables = _apply_norm(layer, [jnp.asarray(data)])
        out = layer.apply(variables, jnp.asarray(data), update_stats=False)
        out = np.asarray(out)
        np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-3)
        np.testing.assert_allclose(out.std(0), 1.0, atol=1e-2)

    def test_no_update_when_flag_false(self):
        layer = networks.RunningNorm(num_features=2)
        x = jnp.ones((4, 2))
        variables = layer.init(jax.random.key(0), x)
        out, mutated = layer.apply(x=x, variables=variables, mutable=["stats"])
        assert int(mutated["stats"]["count"]) == 0


class TestEMANorm:
    def test_bias_corrected_first_batch(self):
        layer = networks.EMANorm(num_features=2, decay=0.9)
        data = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        variables = _apply_norm(layer, [data])
        stats = variables["stats"]
        # after one batch, bias-corrected mean == batch mean
        np.testing.assert_allclose(
            np.asarray(stats["running_mean"]), [2.0, 3.0], rtol=1e-5
        )

    def test_ema_tracks_recent_batches(self):
        layer = networks.EMANorm(num_features=1, decay=0.5)
        batches = [jnp.full((10, 1), v) for v in [0.0, 0.0, 10.0, 10.0, 10.0]]
        variables = _apply_norm(layer, batches)
        mean = float(np.asarray(variables["stats"]["running_mean"])[0])
        assert mean > 7.0  # recent batches dominate


class TestBuilders:
    def test_mlp_shapes_and_squeeze(self):
        mlp = networks.build_mlp([8, 8], out_size=1, squeeze_output=True)
        x = jnp.ones((5, 3))
        variables = mlp.init(jax.random.key(0), x)
        out = mlp.apply(variables, x)
        assert out.shape == (5,)

    def test_mlp_squeeze_invalid(self):
        mlp = networks.build_mlp([4], out_size=2, squeeze_output=True)
        with pytest.raises(ValueError, match="squeeze_output"):
            mlp.init(jax.random.key(0), jnp.ones((2, 3)))

    def test_mlp_input_norm(self):
        mlp = networks.build_mlp(
            [4], out_size=1, normalize_input_layer=networks.RunningNorm
        )
        x = jnp.ones((2, 3))
        variables = mlp.init(jax.random.key(0), x)
        assert "input_norm" in variables["stats"] or "input_norm" in str(variables)
        out = mlp.apply(variables, x)
        assert out.shape == (2, 1)

    def test_mlp_flatten_input(self):
        mlp = networks.build_mlp([4], out_size=2, flatten_input=True)
        x = jnp.ones((2, 3, 5))
        variables = mlp.init(jax.random.key(0), x)
        assert mlp.apply(variables, x).shape == (2, 2)

    def test_cnn_shapes(self):
        cnn = networks.build_cnn([4, 8], out_size=3)
        x = jnp.ones((2, 16, 16, 3))
        variables = cnn.init(jax.random.key(0), x)
        assert cnn.apply(variables, x).shape == (2, 3)

    def test_mlp_dropout_train_mode(self):
        mlp = networks.build_mlp([16], out_size=1, dropout_prob=0.5)
        x = jnp.ones((4, 3))
        variables = mlp.init(jax.random.key(0), x)
        out_eval = mlp.apply(variables, x, train=False)
        out_train = mlp.apply(
            variables, x, train=True, rngs={"dropout": jax.random.key(1)}
        )
        assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
