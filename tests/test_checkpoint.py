"""Checkpoint round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from absolutetrack_tpu.models import ModelConfig, init_umetrack_params
from absolutetrack_tpu.models.checkpoint import load_any, load_params, save_params

CFG = ModelConfig(input_size=(32, 32))


class TestCheckpoint:
    def test_save_load_round_trip(self, tmp_path):
        params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
        p = str(tmp_path / "ckpt.msgpack")
        save_params(p, params)
        loaded = load_params(p, CFG)
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(loaded)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_any_dispatches_native(self, tmp_path):
        params = init_umetrack_params(jax.random.PRNGKey(1), CFG)
        p = str(tmp_path / "model.msgpack")
        save_params(p, params)
        loaded = load_any(p, CFG)
        np.testing.assert_array_equal(
            np.asarray(loaded["backbone"]["stem"]["w"]),
            np.asarray(params["backbone"]["stem"]["w"]),
        )

    def test_atomic_overwrite(self, tmp_path):
        p = str(tmp_path / "ckpt.msgpack")
        params = init_umetrack_params(jax.random.PRNGKey(2), CFG)
        save_params(p, params)
        params2 = jax.tree.map(lambda x: x + 1.0, params)
        save_params(p, params2)
        loaded = load_params(p, CFG)
        np.testing.assert_allclose(
            np.asarray(loaded["backbone"]["proj"]["b"]),
            np.asarray(params2["backbone"]["proj"]["b"]),
        )


class TestTrainStateCheckpoint:
    def test_train_state_round_trip(self, tmp_path):
        import optax

        from absolutetrack_tpu.models.checkpoint import (
            load_train_state,
            save_train_state,
        )
        from absolutetrack_tpu.training.train import TrainState, make_optimizer

        params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
        opt = make_optimizer()
        state = TrainState(params, opt.init(params), jnp.asarray(7, jnp.int32))
        p = str(tmp_path / "state.train")
        save_train_state(p, state)

        template = TrainState(
            init_umetrack_params(jax.random.PRNGKey(1), CFG),
            opt.init(params),
            jnp.zeros((), jnp.int32),
        )
        restored = load_train_state(p, template)
        assert int(restored.step) == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params["backbone"]["stem"]["w"]),
            np.asarray(params["backbone"]["stem"]["w"]),
        )
