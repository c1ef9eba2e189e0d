"""Serialization: export/load roundtrip, unet pickle chain, orbax resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from ddpo_tpu.training.policy_gradient import AccumulatingTrainState
from ddpo_tpu.utils.checkpoints import (
    get_latest_epoch,
    latest_checkpoint_step,
    load_unet_pickle,
    restore_train_state,
    save_train_state,
    save_unet,
)
from ddpo_tpu.utils.serialization import (
    load_stable_diffusion,
    load_unet,
    save_stable_diffusion_export,
)


@pytest.mark.slow
def test_tiny_stack_loads_and_runs():
    models, params = load_stable_diffusion(model_preset="tiny", seed=0)
    ids = models.tokenizer(["a peacock", "a dog"])
    emb = models.text_encoder.apply({"params": params["text_encoder"]}, jnp.asarray(ids))
    assert emb.shape == (2, 77, 32)
    eps = models.unet.apply(
        {"params": params["unet"]},
        jnp.zeros((2, 4, 8, 8)), jnp.array([1, 981]), emb,
    )
    assert eps.shape == (2, 4, 8, 8)


def test_export_roundtrip(tmp_path):
    from ddpo_tpu.models.convert import load_sd_checkpoint

    _, params = load_stable_diffusion(model_preset="tiny", seed=3)
    save_stable_diffusion_export(str(tmp_path / "export"), params)
    loaded = load_sd_checkpoint(str(tmp_path / "export"))
    for sub in ("unet", "vae", "text_encoder"):
        a = jax.tree_util.tree_leaves(params[sub])
        b = jax.tree_util.tree_leaves(loaded[sub])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_unet_pickle_chain(tmp_path):
    _, params = load_stable_diffusion(model_preset="tiny", seed=1)
    save_unet(str(tmp_path), params["unet"], epoch=3)
    save_unet(str(tmp_path), params["unet"], epoch=7)
    assert get_latest_epoch(str(tmp_path)) == 7
    loaded = load_unet_pickle(str(tmp_path), epoch="latest")
    for x, y in zip(
        jax.tree_util.tree_leaves(params["unet"]), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # load_unet overlays the pickle onto a fresh stack
    models2, params2 = load_unet(
        str(tmp_path), epoch="latest", model_preset="tiny", seed=99
    )
    for x, y in zip(
        jax.tree_util.tree_leaves(params["unet"]),
        jax.tree_util.tree_leaves(params2["unet"]),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_full_state_roundtrip(tmp_path):
    _, params = load_stable_diffusion(model_preset="tiny", seed=2)

    def apply_fn(p, *a):
        raise NotImplementedError

    state = AccumulatingTrainState.create(
        apply_fn=apply_fn, params=params["unet"], tx=optax.adamw(1e-4)
    )
    payload = {
        "state": jax.device_get(state),
        "epoch": 5,
        "rng": np.array([1, 2], np.uint32),
    }
    save_train_state(str(tmp_path), 5, payload)
    assert latest_checkpoint_step(str(tmp_path)) == 5

    target = {
        "state": jax.device_get(
            AccumulatingTrainState.create(
                apply_fn=apply_fn, params=params["unet"], tx=optax.adamw(1e-4)
            )
        ),
        "epoch": 0,
        "rng": np.zeros(2, np.uint32),
    }
    restored, step = restore_train_state(str(tmp_path), target=target)
    assert step == 5
    assert int(restored["epoch"]) == 5
    np.testing.assert_array_equal(restored["rng"], [1, 2])
    for x, y in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored["state"].params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_roundtrip(tmp_path):
    """block=False checkpoints land identically: the device->host copy is
    synchronous (train steps donate state buffers) but the Orbax write runs
    on a background thread; restore/latest_checkpoint_step join in-flight
    writes first (SURVEY 5.4: async full-state save)."""
    from ddpo_tpu.utils.checkpoints import wait_for_pending_saves

    payload = {
        "epoch": 1,
        "rng": np.array([3, 4], np.uint32),
        "weights": np.arange(16, dtype=np.float32).reshape(4, 4),
    }
    save_train_state(str(tmp_path), 1, payload, host_state={"curve": [1.0]},
                     block=False)
    # queue a second async write; both must land
    payload2 = dict(payload, epoch=2)
    save_train_state(str(tmp_path), 2, payload2, block=False)

    # latest_checkpoint_step joins the pending writes before listing
    assert latest_checkpoint_step(str(tmp_path)) == 2
    restored, step = restore_train_state(str(tmp_path), step=1)
    assert step == 1 and int(restored["epoch"]) == 1
    np.testing.assert_array_equal(
        restored["weights"], payload["weights"]
    )
    assert restored["host"] == {"curve": [1.0]}
    restored2, _ = restore_train_state(str(tmp_path), step=2)
    assert int(restored2["epoch"]) == 2
    wait_for_pending_saves()  # idempotent when the queue is empty


def test_prune_checkpoints(tmp_path):
    """keep_checkpoints: all but the newest N full-state checkpoints are
    deleted (incl. the _host.pkl sidecars); keep<=0 disables; restore still
    finds the newest surviving step."""
    from ddpo_tpu.utils.checkpoints import prune_checkpoints

    for step in range(5):
        save_train_state(
            str(tmp_path), step,
            {"epoch": step, "w": np.full(4, step, np.float32)},
            host_state={"s": step},
        )
    assert prune_checkpoints(str(tmp_path), keep=0) == 0
    assert prune_checkpoints(str(tmp_path), keep=2) == 3
    root = tmp_path / "checkpoints"
    assert sorted(d.name for d in root.iterdir() if d.is_dir()) == ["3", "4"]
    assert not (root / "0_host.pkl").exists()
    assert (root / "4_host.pkl").exists()
    restored, step = restore_train_state(str(tmp_path))
    assert step == 4 and int(restored["epoch"]) == 4
    # pruning more than exist keeps everything that remains
    assert prune_checkpoints(str(tmp_path), keep=10) == 0
