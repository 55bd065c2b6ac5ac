"""Regression tests for train-loop wiring (mtlx/train/train.py).

Round-1 bug: the augmentation key was loop-invariant, so batch-slot i made
the same flip/crop decision at every step of the run. The key must advance
with the step counter (reference draws fresh randomness each step,
SURVEY.md §3.1 preprocessor row).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.train.train import make_augmented_batch_fn


def _tiny_batch(b=16):
    rs = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rs.uniform(0, 255, (b, 32, 32, 3)), jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray([[[4.0, 4.0, 20.0, 24.0]]]), (b, 1, 1)),
        "gt_classes": jnp.zeros((b, 1), jnp.int32),
        "gt_mask": jnp.ones((b, 1), bool),
        "true_shape": jnp.tile(jnp.asarray([[32, 32]], jnp.int32), (b, 1)),
    }


def test_augmentation_rng_advances_with_step():
    aug = make_augmented_batch_fn([("random_horizontal_flip", {})])
    batch = _tiny_batch()
    rng = jax.random.PRNGKey(3)
    out0 = aug(rng, jnp.int32(0), batch)
    out0b = aug(rng, jnp.int32(0), batch)
    out1 = aug(rng, jnp.int32(1), batch)
    # same step -> identical draws (determinism)
    np.testing.assert_array_equal(
        np.asarray(out0["image"]), np.asarray(out0b["image"])
    )
    # consecutive steps -> a different flip pattern on the same batch
    assert not np.array_equal(np.asarray(out0["image"]), np.asarray(out1["image"]))
    assert not np.array_equal(
        np.asarray(out0["gt_boxes"]), np.asarray(out1["gt_boxes"])
    )


def test_augmentation_works_under_jit_with_traced_step():
    aug = make_augmented_batch_fn([("random_horizontal_flip", {})])
    batch = _tiny_batch(4)

    @jax.jit
    def run(step, batch):
        return aug(jax.random.PRNGKey(0), step, batch)["image"]

    a = run(jnp.int32(0), batch)
    b = run(jnp.int32(7), batch)
    assert a.shape == b.shape
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_no_aug_options_is_identity():
    aug = make_augmented_batch_fn([])
    batch = _tiny_batch(2)
    out = aug(jax.random.PRNGKey(0), jnp.int32(5), batch)
    assert out is batch


def test_batches_epochs_bound(tmp_path):
    """input_reader.num_epochs: the host iterator stops after the
    configured number of passes (reference string_input_producer)."""
    from mtlx.data.loader import batches

    class FakeDataset:
        def __len__(self):
            return 5

        def get(self, i):
            return {
                "image": np.zeros((4, 4, 3), np.uint8),
                "true_shape": np.asarray([4, 4]),
            }

    out = list(batches(FakeDataset(), 2, shuffle=False, epochs=2))
    assert len(out) == 4  # 2 full batches per epoch (remainder dropped), 2 epochs


def test_checkpoint_keep_every_n_hours_option(tmp_path):
    """train_config.keep_checkpoint_every_n_hours reaches the orbax
    retention policy (reference tf.train.Saver option)."""
    import datetime

    from mtlx.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "a"), keep_every_n_hours=2.5)
    opts = mgr._mgr._options
    assert opts.keep_time_interval == datetime.timedelta(hours=2.5)
    mgr2 = CheckpointManager(str(tmp_path / "b"))
    assert mgr2._mgr._options.keep_time_interval is None


def test_pack_images_and_pad_to_canvas_roundtrip():
    """Loader pack_images ships the 128-bucketed true region; the device
    pad restores the exact canvas batch (transfer-bytes optimization)."""
    from mtlx.data.loader import _collate
    from mtlx.train.train_step import pad_batch_to_canvas

    rs = np.random.RandomState(0)
    samples = []
    for th, tw in ((100, 200), (120, 260)):
        img = np.zeros((512, 512, 3), np.uint8)
        img[:th, :tw] = rs.randint(0, 255, (th, tw, 3), np.uint8)
        samples.append({
            "image": img,
            "true_shape": np.asarray([th, tw], np.int32),
            "gt_boxes": np.zeros((4, 4), np.float32),
            "source_id": "s",
        })
    full = _collate(samples, pack_images=False)
    packed = _collate(samples, pack_images=True)
    assert full["image"].shape == (2, 512, 512, 3)
    assert packed["image"].shape == (2, 128, 384, 3)  # ceil(120/128), ceil(260/128)
    restored = pad_batch_to_canvas(
        {k: jnp.asarray(v) for k, v in packed.items() if k != "source_id"},
        (512, 512),
    )
    np.testing.assert_array_equal(np.asarray(restored["image"]), full["image"])
    # no-op at full canvas
    same = pad_batch_to_canvas(
        {"image": jnp.asarray(full["image"])}, (512, 512)
    )
    assert same["image"].shape == (2, 512, 512, 3)
    # oversize rejected
    import pytest

    with pytest.raises(ValueError):
        pad_batch_to_canvas({"image": jnp.zeros((1, 600, 600, 3))}, (512, 512))
