"""Occupancy model smoke tests + occ loss oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodiedscan_tpu.models import occupancy as O
from test_detector import tiny_batch


class TestOccLosses:

    def test_multiscale_targets(self):
        gt = jnp.asarray([[0, 0, 0, 5], [3, 2, 1, 7], [9, 9, 9, 1]],
                         jnp.float32)
        mask = jnp.asarray([True, True, False])
        grid = O.occ_multiscale_targets(gt, mask, 1, (4, 4, 4))
        assert grid[0, 0, 0] == 5 and grid[3, 2, 1] == 7
        assert grid.sum() == 12  # only the two valid labels
        half = O.occ_multiscale_targets(gt, mask, 2, (2, 2, 2))
        assert half[0, 0, 0] == 5 and half[1, 1, 0] == 7

    def test_geo_scal_perfect(self):
        # logits strongly predicting the target -> low loss
        tgt = jnp.asarray([[0, 1], [2, 0]])
        logits = jax.nn.one_hot(tgt, 3) * 20.0
        loss = O.geo_scal_loss(logits, tgt)
        assert float(loss) < 1e-3

    def test_sem_scal_perfect(self):
        tgt = jnp.asarray([[0, 1], [2, 255]])
        logits = jax.nn.one_hot(jnp.where(tgt == 255, 0, tgt), 3) * 20.0
        loss = O.sem_scal_loss(logits, tgt)
        assert float(loss) < 1e-2

    def test_sem_scal_ignores_unknown(self):
        tgt = jnp.full((2, 2), 255)
        logits = jnp.zeros((2, 2, 3))
        assert np.isfinite(float(O.sem_scal_loss(logits, tgt)))


def occ_batch(rng, b=2, m=64):
    batch = tiny_batch(rng, b=b)
    # points within the point cloud range
    pts = np.concatenate([
        rng.uniform(-3, 3, (b, 512, 2)),
        rng.uniform(-0.5, 1.5, (b, 512, 1))
    ], -1).astype(np.float32)
    batch['points'] = jnp.asarray(pts)
    batch['points_mask'] = jnp.ones((b, 512), bool)
    occ = np.concatenate([
        rng.randint(0, 8, (b, m, 3)),
        rng.randint(1, 5, (b, m, 1))
    ], -1).astype(np.float32)
    batch['gt_occ'] = jnp.asarray(occ)
    batch['gt_occ_mask'] = jnp.ones((b, m), bool)
    return batch


class TestOccModel:

    @pytest.fixture(scope='class')
    def setup(self):
        rng = np.random.RandomState(0)
        batch = occ_batch(rng)
        model = O.DenseFusionOccPredictor(
            num_classes=5,
            n_voxels=(8, 8, 4),
            input_capacity=512,
            backbone_capacities=(512, 256, 256, 128, 64, 32),
            resnet_depth=18,
            resnet_base_channels=16,
            mink_depth=18,
            neck3d_channels=16)
        from helpers import jit_init
        return model, jit_init(model, batch), batch

    @pytest.fixture(scope='class')
    def losses_and_grads(self, setup):
        from helpers import jit_losses_and_grads
        return jit_losses_and_grads(*setup)

    def test_loss_finite(self, losses_and_grads):
        _, losses, _ = losses_and_grads
        assert 'loss_occ_0' in losses and 'loss_occ_2' in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_grads_finite(self, losses_and_grads):
        _, _, grads = losses_and_grads
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_predict_shape(self, setup):
        from helpers import jit_predict
        model, variables, batch = setup
        pred = jit_predict(model, variables, batch)
        assert pred.shape == (2, 8, 8, 4)
        assert (np.asarray(pred) >= 0).all()
