"""Test environment: force the CPU backend with 8 virtual devices.

The container's sitecustomize pre-imports jax and registers the remote-TPU
(axon) platform, so plain env vars are too late here; ``jax.config`` still
wins as long as no backend has been initialized. Multi-device sharding tests
then run on a virtual CPU mesh (replacing the reference's missing
fake-cluster story, see SURVEY.md §4); real-TPU execution is exercised by
bench.py / the driver instead.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# one traced copy of the per-sample sort pipelines (vs b unrolled copies):
# ~b-times faster XLA compile on this 1-core host, identical semantics. The
# TPU-side sort-under-vmap penalty that motivates 'unroll' does not apply
# to the CPU backend the suite runs on.
os.environ.setdefault('EMBODIEDSCAN_BMAP', 'vmap')

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
# persistent compile cache: the suite is compile-dominated on a 1-core
# host; repeat runs skip every unchanged jit (VERDICT r1 "test wall time")
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


import pickle

import numpy as np
import pytest

# Test lanes (VERDICT r2 next #8): whole-model compile tests dominate wall
# time on a 1-core host, so they live in an opt-in 'compile' lane; the
# default lane (pyproject addopts deselects 'compile' and 'slow') is the
# fast unit/oracle suite.
_COMPILE_LANE = {
    'test_detector.py', 'test_grounding.py', 'test_occupancy.py',
    'test_parallel.py'
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _COMPILE_LANE:
            item.add_marker(pytest.mark.compile)


@pytest.fixture(scope='session')
def fake_data(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp('esdata')
    os.makedirs(root / 'scannet', exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for s in range(3):
        images = []
        for v in range(4):
            rgb = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
            depth = (rng.uniform(500, 3000, (48, 64))).astype(np.uint16)
            ip = f'scannet/s{s}_v{v}.jpg'
            dp = f'scannet/s{s}_v{v}.png'
            Image.fromarray(rgb).save(root / ip)
            Image.fromarray(depth).save(root / dp)
            cam2global = np.eye(4)
            cam2global[:3, 3] = [v * 0.1, 0, 1.5]
            # instance 1 only becomes visible from the second view, so
            # continuous sweeps see strictly growing GT
            images.append(
                dict(img_path=ip, depth_path=dp, cam2global=cam2global,
                     visible_instance_ids=[0] if v == 0 else [0, 1]))
        instances = [
            dict(bbox_3d=np.concatenate([
                rng.uniform(0, 3, 3),
                rng.uniform(0.2, 1, 3),
                rng.uniform(-0.3, 0.3, 3)
            ]).tolist(), bbox_label_3d=int(rng.randint(0, 5)))
            for _ in range(2)
        ]
        infos.append(
            dict(sample_idx=f'scannet/scene{s:04d}_00',
                 axis_align_matrix=np.eye(4),
                 cam2img=np.array([[60.0, 0, 32], [0, 60, 24], [0, 0, 1]]),
                 depth_cam2img=np.array([[60.0, 0, 32], [0, 60, 24],
                                         [0, 0, 1]]),
                 images=images, instances=instances))
        # occupancy gt + per-view visibility in the reference layout
        # (embodiedscan_dataset.py:200-252)
        occ_dir = root / 'scannet' / 'scans' / f'scene{s:04d}_00' / 'occupancy'
        os.makedirs(occ_dir, exist_ok=True)
        occ = np.stack([
            rng.randint(0, 8, 64),
            rng.randint(0, 8, 64),
            rng.randint(0, 4, 64),
            rng.randint(1, 5, 64)
        ], -1).astype(np.int64)
        np.save(occ_dir / 'occupancy.npy', occ)
        per_view = [
            dict(visible_occupancy=rng.rand(8, 8, 4) > 0.5) for _ in range(4)
        ]
        with open(occ_dir / 'visible_occupancy.pkl', 'wb') as f:
            pickle.dump(per_view, f)
    pkl = dict(data_list=infos,
               metainfo=dict(categories={f'c{i}': i for i in range(5)}))
    for name in ('embodiedscan_infos_train.pkl', 'embodiedscan_infos_val.pkl'):
        with open(root / name, 'wb') as f:
            pickle.dump(pkl, f)
    return str(root)


