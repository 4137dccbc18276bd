"""Converter round-trip tests (.sens, 3RScan zip, occupancy bundles)."""

import io
import os
import zipfile

import numpy as np


class TestSens:

    def test_sens_roundtrip(self, tmp_path):
        from PIL import Image

        from embodiedscan_tpu.converters import extract_sens, write_sens
        rng = np.random.RandomState(0)
        frames = []
        for i in range(4):
            rgb = rng.randint(0, 255, (24, 32, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(rgb).save(buf, format='JPEG')
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [i, 0, 1.5]
            frames.append(
                dict(pose=pose, color_jpeg=buf.getvalue(),
                     depth=rng.randint(400, 4000, (24, 32)).astype(
                         np.uint16)))
        k = np.array([[30.0, 0, 16], [0, 30, 12], [0, 0, 1]], np.float32)
        sens = str(tmp_path / 'scan.sens')
        write_sens(sens, frames, k)
        out = str(tmp_path / 'out')
        n = extract_sens(sens, out, frame_skip=2)
        assert n == 2  # frames 0 and 2
        depth = np.asarray(Image.open(os.path.join(out, 'depth',
                                                   '000000.png')))
        np.testing.assert_array_equal(depth, frames[0]['depth'])
        pose = np.loadtxt(os.path.join(out, 'pose', '000002.txt'))
        np.testing.assert_allclose(pose, frames[2]['pose'], atol=1e-6)
        ki = np.loadtxt(os.path.join(out, 'intrinsic_depth.txt'))
        np.testing.assert_allclose(ki[:3, :3], k, atol=1e-6)


class TestOthers:

    def test_occupancy_bundle_zip(self, tmp_path):
        from embodiedscan_tpu.converters import distribute_occupancy_anns
        bundle = tmp_path / 'occ.zip'
        with zipfile.ZipFile(bundle, 'w') as z:
            arr = io.BytesIO()
            np.save(arr, np.zeros((5, 4)))
            z.writestr('scannet/scene0000_00/occupancy.npy', arr.getvalue())
        out = str(tmp_path / 'data')
        n = distribute_occupancy_anns(str(bundle), out)
        assert n == 1
        assert os.path.exists(
            os.path.join(out, 'scannet/scene0000_00/occupancy.npy'))

    def test_3rscan_zip(self, tmp_path):
        from embodiedscan_tpu.converters import extract_3rscan_zip
        zp = tmp_path / 'seq.zip'
        with zipfile.ZipFile(zp, 'w') as z:
            z.writestr('frame-000000.color.jpg', b'xx')
            z.writestr('frame-000000.pose.txt', b'1 0 0 0')
            z.writestr('ignore.bin', b'zz')
        n = extract_3rscan_zip(str(zp), str(tmp_path / 'o'))
        assert n == 2
