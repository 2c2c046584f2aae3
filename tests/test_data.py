"""Data-layer tests: PLY round trip (numpy and native C++ paths),
cameras.json round trip, COLMAP binary readers."""

import json
import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.data import (
    load_cameras_json,
    load_gaussian_ply,
    read_ply,
    save_cameras_json,
    save_gaussian_ply,
    write_ply,
)
from gaussiansplat_tpu.data.native_loader import load_ply_native
from gaussiansplat_tpu.models import from_arrays
from gaussiansplat_tpu.ops import look_at


def _random_gaussian_arrays(n=64, k_rest=15, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        means=rng.normal(size=(n, 3)).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
        log_scales=rng.normal(size=(n, 3)).astype(np.float32),
        logit_opacities=rng.normal(size=(n,)).astype(np.float32),
        sh_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        sh_rest=rng.normal(size=(n, k_rest, 3)).astype(np.float32),
    )


class TestPly:
    def test_roundtrip(self, tmp_path):
        arrs = _random_gaussian_arrays()
        path = str(tmp_path / "model.ply")
        save_gaussian_ply(path, **arrs)
        means, quats, log_scales, logit_op, sh_dc, sh_rest = load_gaussian_ply(path)
        np.testing.assert_array_equal(means, arrs["means"])
        np.testing.assert_array_equal(quats, arrs["quats"])
        np.testing.assert_array_equal(log_scales, arrs["log_scales"])
        np.testing.assert_array_equal(logit_op, arrs["logit_opacities"])
        np.testing.assert_array_equal(sh_dc, arrs["sh_dc"])
        np.testing.assert_array_equal(sh_rest, arrs["sh_rest"])

    def test_inria_field_names(self, tmp_path):
        """Field names must match the ecosystem layout the reference reads
        (`splat.jl:57-63`): x,y,z, f_dc_*, f_rest_0..44, opacity, scale_*,
        rot_*."""
        arrs = _random_gaussian_arrays(k_rest=15)
        path = str(tmp_path / "model.ply")
        save_gaussian_ply(path, **arrs)
        vertex = read_ply(path)["vertex"]
        for f in ["x", "y", "z", "opacity", "f_dc_0", "f_dc_2", "f_rest_0",
                  "f_rest_44", "scale_0", "scale_2", "rot_0", "rot_3", "nx"]:
            assert f in vertex, f
        assert "f_rest_45" not in vertex

    def test_model_roundtrip(self, tmp_path):
        arrs = _random_gaussian_arrays()
        model = from_arrays(**arrs, capacity=128)
        path = str(tmp_path / "model.ply")
        n = 64
        save_gaussian_ply(
            path,
            np.asarray(model.means[:n]), np.asarray(model.quats[:n]),
            np.asarray(model.log_scales[:n]),
            np.asarray(model.logit_opacities[:n]),
            np.asarray(model.sh_dc[:n]), np.asarray(model.sh_rest[:n]),
        )
        m2 = from_arrays(*load_gaussian_ply(path), capacity=128)
        np.testing.assert_array_equal(m2.means, model.means)
        np.testing.assert_array_equal(m2.sh_rest, model.sh_rest)
        assert int(m2.num_alive) == 64

    def test_native_parser_matches_numpy(self, tmp_path):
        lib = load_ply_native()
        if lib is None:
            pytest.skip("native toolchain unavailable")
        arrs = _random_gaussian_arrays(n=1000)
        path = str(tmp_path / "big.ply")
        save_gaussian_ply(path, **arrs)
        ref = read_ply(path)["vertex"]
        nat = lib.parse_vertex_element(path)
        assert set(nat.keys()) == set(ref.keys())
        for k in ref:
            np.testing.assert_array_equal(nat[k], ref[k].astype(np.float32))

    def test_ascii_ply(self, tmp_path):
        path = str(tmp_path / "a.ply")
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                    "property float x\nproperty float y\nend_header\n"
                    "1.0 2.0\n3.0 4.0\n")
        v = read_ply(path)["vertex"]
        np.testing.assert_allclose(v["x"], [1.0, 3.0])
        np.testing.assert_allclose(v["y"], [2.0, 4.0])


class TestCamerasJson:
    def test_roundtrip(self, tmp_path):
        cams = [
            look_at(eye=(1, 2, 5), target=(0, 0, 0), fx=500, fy=510,
                    width=640, height=480),
            look_at(eye=(-3, 1, 4), target=(0, 1, 0), fx=300, fy=300,
                    width=320, height=240),
        ]
        path = str(tmp_path / "cameras.json")
        save_cameras_json(path, cams)
        loaded = load_cameras_json(path)
        for a, b in zip(cams, loaded):
            np.testing.assert_allclose(a.R, b.R, atol=1e-5)
            np.testing.assert_allclose(a.t, b.t, atol=1e-5)
            np.testing.assert_allclose(a.position, b.position, atol=1e-4)
            assert (a.width, a.height) == (b.width, b.height)

    def test_inria_convention(self, tmp_path):
        """position/rotation are the cam-to-world pose, as the INRIA dump
        (and the reference's `eye = -R^T p` at `camera.jl:142`) assume."""
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), width=64, height=64)
        path = str(tmp_path / "cameras.json")
        save_cameras_json(path, [cam])
        entry = json.load(open(path))[0]
        np.testing.assert_allclose(entry["position"], [0, 0, -5], atol=1e-5)


class TestColmap:
    def test_binary_readers(self, tmp_path):
        from gaussiansplat_tpu.data.colmap import read_colmap_model

        sparse = tmp_path / "sparse" / "0"
        os.makedirs(sparse)
        # cameras.bin: one PINHOLE camera
        with open(sparse / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
            f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        # images.bin: one image, identity rotation
        with open(sparse / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<idddddddi", 1, 1.0, 0, 0, 0, 0.5, 0.25, 2.0, 1))
            f.write(b"img0.png\x00")
            f.write(struct.pack("<Q", 0))
        # points3D.bin: two points with color + a 1-element track
        with open(sparse / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, (xyz, rgb) in enumerate(
                [((1.0, 2.0, 3.0), (255, 0, 0)), ((4.0, 5.0, 6.0), (0, 128, 0))]
            ):
                f.write(struct.pack("<QdddBBBd", i, *xyz, *rgb, 0.1))
                f.write(struct.pack("<Q", 1))
                f.write(struct.pack("<ii", 1, 0))

        cams, xyz, rgb = read_colmap_model(str(sparse))
        assert len(cams) == 1
        name, cam = cams[0]
        assert name == "img0.png"
        assert (cam.width, cam.height) == (640, 480)
        np.testing.assert_allclose(cam.R, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(cam.t, [0.5, 0.25, 2.0], atol=1e-6)
        np.testing.assert_allclose(float(cam.fx), 500.0)
        np.testing.assert_allclose(float(cam.cx), 320.0)
        np.testing.assert_allclose(xyz, [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_allclose(rgb[0], [1.0, 0.0, 0.0])


class TestColmapNativeParity:
    """native/colmap_io.cpp must agree byte-for-byte with the numpy readers."""

    def _write_model(self, sparse, n_pts=257, n_imgs=9):
        rng = np.random.default_rng(0)
        os.makedirs(sparse, exist_ok=True)
        with open(sparse / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", n_imgs))
            for i in range(n_imgs):
                q = rng.normal(size=4)
                t = rng.normal(size=3)
                f.write(struct.pack("<idddddddi", i, *q, *t, i % 3))
                f.write(f"frame_{i:03d}_{'x' * (i % 40)}.png".encode() + b"\x00")
                n2d = int(rng.integers(0, 50))
                f.write(struct.pack("<Q", n2d))
                f.write(b"\x00" * (24 * n2d))
        with open(sparse / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", n_pts))
            for i in range(n_pts):
                xyz = rng.normal(size=3)
                rgb = rng.integers(0, 256, size=3)
                f.write(struct.pack("<QdddBBBd", i, *xyz, *[int(v) for v in rgb], 0.5))
                tl = int(rng.integers(0, 12))
                f.write(struct.pack("<Q", tl))
                f.write(b"\x00" * (8 * tl))

    def test_points_and_images_match_python(self, tmp_path):
        from gaussiansplat_tpu.data import colmap, native_loader

        native = native_loader.load_colmap_native()
        if native is None:
            import pytest

            pytest.skip("no C++ toolchain for native colmap parser")
        sparse = tmp_path / "sparse"
        self._write_model(sparse)

        nx, nc = native.read_points3d(str(sparse / "points3D.bin"))
        # force the pure-python path for comparison
        saved = colmap._COLMAP_NATIVE
        colmap._COLMAP_NATIVE = False
        try:
            px, pc = colmap.read_points3d_bin(str(sparse / "points3D.bin"))
            pimgs = colmap.read_images_bin(str(sparse / "images.bin"))
        finally:
            colmap._COLMAP_NATIVE = saved
        np.testing.assert_array_equal(nx, px)
        np.testing.assert_array_equal(nc, pc)

        nimgs = native.read_images(str(sparse / "images.bin"))
        assert len(nimgs) == len(pimgs)
        for a, b in zip(nimgs, pimgs):
            assert a["name"] == b["name"]
            assert a["camera_id"] == b["camera_id"]
            np.testing.assert_array_equal(a["quat"], b["quat"])
            np.testing.assert_array_equal(a["t"], b["t"])


class TestBenchmarkScene:
    def test_scene_builds_and_renders(self):
        """Bundled quality-benchmark scene (BASELINE config 2 stand-in,
        data/benchmark.py): GT model is surface-aligned, views render
        non-empty and finite, init is a sparse noisy subset."""
        import jax.numpy as jnp

        from gaussiansplat_tpu.config import RasterConfig
        from gaussiansplat_tpu.data.benchmark import benchmark_scene

        cfg = RasterConfig(impl="xla", packed=False)
        scene, gt = benchmark_scene(
            n_points=4_000, n_train=2, n_test=1, width=96, height=96,
            init_points=500, capacity=2_048, cfg=cfg, impl="xla")
        assert int(gt.num_alive) == 4_000
        assert int(scene.init_model.num_alive) == 500
        assert scene.init_model.capacity == 2_048
        for cam, img in scene.train_views + scene.test_views:
            a = np.asarray(img)
            assert a.shape == (96, 96, 3)
            assert np.isfinite(a).all()
            assert 0.02 < a.mean() < 0.9  # objects visible, not washed out

    def test_gt_splats_are_surface_aligned(self):
        from gaussiansplat_tpu.data.benchmark import make_gt_model

        m = make_gt_model(2_000, sh_degree=1)
        ls = np.asarray(m.log_scales[:2000])
        # normal axis (z) ~6x thinner than the tangent axes
        np.testing.assert_allclose(ls[:, 0], ls[:, 1], atol=1e-5)
        assert ((ls[:, 0] - ls[:, 2]) > np.log(5.5)).all()


class TestNerfSynthetic:
    """Blender transforms_{split}.json loader (`data/datasets.py`): camera
    convention (OpenGL c2w -> +z-forward w2c), FOV->focal, RGBA alpha
    compositing — the format BASELINE config 2 names, reachable from
    `cli train <dir>`."""

    def _write_scene(self, root, n_frames=2, size=16, fovx=np.pi / 2):
        from PIL import Image

        os.makedirs(root / "train", exist_ok=True)
        frames = []
        for i in range(n_frames):
            # camera at z=+4 looking toward origin along OpenGL -z:
            # identity rotation, translation (0, 0, 4).
            c2w = np.eye(4, dtype=np.float32)
            c2w[2, 3] = 4.0 + i
            rgba = np.zeros((size, size, 4), np.uint8)
            rgba[:, : size // 2] = [200, 100, 50, 255]   # left: opaque color
            rgba[:, size // 2:] = [255, 255, 255, 0]     # right: transparent
            Image.fromarray(rgba).save(root / "train" / f"r_{i}.png")
            frames.append({
                "file_path": f"train/r_{i}",
                "transform_matrix": c2w.tolist(),
            })
        with open(root / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": float(fovx), "frames": frames}, f)

    def test_loader_convention_and_alpha(self, tmp_path):
        from gaussiansplat_tpu.data.datasets import load_nerf_synthetic

        self._write_scene(tmp_path, size=16)
        views = load_nerf_synthetic(str(tmp_path), "train")
        assert len(views) == 2
        cam, img = views[0]
        assert (cam.width, cam.height) == (16, 16)
        # fovx = 90 deg -> fx = (w/2) / tan(45 deg) = w/2
        np.testing.assert_allclose(float(cam.fx), 8.0, rtol=1e-6)
        # OpenGL c2w (identity R, eye at +4z) -> w2c with +z forward:
        # R = diag(1, -1, -1), t = -R @ eye = (0, 0, 4)
        np.testing.assert_allclose(
            np.asarray(cam.R), np.diag([1.0, -1.0, -1.0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cam.t), [0.0, 0.0, 4.0], atol=1e-6)
        # a world point at the origin sits 4 units in FRONT of the camera
        pcam = np.asarray(cam.R) @ np.zeros(3) + np.asarray(cam.t)
        assert pcam[2] > 0
        a = np.asarray(img)
        assert a.shape == (16, 16, 3)
        # alpha=0 composites to black background by default...
        np.testing.assert_allclose(a[:, -1], 0.0, atol=1e-6)
        np.testing.assert_allclose(
            a[:, 0],
            np.broadcast_to([200 / 255, 100 / 255, 50 / 255], (16, 3)),
            atol=1e-6)
        # ...and to white with white_background=True
        wviews = load_nerf_synthetic(str(tmp_path), "train",
                                     white_background=True)
        np.testing.assert_allclose(np.asarray(wviews[0][1])[:, -1], 1.0,
                                   atol=1e-6)

    def test_scene_fallback_and_init(self, tmp_path):
        from gaussiansplat_tpu.data.datasets import nerf_synthetic_scene

        self._write_scene(tmp_path)
        scene = nerf_synthetic_scene(str(tmp_path), n_init=64, capacity=128)
        # no transforms_test.json -> falls back to train[:2]
        assert len(scene.test_views) == 2
        assert int(scene.init_model.num_alive) == 64
        assert scene.init_model.capacity == 128

    def test_cli_train_smoke(self, tmp_path):
        from gaussiansplat_tpu.cli import main

        self._write_scene(tmp_path, size=32)
        out = str(tmp_path / "run")
        rc = main([
            "train", "--scene", str(tmp_path), "--n-init", "64",
            "--capacity", "256", "--iterations", "2", "--sh-degree", "1",
            "--impl", "xla", "--out", out, "--eval-views", "1",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "point_cloud.ply"))


class TestSpecularSH:
    """Zonal-harmonic Phong projection (`data/benchmark._specular_sh_rest`):
    the deg-1..3 coefficients must reconstruct the truncated lobe about the
    reflection axis, and the GT model's shiny objects must carry real
    deg-2/3 band energy (VERDICT r3 item 5)."""

    def test_lobe_reconstruction_along_axis(self):
        from gaussiansplat_tpu.data.benchmark import _specular_sh_rest
        from gaussiansplat_tpu.ops.sh import num_sh_coeffs, sh_basis

        nrm = np.array([[0.0, 1.0, 0.0]], np.float32)
        L = np.array([0.4, 0.75, 0.5]); L /= np.linalg.norm(L)
        axis = -(2 * (nrm @ L)[:, None] * nrm - L)
        axis /= np.linalg.norm(axis)
        rest = _specular_sh_rest(nrm, sh_degree=3)      # (1, 15, 3)
        assert rest.shape == (1, 15, 3)
        k = num_sh_coeffs(3)
        # reconstruct f(d) on a ring from the axis to its antipode
        perp = np.cross(axis[0], [0.0, 0.0, 1.0])
        perp /= np.linalg.norm(perp)
        th = np.linspace(0.0, np.pi, 9)
        ds = np.stack([np.cos(t) * axis[0] + np.sin(t) * perp for t in th])
        B = np.asarray(sh_basis(jnp.asarray(ds, jnp.float32), 3))
        recon = B[:, 1:k] @ rest[0, :, 0]
        # peak at the axis: the DC-stripped deg-3 truncation of a
        # strength-0.45 p=8 lobe retains ~0.25 there
        assert 0.2 < recon[0] < 0.3
        # decays away from the axis; small magnitude at the antipode
        assert recon[0] > abs(recon[4]) + 0.1
        assert abs(recon[-1]) < 0.1
        # bands 2 and 3 carry real energy (not just a deg-1 tint)
        band2 = rest[0, 3:8, 0]
        band3 = rest[0, 8:15, 0]
        assert np.sqrt((band2 ** 2).mean()) > 0.02
        assert np.sqrt((band3 ** 2).mean()) > 0.02

    def test_gt_model_band_energy_localized_to_shiny_objects(self):
        from gaussiansplat_tpu.data.benchmark import (
            _sample_surfaces, make_gt_model)

        m = make_gt_model(6_000, sh_degree=3, seed=0)
        _, _, _, obj_id = _sample_surfaces(
            6_000, np.random.default_rng(0))
        rest = np.asarray(m.sh_rest[: len(obj_id)]).reshape(len(obj_id), 15, 3)
        shiny = (obj_id == 1) | (obj_id == 3)
        hi = rest[shiny][:, 3:, :]     # deg-2/3 bands, sphere+torus
        lo = rest[~shiny][:, 3:, :]    # other objects: 0.04-sigma noise only
        # shiny RMS ~ sqrt(noise^2 + specular^2) = sqrt(.04^2 + .055^2) ~ .068
        assert np.sqrt((hi ** 2).mean()) > 1.5 * np.sqrt((lo ** 2).mean())
        np.testing.assert_allclose(np.sqrt((lo ** 2).mean()), 0.04, atol=0.01)
