"""SfM layer: COLMAP IO round-trips, triangulation, bundle adjustment
(single-device + observation-sharded over the 8-device mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oetr_tpu.sfm import (COLMAPDatabase, bundle_adjust, image_ids_to_pair_id,
                          pair_id_to_image_ids, qvec2rotmat, read_model,
                          residuals, rotmat2qvec, triangulate_points,
                          write_model)
from oetr_tpu.sfm.colmap_model import Camera, Image, Point3D
from oetr_tpu.geometry.ransac import so3_exp


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (2, 1), (100, 100000)]:
        pid = image_ids_to_pair_id(a, b)
        i, j = pair_id_to_image_ids(pid)
        assert (i, j) == (min(a, b), max(a, b))


def test_colmap_database(tmp_path, rng):
    db = COLMAPDatabase.connect(str(tmp_path / "db.db"))
    db.create_tables()
    cam = db.add_camera(1, 640, 480, np.array([600.0, 600.0, 320.0, 240.0]))
    im1 = db.add_image("a.jpg", cam)
    im2 = db.add_image("b.jpg", cam)
    kpts = rng.uniform(0, 640, (50, 2)).astype(np.float32)
    db.add_keypoints(im1, kpts)
    db.add_keypoints(im2, kpts + 1)
    m = np.stack([np.arange(30), np.arange(30) + 5], axis=1)
    db.add_matches(im1, im2, m)
    db.add_two_view_geometry(im1, im2, m)
    db.commit()

    np.testing.assert_allclose(db.read_keypoints(im1), kpts)
    np.testing.assert_array_equal(db.read_matches(im1, im2), m)
    # Reversed query flips columns.
    np.testing.assert_array_equal(db.read_matches(im2, im1), m[:, ::-1])
    db.close()


def test_qvec_roundtrip(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=1).as_matrix()
    q = rotmat2qvec(R)
    R2 = qvec2rotmat(q)
    np.testing.assert_allclose(R2, R, atol=1e-9)


def test_model_io_roundtrip(tmp_path, rng):
    cameras = {1: Camera(1, "PINHOLE", 640, 480,
                         np.array([600.0, 600.0, 320.0, 240.0]))}
    images = {
        1: Image(1, np.array([1.0, 0, 0, 0]), np.array([0.0, 0, 0]), 1,
                 "a.jpg", rng.uniform(0, 10, (3, 2)), np.array([1, 2, -1])),
        2: Image(2, rotmat2qvec(np.eye(3)), np.array([1.0, 0, 0]), 1,
                 "b.jpg", np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    points = {1: Point3D(1, np.array([0.0, 1, 5]), np.array([255, 0, 0]),
                         0.5, np.array([1]), np.array([0])),
              2: Point3D(2, np.array([1.0, 1, 6]), np.array([0, 255, 0]),
                         0.1, np.array([1, 2]), np.array([1, 0]))}
    for ext in (".bin", ".txt"):
        path = tmp_path / ext[1:]
        write_model(cameras, images, points, str(path), ext)
        cams2, imgs2, pts2 = read_model(str(path), ext)
        assert cams2[1].model == "PINHOLE"
        np.testing.assert_allclose(cams2[1].params, cameras[1].params)
        np.testing.assert_allclose(imgs2[1].qvec, images[1].qvec)
        np.testing.assert_allclose(imgs2[1].xys, images[1].xys, atol=1e-12)
        assert imgs2[2].name == "b.jpg"
        if ext == ".bin":
            np.testing.assert_allclose(pts2[2].xyz, points[2].xyz)
            np.testing.assert_array_equal(pts2[2].image_ids,
                                          points[2].image_ids)


def _ba_problem(rng, n_cams=4, n_pts=60, noise=0.5):
    from scipy.spatial.transform import Rotation
    K = np.tile(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]]),
                (n_cams, 1, 1))
    cams = []
    for i in range(n_cams):
        w = Rotation.from_euler("xyz", rng.uniform(-5, 5, 3),
                                degrees=True).as_rotvec()
        t = np.array([i * 0.5, 0.0, 0.0]) + rng.normal(0, 0.05, 3)
        cams.append(np.concatenate([w, t]))
    cams = np.stack(cams)
    pts = rng.uniform(-2, 2, (n_pts, 3)) + [0, 0, 8.0]

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        R = np.asarray(so3_exp(jnp.asarray(cams[c, :3])))
        for p in range(n_pts):
            x = R @ pts[p] + cams[c, 3:]
            uv = (K[c] @ (x / x[2]))[:2]
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uv.append(uv + rng.normal(0, noise, 2))
    return (cams, pts, K, np.array(obs_cam), np.array(obs_pt),
            np.stack(obs_uv))


def test_triangulation(rng):
    cams, pts, K, oc, op, ouv = _ba_problem(rng, noise=0.0)
    # For point 0: its 4 observations.
    sel = op == 0
    tri = triangulate_points(
        jnp.asarray(cams)[None].repeat(1, 0)[0][None][:, oc[sel]],
        jnp.asarray(K)[None][:, oc[sel]],
        jnp.asarray(ouv[sel])[None],
        jnp.ones((1, sel.sum()), bool))
    np.testing.assert_allclose(np.asarray(tri[0]), pts[0], atol=1e-5)


def test_bundle_adjust_converges(rng):
    cams, pts, K, oc, op, ouv = _ba_problem(rng, noise=0.3)
    # Perturb initial estimates.
    cams_init = cams + rng.normal(0, 0.01, cams.shape)
    cams_init[0] = cams[0]                     # gauge: camera 0 fixed
    pts_init = pts + rng.normal(0, 0.05, pts.shape)

    res = bundle_adjust(jnp.asarray(cams_init), jnp.asarray(pts_init),
                        jnp.asarray(K), jnp.asarray(oc), jnp.asarray(op),
                        jnp.asarray(ouv), jnp.ones(len(oc), bool),
                        iters=8, cg_iters=25)
    assert float(res["cost"]) < 0.2 * float(res["cost0"]), (
        float(res["cost0"]), float(res["cost"]))
    # Residual RMS close to the injected noise level.
    r = residuals(res["cams"], res["pts"], jnp.asarray(K), jnp.asarray(oc),
                  jnp.asarray(op), jnp.asarray(ouv),
                  jnp.ones(len(oc), jnp.float32))
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(r ** 2, -1))))
    assert rms < 1.5, rms


def test_bundle_adjust_sharded_matches_local(rng):
    """Observation-sharded BA over the 8-device mesh == single-device BA."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    cams, pts, K, oc, op, ouv = _ba_problem(rng, n_cams=4, n_pts=32,
                                            noise=0.2)
    cams_init = cams + rng.normal(0, 0.005, cams.shape)
    cams_init[0] = cams[0]
    pts_init = pts + rng.normal(0, 0.02, pts.shape)
    n_obs = len(oc)                  # 4*32 = 128, divisible by 8

    local = bundle_adjust(jnp.asarray(cams_init), jnp.asarray(pts_init),
                          jnp.asarray(K), jnp.asarray(oc), jnp.asarray(op),
                          jnp.asarray(ouv), jnp.ones(n_obs, bool),
                          iters=4, cg_iters=20)

    mesh = Mesh(np.array(jax.devices()[:8]), ("obs",))

    def sharded(oc_s, op_s, ouv_s, valid_s):
        return bundle_adjust(jnp.asarray(cams_init), jnp.asarray(pts_init),
                             jnp.asarray(K), oc_s, op_s, ouv_s, valid_s,
                             iters=4, cg_iters=20, axis_name="obs")

    f = shard_map(sharded, mesh=mesh,
                  in_specs=(P("obs"), P("obs"), P("obs"), P("obs")),
                  out_specs=P())
    dist = f(jnp.asarray(oc), jnp.asarray(op), jnp.asarray(ouv),
             jnp.ones(n_obs, bool))
    np.testing.assert_allclose(float(dist["cost"]), float(local["cost"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dist["cams"]),
                               np.asarray(local["cams"]), atol=1e-5)
