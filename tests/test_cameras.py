"""Random-camera curriculum semantics (reference uncond.py:300-523)."""
import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.data.cameras import (
    RandomCameraConfig,
    eval_camera_batch,
    get_projection_matrix,
    sample_camera_batch,
)

CFG = RandomCameraConfig(batch_size=8, height=64, width=64)


class TestSampling:
    def test_shapes_and_ranges(self):
        batch = sample_camera_batch(jax.random.PRNGKey(0), 0, CFG)
        assert batch.c2w.shape == (8, 4, 4)
        assert batch.mvp_mtx.shape == (8, 4, 4)
        ele = np.asarray(batch.elevation)
        assert (ele >= CFG.elevation_range[0] - 1e-4).all()
        assert (ele <= CFG.elevation_range[1] + 1e-4).all()
        az = np.asarray(batch.azimuth)
        assert (az >= -180.0).all() and (az <= 180.0).all()
        fov = np.rad2deg(np.asarray(batch.fovy))
        assert (fov >= 40 - 1e-4).all() and (fov <= 70 + 1e-4).all()

    def test_stratified_azimuth_covers_range(self):
        batch = sample_camera_batch(jax.random.PRNGKey(1), 0, CFG)
        az = np.sort(np.asarray(batch.azimuth))
        # one sample per 45-degree stratum across [-180, 180]
        strata = np.floor((az + 180.0) / 45.0)
        np.testing.assert_array_equal(strata, np.arange(8))

    def test_camera_on_sphere_at_distance(self):
        batch = sample_camera_batch(jax.random.PRNGKey(2), 0, CFG)
        # outside the zoom-in window the center offset is zero
        d = np.linalg.norm(np.asarray(batch.camera_positions), axis=1)
        np.testing.assert_allclose(
            d, np.asarray(batch.camera_distances), atol=1e-5
        )

    def test_head_curriculum_distance_and_offset(self):
        cfg = RandomCameraConfig(
            batch_size=4, height=64, width=64, head_prob=1.0, back_prob=0.0,
            head_start_step=0, head_end_step=100,
        )
        found_head = False
        for seed in range(10):
            batch = sample_camera_batch(jax.random.PRNGKey(seed), 50, cfg)
            if bool(batch.is_head):
                found_head = True
                d = np.asarray(batch.camera_distances)
                assert (d >= 0.4 - 1e-5).all() and (d <= 0.6 + 1e-5).all()
                az = np.asarray(batch.azimuth)
                assert (az >= 0.0 - 1e-4).all() and (az <= 180.0 + 1e-4).all()
                # camera z includes the +0.65 head offset
                z = np.asarray(batch.camera_positions)[:, 2]
                sin_e = np.sin(np.deg2rad(np.asarray(batch.elevation)))
                np.testing.assert_allclose(
                    z, d * sin_e + 0.65, atol=1e-5
                )
        assert found_head

    def test_curriculum_inactive_outside_window(self):
        cfg = RandomCameraConfig(
            batch_size=4, height=64, width=64, head_prob=1.0,
            head_start_step=1200, head_end_step=3600,
        )
        batch = sample_camera_batch(jax.random.PRNGKey(0), 10, cfg)
        assert not bool(batch.is_head)

    def test_deterministic_by_key(self):
        a = sample_camera_batch(jax.random.PRNGKey(5), 7, CFG)
        b = sample_camera_batch(jax.random.PRNGKey(5), 7, CFG)
        np.testing.assert_array_equal(np.asarray(a.c2w), np.asarray(b.c2w))

    def test_c2w_orthonormal_lookat(self):
        batch = sample_camera_batch(jax.random.PRNGKey(3), 0, CFG)
        r = np.asarray(batch.c2w)[:, :3, :3]
        eye = np.einsum("bij,bkj->bik", r, r)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
        )
        # -z axis points from camera toward the (offset) center
        fwd = -r[:, :, 2]
        to_center = -np.asarray(batch.camera_positions)
        to_center /= np.linalg.norm(to_center, axis=1, keepdims=True)
        np.testing.assert_allclose(fwd, to_center, atol=1e-4)


class TestEval:
    def test_val_and_test_sweeps(self):
        cfg = RandomCameraConfig(n_val_views=4, n_test_views=12,
                                 eval_height=32, eval_width=32)
        val = eval_camera_batch(cfg, "val")
        test = eval_camera_batch(cfg, "test")
        assert val.c2w.shape[0] == 4 and test.c2w.shape[0] == 12
        np.testing.assert_allclose(np.asarray(val.elevation), 15.0)
        np.testing.assert_allclose(
            np.asarray(test.camera_distances), cfg.eval_camera_distance
        )
        # val azimuths exclude the wrap-around duplicate
        az = np.asarray(val.azimuth)
        assert az[0] == -180.0 and az[-1] < 180.0

    def test_projection_matrix_convention(self):
        fovy = jnp.array([np.deg2rad(60.0)])
        p = np.asarray(get_projection_matrix(fovy, 1.0))[0]
        assert p[1, 1] < 0  # y flipped (nvdiffrast convention)
        assert p[3, 2] == -1.0
