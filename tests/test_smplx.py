"""SMPL-X LBS, skeleton mapping, surface sampling, pose-image tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from humangaussian_tpu.smplx.lbs import SMPLXPose, lbs_forward, rodrigues
from humangaussian_tpu.smplx.model import NUM_JOINTS, toy_model
from humangaussian_tpu.smplx.pose_image import (
    draw_humansd_pose,
    draw_openpose_pose,
    humansd_colors,
    project_keypoints,
)
from humangaussian_tpu.smplx.skeleton import (
    APOSE_BODY_POSE,
    HUMANSD17_FROM_SMPLX,
    OPENPOSE18_FROM_SMPLX,
    Skeleton,
    sample_mesh_surface,
)

MODEL = toy_model()


class TestRodrigues:
    def test_zero_is_identity(self):
        r = rodrigues(jnp.zeros((5, 3)))
        np.testing.assert_allclose(r, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-6)

    def test_quarter_turn_z(self):
        r = np.asarray(rodrigues(jnp.array([0.0, 0.0, np.pi / 2])))
        np.testing.assert_allclose(
            r @ np.array([1.0, 0.0, 0.0]), [0.0, 1.0, 0.0], atol=1e-6
        )

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.RandomState(0)
        aa = rng.randn(32, 3).astype(np.float32)
        ours = np.asarray(rodrigues(jnp.asarray(aa)))
        ref = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestLBS:
    def test_rest_pose_is_template(self):
        verts, joints = lbs_forward(MODEL, SMPLXPose.rest())
        np.testing.assert_allclose(verts, MODEL.v_template, atol=1e-5)
        rest_joints = MODEL.j_regressor @ MODEL.v_template
        np.testing.assert_allclose(joints[:NUM_JOINTS], rest_joints, atol=1e-5)

    def test_global_orient_rotates_everything(self):
        pose = SMPLXPose.rest()._replace(
            global_orient=jnp.array([0.0, 0.0, np.pi / 2])
        )
        verts, joints = lbs_forward(MODEL, pose)
        root = MODEL.j_regressor @ MODEL.v_template
        root = root[0]
        rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        expect = (np.asarray(MODEL.v_template) - root) @ rot.T + root
        np.testing.assert_allclose(verts, expect, atol=1e-4)

    def test_elbow_rotation_moves_wrist_rigidly(self):
        # rotate left elbow (body joint 18 => body_pose index 17)
        body = np.zeros((21, 3), np.float32)
        body[17, 2] = np.pi / 2
        verts, joints = lbs_forward(MODEL, SMPLXPose.rest(body_pose=body))
        joints = np.asarray(joints)
        rest = MODEL.j_regressor @ MODEL.v_template
        elbow, wrist = rest[18], rest[20]
        # wrist orbits the elbow by 90 deg about z
        rel = wrist - elbow
        rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(joints[20], elbow + rot @ rel, atol=1e-4)
        # spine unaffected
        np.testing.assert_allclose(joints[0], rest[0], atol=1e-5)

    def test_differentiable(self):
        import jax

        def f(aa):
            pose = SMPLXPose.rest()._replace(global_orient=aa)
            verts, _ = lbs_forward(MODEL, pose)
            return jnp.sum(verts**2)

        g = jax.grad(f)(jnp.array([0.1, 0.2, 0.3]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSkeleton:
    def test_mapper_indices_valid(self):
        n_joints_out = NUM_JOINTS + len(MODEL.landmark_vertex_ids)
        assert OPENPOSE18_FROM_SMPLX.max() < n_joints_out
        assert HUMANSD17_FROM_SMPLX.max() < n_joints_out

    def test_load_normalizes_to_06_box(self):
        sk = Skeleton(style="humansd", apose=True).load_smplx(MODEL)
        extent = sk.vertices.max(0) - sk.vertices.min(0)
        np.testing.assert_allclose(extent.max(), 0.6, atol=1e-5)
        assert sk.points3d.shape == (17, 3)

    def test_scale_matches_reference_factor(self):
        sk = Skeleton(style="humansd").load_smplx(MODEL)
        v0 = sk.vertices.copy()
        sk.scale(-10)  # GaussianDreamer.py:122
        np.testing.assert_allclose(sk.vertices, v0 * 1.1**10, rtol=1e-6)

    def test_apose_differs_from_rest(self):
        a = Skeleton(style="humansd", apose=True).load_smplx(MODEL)
        r = Skeleton(style="humansd", apose=False).load_smplx(MODEL)
        assert np.abs(a.points3d - r.points3d).max() > 1e-3

    def test_hand_centers_shape(self):
        sk = Skeleton(style="humansd").load_smplx(MODEL)
        assert sk.hand_centers.shape == (2, 3)


class TestSurfaceSampling:
    def test_points_on_surface(self):
        pts = sample_mesh_surface(MODEL.v_template, MODEL.faces, 2000, 0)
        assert pts.shape == (2000, 3)
        # every sample inside the mesh bbox
        lo = MODEL.v_template.min(0) - 1e-5
        hi = MODEL.v_template.max(0) + 1e-5
        assert np.all(pts >= lo) and np.all(pts <= hi)
        # radial distance ~ tube radius for tube-height samples
        tube = pts[(pts[:, 1] > -0.04) & (pts[:, 1] < 0.74)]
        rad = np.sqrt(tube[:, 0] ** 2 + tube[:, 2] ** 2)
        assert np.abs(rad - 0.05).max() < 0.02

    def test_deterministic_by_seed(self):
        a = sample_mesh_surface(MODEL.v_template, MODEL.faces, 100, 7)
        b = sample_mesh_surface(MODEL.v_template, MODEL.faces, 100, 7)
        np.testing.assert_array_equal(a, b)


class TestPoseImage:
    def test_palette_matches_seaborn(self):
        seaborn = pytest.importorskip("seaborn")
        ref = np.floor(255 * np.array(seaborn.color_palette("hls", 16))) / 255
        np.testing.assert_allclose(humansd_colors(16), ref, atol=1e-6)

    def _front_mvp(self):
        from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w

        c2w = look_at_c2w(
            jnp.array([0.0, 1.5, 0.0]), jnp.zeros(3), jnp.array([0.0, 0.0, 1.0])
        )
        cam = camera_from_c2w(c2w, 0.9, 512, 512)
        # reference draws with mvp = proj @ view in column-vector form;
        # our camera stores transposed full_proj => mvp = full_proj.T
        return cam.full_proj.T

    def test_humansd_draw_nonempty_and_colored(self):
        sk = Skeleton(style="humansd", apose=True).load_smplx(MODEL).scale(-10)
        img, kp = draw_humansd_pose(
            jnp.asarray(sk.points3d), self._front_mvp(), 512, 512
        )
        img = np.asarray(img)
        assert img.shape == (512, 512, 3)
        assert (img.max(axis=-1) > 0).mean() > 0.005  # bones cover some pixels
        used = np.unique(img.reshape(-1, 3), axis=0)
        assert used.shape[0] > 5  # several distinct bone colors

    def test_occlusion_hides_face_from_back(self):
        sk = Skeleton(style="humansd", apose=True).load_smplx(MODEL).scale(-10)
        pts = jnp.asarray(sk.points3d)
        mvp = self._front_mvp()
        _, kp_front = draw_humansd_pose(pts, mvp, 512, 512, enable_occlusion=True)
        conf = np.asarray(kp_front)[:, 2]
        xs, ys, zs = project_keypoints(pts, mvp, 512, 512)
        zs = np.asarray(zs)
        if zs[0] > zs[3] and zs[0] > zs[4]:  # back view per the rule
            assert conf[0] == 0.0 and conf[1] == 0.0 and conf[2] == 0.0
        else:
            assert conf[0] == 1.0

    def test_capsule_matches_cv2_line(self):
        cv2 = pytest.importorskip("cv2")
        # one bone, reference-style cv2 rendering vs our analytic capsule
        h = w = 128
        a = (20.3, 30.7)
        b = (100.9, 90.2)
        width = 10
        ref = np.zeros((h, w, 3), np.uint8)
        color = (200, 100, 50)
        cv2.line(ref, (int(a[0]), int(a[1])), (int(b[0]), int(b[1])), color, width)
        cv2.circle(ref, (int(a[0]), int(a[1])), width // 2, color, -1)
        cv2.circle(ref, (int(b[0]), int(b[1])), width // 2, color, -1)
        ref_mask = ref[..., 0] > 0

        from humangaussian_tpu.smplx.pose_image import _segment_dist2

        yy, xx = np.mgrid[0:h, 0:w]
        d2 = np.asarray(
            _segment_dist2(
                jnp.asarray(xx, jnp.float32),
                jnp.asarray(yy, jnp.float32),
                np.floor(a[0]), np.floor(a[1]), np.floor(b[0]), np.floor(b[1]),
            )
        )
        ours = d2 <= (width / 2) ** 2
        inter = (ours & ref_mask).sum()
        union = (ours | ref_mask).sum()
        assert inter / union > 0.9  # identical up to edge aliasing

    def test_openpose_draw_runs(self):
        sk = Skeleton(style="openpose", apose=True).load_smplx(MODEL).scale(-10)
        img, kp = draw_openpose_pose(
            jnp.asarray(sk.points3d), self._front_mvp(), 256, 256
        )
        assert np.asarray(img).shape == (256, 256, 3)
        assert float(np.asarray(img).max()) > 0
