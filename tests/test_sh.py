import numpy as np
import jax.numpy as jnp
import pytest

from humangaussian_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, SH_C0


def test_deg0_constant():
    sh = jnp.array([[[1.0, 2.0, 3.0]]])  # [1,1,3]
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(out, SH_C0 * np.array([[1.0, 2.0, 3.0]]), rtol=1e-6)


def test_rgb_sh_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, rtol=1e-6)


def test_deg1_direction_dependence():
    rng = np.random.default_rng(0)
    sh = jnp.asarray(rng.normal(size=(5, 4, 3)), jnp.float32)
    d1 = jnp.array([0.0, 0.0, 1.0])
    d2 = jnp.array([0.0, 0.0, -1.0])
    o1 = eval_sh(1, sh, jnp.broadcast_to(d1, (5, 3)))
    o2 = eval_sh(1, sh, jnp.broadcast_to(d2, (5, 3)))
    assert not np.allclose(o1, o2)
    # z-term flips sign; x/y terms vanish at +/-z
    base = SH_C0 * sh[:, 0]
    np.testing.assert_allclose((o1 + o2) / 2, base, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_against_reference_impl(deg):
    """Guarded parity test against the reference's torch implementation."""
    torch = pytest.importorskip("torch")
    import importlib.util, pathlib

    ref = pathlib.Path("/root/reference/gaussiansplatting/utils/sh_utils.py")
    if not ref.exists():
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_sh", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(deg)
    k = (deg + 1) ** 2
    sh = rng.normal(size=(7, k, 3)).astype(np.float32)
    dirs = rng.normal(size=(7, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    ours = eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs))
    # reference layout is [..., C, K]
    theirs = mod.eval_sh(
        deg, torch.from_numpy(sh).transpose(1, 2), torch.from_numpy(dirs)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
