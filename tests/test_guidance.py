"""Guidance stack tests: schedule math, prompt layout, ANPG step, convert."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.prompt import (
    PromptEmbeddings,
    direction_index,
    shift_azimuth_deg,
)
from humangaussian_tpu.guidance.unet import DualBranchUNet, TINY_TEST_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, tiny_vae_config
from humangaussian_tpu.guidance.dual_branch import (
    DualBranchGuidance,
    GuidanceConfig,
    min_max_steps,
    sample_timesteps,
)


class TestSchedule:
    def test_zero_snr_endpoints(self):
        s = DiffusionSchedule.create(rescale_betas_zero_snr=True)
        a = np.asarray(s.alphas_cumprod)
        assert abs(a[-1]) < 1e-6  # terminal SNR exactly zero
        s0 = DiffusionSchedule.create(rescale_betas_zero_snr=False)
        np.testing.assert_allclose(a[0], np.asarray(s0.alphas_cumprod)[0], rtol=1e-6)

    def test_non_rescaled_matches_cumprod(self):
        s = DiffusionSchedule.create(rescale_betas_zero_snr=False)
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        np.testing.assert_allclose(
            s.alphas_cumprod, np.cumprod(1 - betas), rtol=1e-5
        )

    def test_add_noise_and_velocity_roundtrip(self):
        s = DiffusionSchedule.create()
        x0 = jnp.ones((2, 4, 4, 4)) * 0.3
        eps = jnp.ones_like(x0) * 0.7
        t = jnp.array([100, 500])
        xt = s.add_noise(x0, eps, t)
        v = s.get_velocity(x0, eps, t)
        # pred_original(v, xt) must recover x0; pred_epsilon recovers eps
        np.testing.assert_allclose(s.pred_original(v, xt, t), x0, atol=1e-5)
        np.testing.assert_allclose(s.pred_epsilon(v, xt, t), eps, atol=1e-5)

    def test_trailing_spacing(self):
        s = DiffusionSchedule.create()
        ts = s.trailing_timesteps(50)
        assert ts[0] == 999 and len(ts) == 50
        assert np.all(np.diff(ts) == -20)

    def test_ddim_step_noiseless_limit(self):
        s = DiffusionSchedule.create(rescale_betas_zero_snr=False)
        x0 = jnp.full((1, 2, 2, 4), 0.5)
        eps = jnp.zeros_like(x0)
        t = jnp.array([500])
        xt = s.add_noise(x0, eps, t)
        v = s.get_velocity(x0, eps, t)
        out = s.ddim_step(v, xt, t, jnp.array([-1]))
        np.testing.assert_allclose(out, x0, atol=1e-5)  # t_prev<0 -> x0

    def test_sds_weight(self):
        s = DiffusionSchedule.create()
        t = jnp.array([10, 900])
        w = np.asarray(s.sds_weight(t))
        assert w[1] > w[0]  # more noise -> bigger weight


class TestPromptDirections:
    def test_shift_azimuth(self):
        np.testing.assert_allclose(shift_azimuth_deg(jnp.array([270.0])), [-90.0])
        # the reference's modulo maps 180 -> -180 (still "back" view)
        np.testing.assert_allclose(shift_azimuth_deg(jnp.array([180.0])), [-180.0])

    def test_direction_rules(self):
        ele = jnp.array([0.0, 0.0, 0.0, 70.0, 0.0])
        azi = jnp.array([90.0, 10.0, 175.0, 0.0, -170.0])
        idx = np.asarray(direction_index(ele, azi))
        # side, front, back, overhead, back (reference base.py:231-299)
        np.testing.assert_array_equal(idx, [0, 1, 2, 3, 2])

    def test_embedding_layout(self):
        l, d = 7, 16
        emb = PromptEmbeddings(
            text_vd=jnp.arange(4 * l * d, dtype=jnp.float32).reshape(4, l, d),
            uncond_vd=-jnp.arange(4 * l * d, dtype=jnp.float32).reshape(4, l, d),
            text=jnp.zeros((l, d)),
            uncond=jnp.zeros((l, d)),
            null=jnp.full((l, d), 9.0),
        )
        ele = jnp.array([0.0, 0.0])
        azi = jnp.array([10.0, 175.0])  # front, back
        out = emb.get_text_embeddings(ele, azi)
        assert out.shape == (6, l, d)
        np.testing.assert_allclose(out[0], emb.text_vd[1])  # cond front
        np.testing.assert_allclose(out[1], emb.text_vd[2])  # cond back
        np.testing.assert_allclose(out[2], emb.uncond_vd[1])  # neg front
        np.testing.assert_allclose(out[4], 9.0)  # null segment

    def test_hf_clip_encode_without_model_max_length(self, tmp_path):
        # regression: a checkpoint whose tokenizer ships no
        # model_max_length leaves the transformers ~1e30 sentinel in
        # place, which used to overflow enable_truncation; the encoder
        # must clamp to the text model's own position-embedding count
        pytest.importorskip("torch")
        import json as _json

        from transformers import CLIPTextConfig, CLIPTextModel, CLIPTokenizer

        from humangaussian_tpu.guidance.prompt import hf_clip_encode_fn

        cfg = CLIPTextConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=77)
        CLIPTextModel(cfg).save_pretrained(str(tmp_path / "text_encoder"))
        tok_dir = tmp_path / "tokenizer"
        tok_dir.mkdir()
        vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
        for c in "abcdefghijklmnopqrstuvwxyz":
            vocab[c] = len(vocab)
            vocab[c + "</w>"] = len(vocab)
        (tok_dir / "vocab.json").write_text(_json.dumps(vocab))
        (tok_dir / "merges.txt").write_text("#version: 0.2\n")
        tok = CLIPTokenizer(str(tok_dir / "vocab.json"),
                            str(tok_dir / "merges.txt"))
        tok.save_pretrained(str(tok_dir))
        assert tok.model_max_length > 1e12  # the sentinel is present

        out = hf_clip_encode_fn(str(tmp_path))(["a test avatar", "ab"])
        assert out.shape == (2, 77, 32)
        assert np.isfinite(out).all()


def make_guidance():
    rng = jax.random.PRNGKey(0)
    unet = DualBranchUNet(TINY_TEST_CONFIG)
    x = jnp.zeros((1, 8, 8, 8))
    uparams = unet.init(rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 7, 32)), jnp.zeros((1, 6)))
    vae = AutoencoderKL(tiny_vae_config())
    vparams = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
    cfg = GuidanceConfig(latent_size=8, image_size=16, guidance_scale=7.5)
    return DualBranchGuidance(
        unet=unet,
        unet_params=uparams,
        vae=vae,
        vae_params=vparams,
        schedule=DiffusionSchedule.create(),
        cfg=cfg,
    )


class TestDualBranchGuidance:
    def test_step_and_gradients(self):
        g = make_guidance()
        rng = jax.random.PRNGKey(1)
        b, h = 2, 16
        # distinct cond/neg/null segments so the ANPG deltas are nonzero
        text = jax.random.normal(jax.random.PRNGKey(9), (3 * b, 7, 32))
        t = jnp.array([300, 700])

        def loss_fn(rgb, depth, pose):
            out = g(pose, rgb, depth, text, t, rng)
            return out["loss_sds"]

        rgb = jnp.full((b, h, h, 3), 0.5)
        depth = jnp.full((b, h, h, 3), 0.3)
        pose = jnp.full((b, h, h, 3), 0.2)
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(rgb, depth, pose)
        assert np.isfinite(float(loss))
        # gradient flows into rgb and depth renders...
        assert float(jnp.abs(grads[0]).max()) > 0
        assert float(jnp.abs(grads[1]).max()) > 0
        # ...but NOT into the pose conditioning image (stop-graded)
        np.testing.assert_allclose(np.asarray(grads[2]), 0.0)

    def test_grad_clip_pixel(self):
        g = make_guidance()
        rng = jax.random.PRNGKey(2)
        b = 1
        text = jnp.ones((3, 7, 32))
        lat = jnp.ones((b, 8, 8, 4)) * 5.0
        grad = g.compute_grad(lat, lat, lat, jnp.array([500]), text, rng)
        norms = np.linalg.norm(np.asarray(grad), axis=-1)
        assert norms.max() <= g.cfg.grad_clip_threshold + 1e-5

    def test_anpg_boundary_mask(self):
        # below t=200 the negative branch is dropped (delta_d = e_null)
        g = make_guidance()
        rng = jax.random.PRNGKey(3)
        text = jnp.ones((3, 7, 32))
        lat = jnp.ones((1, 8, 8, 4)) * 0.2
        g_low = g.compute_grad(lat, lat, lat, jnp.array([100]), text, rng)
        g_high = g.compute_grad(lat, lat, lat, jnp.array([900]), text, rng)
        assert not np.allclose(np.asarray(g_low), np.asarray(g_high))

    def test_timestep_sampling_range(self):
        mn, mx = min_max_steps(1000, 0.02, 0.98)
        assert (mn, mx) == (20, 980)
        t = sample_timesteps(jax.random.PRNGKey(0), 1000, mn, mx)
        assert int(t.min()) >= 20 and int(t.max()) <= 980


class TestConvert:
    def test_conv_linear_groupnorm_equivalence(self):
        torch = pytest.importorskip("torch")
        import flax.linen as fnn

        from humangaussian_tpu.guidance.convert import _conv, _linear

        rng = np.random.RandomState(0)
        x = rng.randn(2, 5, 5, 3).astype(np.float32)
        conv_t = torch.nn.Conv2d(3, 6, 3, padding=1)
        with torch.no_grad():
            ref = conv_t(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        conv_f = fnn.Conv(6, (3, 3), padding=1)
        params = {
            "params": {
                "kernel": jnp.asarray(_conv(conv_t.weight.detach().numpy())),
                "bias": jnp.asarray(conv_t.bias.detach().numpy()),
            }
        }
        ours = np.asarray(conv_f.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)

        lin_t = torch.nn.Linear(4, 7)
        xv = rng.randn(3, 4).astype(np.float32)
        with torch.no_grad():
            ref = lin_t(torch.tensor(xv)).numpy()
        dense = fnn.Dense(7)
        params = {
            "params": {
                "kernel": jnp.asarray(_linear(lin_t.weight.detach().numpy())),
                "bias": jnp.asarray(lin_t.bias.detach().numpy()),
            }
        }
        np.testing.assert_allclose(
            np.asarray(dense.apply(params, jnp.asarray(xv))), ref, atol=1e-5
        )

    def test_unet_key_mapping_covers_tiny_model(self):
        """Synthesize a diffusers-style state_dict for the tiny config and
        check the converter produces exactly the flax param tree."""
        from humangaussian_tpu.guidance.convert import convert_unet_state_dict

        rng = jax.random.PRNGKey(0)
        unet = DualBranchUNet(TINY_TEST_CONFIG)
        x = jnp.zeros((1, 8, 8, 8))
        ref_params = unet.init(
            rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 7, 32)), jnp.zeros((1, 6))
        )
        flat_ref = jax.tree_util.tree_flatten_with_path(ref_params)[0]
        ref_paths = {
            "/".join(str(p)[2:-2] for p in path): leaf.shape
            for path, leaf in flat_ref
        }

        sd = _tiny_torch_state_dict()
        converted, unmatched = convert_unet_state_dict(sd, num_levels=2, copy_last_n=1)
        assert unmatched == [], f"unmatched torch keys: {unmatched}"
        flat_conv = jax.tree_util.tree_flatten_with_path(converted)[0]
        conv_paths = {
            "/".join(str(p)[2:-2] for p in path): leaf.shape
            for path, leaf in flat_conv
        }
        missing = set(ref_paths) - set(conv_paths)
        extra = set(conv_paths) - set(ref_paths)
        assert not missing, f"missing params: {sorted(missing)[:10]}"
        assert not extra, f"extra params: {sorted(extra)[:10]}"
        for k in ref_paths:
            assert conv_paths[k] == ref_paths[k], (
                f"shape mismatch at {k}: {conv_paths[k]} vs {ref_paths[k]}"
            )

    def test_forward_agrees_after_roundtrip(self):
        """Init flax params, export them to a synthetic torch state_dict via
        the inverse transposes, re-convert, and check identical outputs."""
        from humangaussian_tpu.guidance.convert import convert_unet_state_dict

        rng = jax.random.PRNGKey(0)
        unet = DualBranchUNet(TINY_TEST_CONFIG)
        x = jax.random.normal(rng, (1, 8, 8, 8))
        args = (x, x * 0.5, jnp.array([17.0]), jnp.ones((1, 7, 32)), jnp.ones((1, 6)))
        ref_params = unet.init(rng, *args)
        ref_out = unet.apply(ref_params, *args)

        sd = _tiny_torch_state_dict(from_params=ref_params)
        converted, unmatched = convert_unet_state_dict(sd, num_levels=2, copy_last_n=1)
        assert unmatched == []
        out = unet.apply(converted, *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)

    def test_vae_roundtrip(self):
        from humangaussian_tpu.guidance.convert import convert_vae_state_dict

        rng = jax.random.PRNGKey(0)
        vae = AutoencoderKL(tiny_vae_config())
        img = jax.random.normal(rng, (1, 16, 16, 3))
        ref_params = vae.init(rng, img, rng)
        ref_mean, _ = vae.apply(ref_params, img, method=vae.encode)

        sd = _tiny_vae_torch_state_dict(ref_params)
        converted, unmatched = convert_vae_state_dict(sd)
        assert unmatched == [], unmatched
        mean, _ = vae.apply(converted, img, method=vae.encode)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-5)


def _inv_conv(k):
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _inv_linear(k):
    return np.ascontiguousarray(np.transpose(np.asarray(k)))


def _torch_leaves(flax_mod: dict, torch_prefix: str, table: dict, sd: dict):
    for torch_suffix, flax_path in table.items():
        node = flax_mod
        for p in flax_path[:-1]:
            node = node[p]
        leaf = np.asarray(node[flax_path[-1]])
        if flax_path[-1] == "kernel":
            leaf = _inv_conv(leaf) if leaf.ndim == 4 else _inv_linear(leaf)
        sd[f"{torch_prefix}.{torch_suffix}"] = leaf


_RESNET_T = {
    "norm1.weight": ("norm1", "scale"),
    "norm1.bias": ("norm1", "bias"),
    "conv1.weight": ("conv1", "kernel"),
    "conv1.bias": ("conv1", "bias"),
    "time_emb_proj.weight": ("time_emb_proj", "kernel"),
    "time_emb_proj.bias": ("time_emb_proj", "bias"),
    "norm2.weight": ("norm2", "scale"),
    "norm2.bias": ("norm2", "bias"),
    "conv2.weight": ("conv2", "kernel"),
    "conv2.bias": ("conv2", "bias"),
}
_RESNET_SC = dict(_RESNET_T, **{
    "conv_shortcut.weight": ("conv_shortcut", "kernel"),
    "conv_shortcut.bias": ("conv_shortcut", "bias"),
})
_TRANS_T = {
    "norm.weight": ("norm", "scale"),
    "norm.bias": ("norm", "bias"),
    "proj_in.weight": ("proj_in", "kernel"),
    "proj_in.bias": ("proj_in", "bias"),
    "proj_out.weight": ("proj_out", "kernel"),
    "proj_out.bias": ("proj_out", "bias"),
    "transformer_blocks.0.norm1.weight": ("block_0", "norm1", "scale"),
    "transformer_blocks.0.norm1.bias": ("block_0", "norm1", "bias"),
    "transformer_blocks.0.attn1.to_q.weight": ("block_0", "attn1", "to_q", "kernel"),
    "transformer_blocks.0.attn1.to_k.weight": ("block_0", "attn1", "to_k", "kernel"),
    "transformer_blocks.0.attn1.to_v.weight": ("block_0", "attn1", "to_v", "kernel"),
    "transformer_blocks.0.attn1.to_out.0.weight": ("block_0", "attn1", "to_out", "kernel"),
    "transformer_blocks.0.attn1.to_out.0.bias": ("block_0", "attn1", "to_out", "bias"),
    "transformer_blocks.0.norm2.weight": ("block_0", "norm2", "scale"),
    "transformer_blocks.0.norm2.bias": ("block_0", "norm2", "bias"),
    "transformer_blocks.0.attn2.to_q.weight": ("block_0", "attn2", "to_q", "kernel"),
    "transformer_blocks.0.attn2.to_k.weight": ("block_0", "attn2", "to_k", "kernel"),
    "transformer_blocks.0.attn2.to_v.weight": ("block_0", "attn2", "to_v", "kernel"),
    "transformer_blocks.0.attn2.to_out.0.weight": ("block_0", "attn2", "to_out", "kernel"),
    "transformer_blocks.0.attn2.to_out.0.bias": ("block_0", "attn2", "to_out", "bias"),
    "transformer_blocks.0.norm3.weight": ("block_0", "norm3", "scale"),
    "transformer_blocks.0.norm3.bias": ("block_0", "norm3", "bias"),
    "transformer_blocks.0.ff.net.0.proj.weight": ("block_0", "ff", "proj_in", "kernel"),
    "transformer_blocks.0.ff.net.0.proj.bias": ("block_0", "ff", "proj_in", "bias"),
    "transformer_blocks.0.ff.net.2.weight": ("block_0", "ff", "proj_out", "kernel"),
    "transformer_blocks.0.ff.net.2.bias": ("block_0", "ff", "proj_out", "bias"),
}
_EMB_T = {
    "linear_1.weight": ("linear_1", "kernel"),
    "linear_1.bias": ("linear_1", "bias"),
    "linear_2.weight": ("linear_2", "kernel"),
    "linear_2.bias": ("linear_2", "bias"),
}


def _tiny_torch_state_dict(from_params=None):
    """Diffusers-style key/value state dict for TINY_TEST_CONFIG, either
    random or exported from given flax params (for roundtrip tests)."""
    rng = jax.random.PRNGKey(7)
    unet = DualBranchUNet(TINY_TEST_CONFIG)
    if from_params is None:
        x = jnp.zeros((1, 8, 8, 8))
        from_params = unet.init(
            rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 7, 32)), jnp.zeros((1, 6))
        )
    p = from_params["params"]
    sd: dict = {}

    def conv_leaves(flax_mod, torch_prefix):
        sd[f"{torch_prefix}.weight"] = _inv_conv(flax_mod["kernel"])
        sd[f"{torch_prefix}.bias"] = np.asarray(flax_mod["bias"])

    conv_leaves(p["conv_in"], "conv_in")
    conv_leaves(p["conv_in_branch"], "conv_in_branch.0")
    _torch_leaves(p["time_embedding"], "time_embedding", _EMB_T, sd)
    _torch_leaves(p["add_embedding"], "add_embedding", _EMB_T, sd)

    def block(flax_name, torch_name, n_res, has_attn, has_down=False, has_up=False, shortcut_res=()):
        blk = p[flax_name]
        for j in range(n_res):
            table = _RESNET_SC if j in shortcut_res else _RESNET_T
            _torch_leaves(blk[f"resnet_{j}"], f"{torch_name}.resnets.{j}", table, sd)
            if has_attn:
                _torch_leaves(blk[f"attn_{j}"], f"{torch_name}.attentions.{j}", _TRANS_T, sd)
        if has_down:
            conv_leaves(blk["downsample"], f"{torch_name}.downsamplers.0.conv")
        if has_up:
            conv_leaves(blk["upsample"], f"{torch_name}.upsamplers.0.conv")

    # tiny config: 2 levels, 1 layer per block; up blocks have 2 resnets
    block("down_block_0", "down_blocks.0", 1, True, has_down=True)
    block("down_block_1", "down_blocks.1", 1, False, shortcut_res=(0,))
    block("down_block_branch_0", "down_blocks_branch.0.0", 1, True, has_down=True)
    block("mid_block", "mid_block", 2, False)
    _torch_leaves(p["mid_block"]["attn_0"], "mid_block.attentions.0", _TRANS_T, sd)
    block("up_block_0", "up_blocks.0", 2, False, has_up=True, shortcut_res=(0, 1))
    block("up_block_1", "up_blocks.1", 2, True, shortcut_res=(0, 1))
    block("up_block_branch_1", "up_blocks_branch.0.0", 2, True, shortcut_res=(0, 1))

    for head, tprefix in (("head", ""), ("head_branch", "_branch.0")):
        sd[f"conv_norm_out{tprefix}.weight"] = np.asarray(p[head]["conv_norm_out"]["scale"])
        sd[f"conv_norm_out{tprefix}.bias"] = np.asarray(p[head]["conv_norm_out"]["bias"])
        conv_leaves(p[head]["conv_out"], f"conv_out{tprefix}")
    return sd


def _tiny_vae_torch_state_dict(ref_params):
    p = ref_params["params"]
    sd: dict = {}

    def conv_leaves(flax_mod, torch_prefix):
        sd[f"{torch_prefix}.weight"] = _inv_conv(flax_mod["kernel"])
        sd[f"{torch_prefix}.bias"] = np.asarray(flax_mod["bias"])

    vr = {k: v for k, v in _RESNET_T.items() if "time_emb" not in k}
    vr_sc = dict(vr, **{
        "conv_shortcut.weight": ("conv_shortcut", "kernel"),
        "conv_shortcut.bias": ("conv_shortcut", "bias"),
    })
    attn_t = {
        "group_norm.weight": ("group_norm", "scale"),
        "group_norm.bias": ("group_norm", "bias"),
        "to_q.weight": ("to_q", "kernel"),
        "to_q.bias": ("to_q", "bias"),
        "to_k.weight": ("to_k", "kernel"),
        "to_k.bias": ("to_k", "bias"),
        "to_v.weight": ("to_v", "kernel"),
        "to_v.bias": ("to_v", "bias"),
        "to_out.0.weight": ("to_out", "kernel"),
        "to_out.0.bias": ("to_out", "bias"),
    }

    enc, dec = p["encoder"], p["decoder"]
    conv_leaves(enc["conv_in"], "encoder.conv_in")
    # tiny vae: blocks (32, 64), 1 layer each; block 1 resnet has shortcut
    _torch_leaves(enc["down_0_resnet_0"], "encoder.down_blocks.0.resnets.0", vr, sd)
    conv_leaves(enc["down_0_downsample"], "encoder.down_blocks.0.downsamplers.0.conv")
    _torch_leaves(enc["down_1_resnet_0"], "encoder.down_blocks.1.resnets.0", vr_sc, sd)
    _torch_leaves(enc["mid_resnet_0"], "encoder.mid_block.resnets.0", vr, sd)
    _torch_leaves(enc["mid_resnet_1"], "encoder.mid_block.resnets.1", vr, sd)
    _torch_leaves(enc["mid_attn"], "encoder.mid_block.attentions.0", attn_t, sd)
    sd["encoder.conv_norm_out.weight"] = np.asarray(enc["conv_norm_out"]["scale"])
    sd["encoder.conv_norm_out.bias"] = np.asarray(enc["conv_norm_out"]["bias"])
    conv_leaves(enc["conv_out"], "encoder.conv_out")

    conv_leaves(dec["conv_in"], "decoder.conv_in")
    _torch_leaves(dec["mid_resnet_0"], "decoder.mid_block.resnets.0", vr, sd)
    _torch_leaves(dec["mid_resnet_1"], "decoder.mid_block.resnets.1", vr, sd)
    _torch_leaves(dec["mid_attn"], "decoder.mid_block.attentions.0", attn_t, sd)
    # decoder: up_0 (64ch, 2 resnets, upsample), up_1 (32ch, shortcut on 0)
    _torch_leaves(dec["up_0_resnet_0"], "decoder.up_blocks.0.resnets.0", vr, sd)
    _torch_leaves(dec["up_0_resnet_1"], "decoder.up_blocks.0.resnets.1", vr, sd)
    conv_leaves(dec["up_0_upsample"], "decoder.up_blocks.0.upsamplers.0.conv")
    _torch_leaves(dec["up_1_resnet_0"], "decoder.up_blocks.1.resnets.0", vr_sc, sd)
    _torch_leaves(dec["up_1_resnet_1"], "decoder.up_blocks.1.resnets.1", vr, sd)
    sd["decoder.conv_norm_out.weight"] = np.asarray(dec["conv_norm_out"]["scale"])
    sd["decoder.conv_norm_out.bias"] = np.asarray(dec["conv_norm_out"]["bias"])
    conv_leaves(dec["conv_out"], "decoder.conv_out")

    conv_leaves(p["quant_conv"], "quant_conv")
    conv_leaves(p["post_quant_conv"], "post_quant_conv")
    return sd


class TestSDSMode:
    def test_sds_mode_matches_reference_formula(self):
        """mode="sds" must follow compute_grad_sds exactly: 2-way
        [cond|neg] batch (dual_branch_guidance.py:508-509) and the
        text-as-base CFG `e_text + s*(e_text - e_uncond)` (:543-545)."""
        import dataclasses

        g = make_guidance()
        g = dataclasses.replace(
            g, cfg=dataclasses.replace(g.cfg, mode="sds",
                                       grad_clip_pixel=False)
        )
        rng = jax.random.PRNGKey(7)
        text = jax.random.normal(jax.random.PRNGKey(8), (3, 7, 32))
        key_lat = jax.random.PRNGKey(9)
        lat = jax.random.normal(key_lat, (1, 8, 8, 4)) * 0.3
        dlat = lat * 0.5
        wlat = lat * 0.1
        t = jnp.array([400])

        grad = g.compute_grad(lat, dlat, wlat, t, text, rng)

        # independent re-computation of the reference formula
        k_noise, k_dnoise = jax.random.split(rng)
        noise = jax.random.normal(k_noise, lat.shape, jnp.float32)
        dnoise = jax.random.normal(k_dnoise, dlat.shape, jnp.float32)
        lat_noisy = g.schedule.add_noise(lat, noise, t)
        d_noisy = g.schedule.add_noise(dlat, dnoise, t)
        lat_in = jnp.concatenate(
            [jnp.tile(lat_noisy, (2, 1, 1, 1)),
             jnp.tile(wlat, (2, 1, 1, 1))], axis=-1)
        dep_in = jnp.concatenate(
            [jnp.tile(d_noisy, (2, 1, 1, 1)),
             jnp.tile(wlat, (2, 1, 1, 1))], axis=-1)
        pred = g._unet_eps(lat_in, dep_in, jnp.tile(t, (2,)), text[:2])
        e_text, e_uncond = jnp.split(pred, 2, axis=0)
        noise_pred = e_text + g.cfg.guidance_scale * (e_text - e_uncond)
        w = g.schedule.sds_weight(t, g.cfg.weighting_strategy)
        expected = w.reshape(1, 1, 1, 1) * (
            noise_pred - jnp.concatenate([noise, dnoise], axis=-1))
        np.testing.assert_allclose(
            np.asarray(grad), np.asarray(expected), atol=1e-6)


class TestSJCAndEval:
    def test_sjc_grad_finite(self):
        g = make_guidance()
        import dataclasses

        g = dataclasses.replace(g, cfg=dataclasses.replace(g.cfg, mode="sjc"))
        rng = jax.random.PRNGKey(4)
        text = jax.random.normal(jax.random.PRNGKey(5), (3, 7, 32))
        lat = jnp.ones((1, 8, 8, 4)) * 0.2
        grad = g.compute_grad_sjc(lat, lat, lat, jnp.array([500]), text, rng)
        assert grad.shape == (1, 8, 8, 8)
        assert np.isfinite(np.asarray(grad)).all()

    def test_sjc_dispatch_in_call(self):
        import dataclasses

        g = make_guidance()
        g = dataclasses.replace(g, cfg=dataclasses.replace(g.cfg, mode="sjc"))
        rng = jax.random.PRNGKey(6)
        b, h = 1, 16
        text = jax.random.normal(jax.random.PRNGKey(7), (3 * b, 7, 32))
        out = g(
            jnp.full((b, h, h, 3), 0.2),
            jnp.full((b, h, h, 3), 0.5),
            jnp.full((b, h, h, 3), 0.3),
            text,
            jnp.array([400]),
            rng,
        )
        assert np.isfinite(float(out["loss_sds"]))

    def test_guidance_eval_rollout(self):
        g = make_guidance()
        rng = jax.random.PRNGKey(8)
        b = 1
        text2 = jax.random.normal(jax.random.PRNGKey(9), (2 * b, 7, 32))
        lat = jax.random.normal(rng, (b, 8, 8, 4))
        out = g.guidance_eval(
            lat, lat * 0.5, jnp.zeros_like(lat), jnp.array([700]), text2,
            num_steps=4,
        )
        for k in ("imgs_1step", "imgs_final", "depths_1step", "depths_final"):
            img = np.asarray(out[k])
            assert img.shape == (b, 16, 16, 3)
            assert np.isfinite(img).all()
            assert img.min() >= 0.0 and img.max() <= 1.0

    def test_shard_invariant_noise(self):
        from humangaussian_tpu.guidance.dual_branch import per_sample_normal

        key = jax.random.PRNGKey(0)
        full = per_sample_normal(key, jnp.arange(4), (4, 3, 3))
        half = per_sample_normal(key, jnp.arange(2, 4), (2, 3, 3))
        np.testing.assert_allclose(np.asarray(full)[2:], np.asarray(half))


class TestSampling:
    def test_sample_joint(self):
        g = make_guidance()
        rng = jax.random.PRNGKey(11)
        pose = jnp.zeros((1, 16, 16, 3))
        text2 = jax.random.normal(jax.random.PRNGKey(12), (2, 7, 32))
        imgs, depths = g.sample_joint(pose, text2, rng, num_steps=3)
        assert imgs.shape == (1, 16, 16, 3)
        assert depths.shape == (1, 16, 16, 3)
        for x in (imgs, depths):
            arr = np.asarray(x)
            assert np.isfinite(arr).all()
            assert arr.min() >= 0.0 and arr.max() <= 1.0

    def test_perp_neg_embeddings(self):
        from humangaussian_tpu.guidance.prompt import (
            get_text_embeddings_perp_neg,
        )

        emb = PromptEmbeddings(
            text_vd=jnp.arange(4 * 7 * 8, dtype=jnp.float32).reshape(4, 7, 8),
            uncond_vd=jnp.zeros((4, 7, 8)),
            text=jnp.zeros((7, 8)),
            uncond=jnp.zeros((7, 8)),
            null=jnp.zeros((7, 8)),
        )
        ele = jnp.array([0.0, 0.0, 70.0])
        azi = jnp.array([0.0, 135.0, 0.0])  # front, side-back, overhead
        out, weights = get_text_embeddings_perp_neg(emb, ele, azi)
        assert out.shape == (4 * 3, 7, 8)
        assert weights.shape == (3, 2)
        # pure front view: positive embedding == front embedding
        np.testing.assert_allclose(out[0], emb.text_vd[1], atol=1e-5)
        # overhead: zero negative weights
        np.testing.assert_allclose(np.asarray(weights)[2], 0.0)
        # interpolating views have nonzero signed weights
        assert np.abs(np.asarray(weights)[:2]).max() > 0


class TestMultiBranchGuidance:
    """branch_num=2 wired END TO END through DualBranchGuidance (VERDICT
    r2 weak #5): two structure images, per-branch latents/noise/loss,
    gradients flowing to the render AND both structure inputs
    (unet_rgbdepth.py:211-216,1102-1160)."""

    def _guidance(self, mode="anpg"):
        import dataclasses

        from humangaussian_tpu.guidance.dual_branch import (
            DualBranchGuidance, GuidanceConfig)
        from humangaussian_tpu.guidance.schedule import DiffusionSchedule
        from humangaussian_tpu.guidance.unet import (
            DualBranchUNet, TINY_TEST_CONFIG)
        from humangaussian_tpu.guidance.vae import (
            AutoencoderKL, tiny_vae_config)

        rng = jax.random.PRNGKey(0)
        cfg2 = dataclasses.replace(TINY_TEST_CONFIG, branch_num=2)
        unet = DualBranchUNet(cfg2)
        x = jnp.zeros((1, 8, 8, 8))
        uparams = unet.init(
            rng, x, [x, x], jnp.zeros((1,)), jnp.zeros((1, 7, 32)),
            jnp.zeros((1, 6)),
        )
        vae = AutoencoderKL(tiny_vae_config())
        vparams = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
        return DualBranchGuidance(
            unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
            schedule=DiffusionSchedule.create(),
            cfg=GuidanceConfig(latent_size=8, image_size=16,
                               guidance_scale=7.5, mode=mode),
        )

    def test_two_branch_sds_step_grads_all_inputs(self):
        g = self._guidance()
        assert g.branch_num == 2
        b = 2
        rng = jax.random.PRNGKey(3)
        pose = jax.random.uniform(jax.random.fold_in(rng, 0), (b, 16, 16, 3))
        text = jax.random.normal(jax.random.fold_in(rng, 1), (3 * b, 7, 32))
        t = jnp.array([400, 700])

        def loss(rgb, s1, s2):
            out = g(pose, rgb, [s1, s2], text, t, jax.random.PRNGKey(9))
            return out["loss_sds"]

        rgb = jax.random.uniform(jax.random.fold_in(rng, 2), (b, 16, 16, 3))
        s1 = jax.random.uniform(jax.random.fold_in(rng, 3), (b, 16, 16, 3))
        s2 = jax.random.uniform(jax.random.fold_in(rng, 4), (b, 16, 16, 3))
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(rgb, s1, s2)
        assert np.isfinite(float(val))
        for name, gr in zip(("rgb", "branch0", "branch1"), grads):
            a = np.asarray(gr)
            assert np.isfinite(a).all(), name
            assert np.abs(a).max() > 0, f"no gradient reached {name}"

    def test_branch_count_mismatch_raises(self):
        g = self._guidance()
        b = 2
        pose = jnp.zeros((b, 16, 16, 3))
        text = jnp.zeros((3 * b, 7, 32))
        t = jnp.array([100, 100])
        x = jnp.zeros((b, 16, 16, 3))
        with pytest.raises(ValueError, match="structure images"):
            g(pose, x, x, text, t, jax.random.PRNGKey(0))
