"""End-to-end CLI launch smoke test with synthetic local assets.

Exercises the full public path: YAML config + dotlist -> SMPL-X npz load
-> scene init -> prompt embeddings (stub encoder) -> torch-format weight
files -> flax conversion -> 2 jitted SDS steps -> artifacts.
"""
import json
import os

import numpy as np
import pytest
import yaml


def make_smplx_npz(path):
    """Write the toy body in the standard SMPL-X release npz schema."""
    from humangaussian_tpu.smplx.model import toy_model

    m = toy_model()
    v = m.v_template.shape[0]
    shapedirs = np.zeros((v, 3, 400), np.float32)
    kintree = np.zeros((2, 55), np.int64)
    kintree[0] = m.parents
    np.savez(
        path,
        v_template=m.v_template,
        shapedirs=shapedirs,
        posedirs=m.posedirs,
        J_regressor=m.j_regressor,
        kintree_table=kintree,
        weights=m.lbs_weights,
        f=m.faces,
        hands_meanl=np.zeros(45, np.float32),
        hands_meanr=np.zeros(45, np.float32),
    )


def make_torch_weights(tmp):
    """Tiny-config unet_ema + vae weight files in diffusers layout."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_guidance import _tiny_torch_state_dict, _tiny_vae_torch_state_dict

    import jax
    import jax.numpy as jnp

    from humangaussian_tpu.guidance.vae import AutoencoderKL, tiny_vae_config

    unet_dir = os.path.join(tmp, "joint_model", "unet_ema")
    os.makedirs(unet_dir)
    sd = _tiny_torch_state_dict()
    torch.save(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        os.path.join(unet_dir, "diffusion_pytorch_model.bin"),
    )
    vae_dir = os.path.join(tmp, "vae")
    os.makedirs(vae_dir)
    vae = AutoencoderKL(tiny_vae_config())
    rng = jax.random.PRNGKey(0)
    vparams = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
    vsd = _tiny_vae_torch_state_dict(vparams)
    torch.save(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in vsd.items()},
        os.path.join(vae_dir, "diffusion_pytorch_model.bin"),
    )
    return os.path.join(tmp, "joint_model"), vae_dir


class TestLaunchCLI:
    def test_full_cli_train(self, tmp_path, monkeypatch):
        tmp = str(tmp_path)
        smplx_path = os.path.join(tmp, "SMPLX_NEUTRAL.npz")
        make_smplx_npz(smplx_path)
        model_key, vae_key = make_torch_weights(tmp)

        # stub the CLIP encoder (no local SD checkpoint in tests)
        import humangaussian_tpu.guidance.prompt as prompt_mod

        def fake_encode_fn(model_path):
            def encode(prompts):
                rng = np.random.RandomState(len("".join(prompts)))
                return rng.randn(len(prompts), 7, 32).astype(np.float32)

            return encode

        monkeypatch.setattr(prompt_mod, "hf_clip_encode_fn", fake_encode_fn)

        cfg = {
            "name": "smoke",
            "tag": "${rmspace:${system.prompt_processor.prompt},_}",
            "exp_root_dir": os.path.join(tmp, "out"),
            "seed": 0,
            "data": {
                "batch_size": 2, "height": 64, "width": 64,
                "eval_height": 64, "eval_width": 64,
                "n_val_views": 2, "n_test_views": 2,
            },
            "system": {
                "smplx_path": smplx_path,
                "capacity": 1024,
                "pts_num": 300,
                "pose_image_size": 64,
                "tile_capacity": 256,
                "prompt_processor": {
                    "prompt": "???",
                    "use_cache": False,
                    "pretrained_model_name_or_path": "unused",
                },
                "guidance": {
                    "arch": "tiny",
                    "model_key": model_key,
                    "vae_key": vae_key,
                    "guidance_scale": 7.5,
                },
            },
            "trainer": {"max_steps": 2, "val_check_interval": 2},
        }
        cfg_path = os.path.join(tmp, "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)

        from humangaussian_tpu.apps.launch import main

        main([
            "--config", cfg_path, "--train",
            "system.prompt_processor.prompt=A test avatar",
        ])

        out_root = os.path.join(tmp, "out", "smoke")
        trials = os.listdir(out_root)
        assert len(trials) == 1
        assert trials[0].startswith("A_test_avatar@")
        save = os.path.join(out_root, trials[0], "save")
        files = os.listdir(save)
        assert "last.ply" in files
        assert any(f.startswith("orbit.") for f in files)

    def test_unet_arch_overrides(self, tmp_path, monkeypatch):
        """system.guidance.unet.* dotlist keys reach the UNetConfig
        (fusion avg|sum|learn, branch_num, ... — unet_rgbdepth.py:211-216)."""
        tmp = str(tmp_path)
        smplx_path = os.path.join(tmp, "SMPLX_NEUTRAL.npz")
        make_smplx_npz(smplx_path)
        model_key, vae_key = make_torch_weights(tmp)

        import humangaussian_tpu.guidance.prompt as prompt_mod

        def fake_encode_fn(model_path):
            def encode(prompts):
                return np.zeros((len(prompts), 7, 32), np.float32)

            return encode

        monkeypatch.setattr(prompt_mod, "hf_clip_encode_fn", fake_encode_fn)

        cfg = {
            "system": {
                "smplx_path": smplx_path,
                "capacity": 1024,
                "pts_num": 300,
                "prompt_processor": {
                    "prompt": "x", "use_cache": False,
                    "pretrained_model_name_or_path": "unused",
                },
                "guidance": {
                    "arch": "tiny",
                    "model_key": model_key,
                    "vae_key": vae_key,
                    "unet": {"fusion": "sum", "attn_heads": [2, 2]},
                },
            },
            "data": {"batch_size": 2, "height": 64, "width": 64},
        }
        from humangaussian_tpu.apps.launch import build_system

        system = build_system(cfg)
        assert system.guidance.unet.cfg.fusion == "sum"
        assert system.guidance.unet.cfg.attn_heads == (2, 2)  # list->tuple
