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


class TestLaunchFamilies:
    """The non-avatar families the reference reaches through its
    registry + YAML (launch.py:105-106): dreamfusion-system and the
    photo-3dgs-system fed by blender / multiview posed-image data
    (VERDICT r3 #6: configs + launcher wiring for the orphan modules)."""

    def _run_main(self, argv):
        from humangaussian_tpu.apps.launch import main

        return main(argv)

    def test_dreamfusion_tiny(self, tmp_path):
        out = self._run_main([
            "--config", "configs/dreamfusion.yaml", "--train",
            f"exp_root_dir={tmp_path}/out",
            "trainer.max_steps=2",
            "data.batch_size=1", "data.height=16", "data.width=16",
            "data.eval_height=16",
            "system.renderer.num_samples_per_ray=8",
            "system.geometry.n_neurons=8",
            "system.geometry.hash_cfg.n_levels=2",
            "system.geometry.hash_cfg.log2_hashmap_size=8",
        ])
        assert os.path.isdir(out)
        # orbit strip rendered
        import glob

        assert glob.glob(os.path.join(out, "save", "orbit.png"))

    def test_dreamfusion_perp_neg_cli(self, tmp_path):
        """system.guidance.use_perp_neg=true reaches the 4-way Perp-Neg
        CFG from the CLI (reference enables it per config through
        prompt_processors/base.py:85-170 +
        stable_diffusion_guidance.py:185-228)."""
        out = self._run_main([
            "--config", "configs/dreamfusion.yaml", "--train",
            f"exp_root_dir={tmp_path}/out",
            "trainer.max_steps=2",
            "data.batch_size=1", "data.height=16", "data.width=16",
            "data.eval_height=16",
            "system.guidance.use_perp_neg=true",
            "system.renderer.num_samples_per_ray=8",
            "system.geometry.n_neurons=8",
            "system.geometry.hash_cfg.n_levels=2",
            "system.geometry.hash_cfg.log2_hashmap_size=8",
        ])
        assert os.path.isdir(out)

    def _blender_scene(self, tmp):
        from PIL import Image

        rng = np.random.RandomState(0)
        for i in range(3):
            img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(tmp, f"r_{i}.png"))
        c2ws = []
        for i in range(3):
            c2w = np.eye(4)
            c2w[:3, 3] = [0.3 * i, 0.1, 2.5]
            c2ws.append(c2w)
        meta = {
            "camera_angle_x": 0.8,
            "frames": [
                {"file_path": f"./r_{i}", "transform_matrix": c2ws[i].tolist()}
                for i in range(3)
            ],
        }
        with open(os.path.join(tmp, "transforms_train.json"), "w") as f:
            json.dump(meta, f)

    def test_photo_blender_tiny(self, tmp_path):
        scene = os.path.join(str(tmp_path), "scene")
        os.makedirs(scene)
        self._blender_scene(scene)
        out = self._run_main([
            "--config", "configs/photo.yaml", "--train",
            f"exp_root_dir={tmp_path}/out",
            f"data.dataroot={scene}",
            "trainer.max_steps=3",
            "system.capacity=2048", "system.init_points=256",
            "system.sh_degree=1",
        ])
        assert os.path.exists(os.path.join(out, "save", "last.ply"))

    def test_photo_multiview_tiny(self, tmp_path):
        from PIL import Image

        scene = os.path.join(str(tmp_path), "mv")
        os.makedirs(scene)
        rng = np.random.RandomState(1)
        frames = []
        for i in range(4):
            name = f"f_{i}.png"
            Image.fromarray(
                (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            ).save(os.path.join(scene, name))
            c2w = np.eye(4)
            c2w[:3, 3] = [0.2 * i, 0.0, 2.0]
            frames.append({
                "fl_x": 32.0, "fl_y": 32.0, "cx": 16.0, "cy": 16.0,
                "h": 32, "w": 32, "file_path": name,
                "transform_matrix": c2w.tolist(),
            })
        with open(os.path.join(scene, "transforms.json"), "w") as f:
            json.dump({"camera_model": "OPENCV", "frames": frames}, f)
        out = self._run_main([
            "--config", "configs/photo.yaml", "--train",
            f"exp_root_dir={tmp_path}/out",
            "data.type=multiview",
            f"data.dataroot={scene}",
            "data.train_downsample_resolution=1",
            "trainer.max_steps=2",
            "system.capacity=2048", "system.init_points=128",
            "system.sh_degree=0",
        ])
        assert os.path.exists(os.path.join(out, "save", "last.ply"))

    def test_photo_co3d_tiny(self, tmp_path):
        from test_co3d import _make_co3d

        seq = _make_co3d(tmp_path, n_frames=4, h=32, w=32)
        out = self._run_main([
            "--config", "configs/photo.yaml", "--train",
            f"exp_root_dir={tmp_path}/out",
            "data.type=co3d",
            f"data.dataroot={seq}",
            "data.height=32", "data.width=32",
            "trainer.max_steps=2",
            "system.capacity=2048", "system.init_points=128",
            "system.sh_degree=0",
        ])
        assert os.path.exists(os.path.join(out, "save", "last.ply"))


def test_convert_colmap_requires_binary(tmp_path):
    """scripts/convert_colmap.py mirrors the reference's external-COLMAP
    pipeline (gaussiansplatting/convert.py); without the binary it must
    exit with the actionable message, not a traceback."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_colmap", "scripts/convert_colmap.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(SystemExit) as e:
        mod.main(["-s", str(tmp_path),
                  "--colmap_executable", "definitely-not-colmap"])
    assert "COLMAP" in str(e.value)
